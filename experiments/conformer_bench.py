"""Conformer serving micro-bench: fp32 vs int8-GEMM PTQ vs frozen integer.

Run on the real chip (JAX_PLATFORMS=axon) when the tunnel is healthy:
    python experiments/conformer_bench.py [--layers 16 --d_model 256 \
        --batch 32 --seconds 15]
Reports RTFx for the three paths with the fetch-forced two-point-slope
timing rule (PERF.md round 3d: block_until_ready is not a completion
barrier under the axon tunnel).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=15.0)
    args = ap.parse_args()

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    os.environ.setdefault(
        "QASR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

    labels = tuple(" abcdefghijklmnopqrstuvwxyz'")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=80, blocks=[]),
        decoder=DecoderConfig(feat_in=args.d_model, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 80, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=80, n_layers=args.layers,
                           d_model=args.d_model, n_heads=args.heads,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=args.d_model,
                           conv_kernel_size=31, dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    n = int(16000 * args.seconds)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(args.batch, n)) * 0.1).astype(np.float32)
    alens = np.full((args.batch,), n, np.int32)

    def timed_rtfx(tag):
        a = jnp.asarray(audio)
        al = jnp.asarray(alens)

        def run(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    lp, el = m.forward(a, al)
                np.asarray(el)[0]  # fetch = true completion barrier
                best = min(best, time.perf_counter() - t0)
            return best

        m.forward(a, al)  # compile + warm
        step = (run(6) - run(2)) / 4
        rtfx = args.batch * args.seconds / step
        print(json.dumps({"path": tag, "step_ms": round(step * 1e3, 2),
                          "rtfx": round(rtfx, 1)}))
        return rtfx

    timed_rtfx("fp32")
    m.quantize_encoder([(audio[:4], alens[:4])], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    timed_rtfx("ptq_int8_gemm")
    m.freeze()
    os.environ["QASR_CONF_FUSED"] = "0"
    os.environ["QASR_CONF_ATT"] = "0"
    timed_rtfx("frozen_integer")
    # same numerics, Pallas GEMM+epilogue schedule (kernels/gemm_fused.py)
    os.environ["QASR_CONF_FUSED"] = "1"
    timed_rtfx("frozen_integer_fused")
    # + fused integer attention (kernels/int_attention.py): the (T, T)
    # score world stays in VMEM
    os.environ["QASR_CONF_ATT"] = "1"
    timed_rtfx("frozen_integer_fused_att")
    # fused attention with XLA GEMMs (the r4 on-chip winner at B=32:
    # the GEMM kernels lose their retile toll, attention keeps its win)
    os.environ["QASR_CONF_FUSED"] = "0"
    timed_rtfx("frozen_integer_att")


if __name__ == "__main__":
    main()
