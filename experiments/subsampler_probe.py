"""Subsampler precision probe: is the frozen Conformer's one float region
worth a bf16 lowering on the MXU?

The round-5 step partition showed the float subsampler at 12.8 ms when the
whole step was 176 ms; after the fast-idiv win the step is ~56 ms, so the
subsampler's share quadrupled without its cost changing.  It runs as two
fp32 conv2d at Precision.HIGHEST — on a v5e that lowers to a multi-pass
bf16 decomposition (6 MXU passes per dot), so a straight bf16 lowering is
a ~6x candidate on this term.

This probe measures, on the real chip, at the serving shape (B=32, 15 s):
  1. subsampler step time: fp32 HIGHEST (current) / fp32 DEFAULT /
     bf16 inputs+weights with fp32 accumulation;
  2. the downstream effect: fraction of flipped int8 codes at the S_pre
     quantization boundary for each relaxed variant vs the HIGHEST
     baseline (the only place subsampler noise enters the integer world).

Run: python experiments/subsampler_probe.py [--d_model 256 --batch 32]
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
    ap.add_argument("--d_model", type=int, default=256)
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
    from qasr_tpu.models.conformer import (
        ConformerConfig, init_conformer_params, subsample_convs,
    )

    ccfg = ConformerConfig(feat_in=80, n_layers=1, d_model=args.d_model,
                           n_heads=4, subsampling="striding",
                           subsampling_factor=4,
                           subsampling_conv_channels=args.d_model,
                           conv_kernel_size=31, dropout=0.0)
    params = init_conformer_params(0, ccfg)
    sub = params["pre_encode"]
    rng = np.random.default_rng(0)
    b = args.batch
    frames = 1 + int(16000 * args.seconds) // 160
    feats = jnp.asarray(rng.normal(size=(b, frames, 80)).astype(np.float32))
    lens = jnp.full((b,), frames, jnp.int32)

    def timed(tag, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

        def run(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = None
                for _ in range(k):
                    o = f(*xs)
                np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (run(6) - run(2)) / 4 * 1e3
        print(json.dumps({"leg": tag, "ms": round(ms, 3)}))
        return np.asarray(out[0] if isinstance(out, tuple) else out)

    # pin the baseline leg to the canonical lowering regardless of the
    # backend default (subsample_convs reads QASR_SUB_PREC at trace time)
    os.environ["QASR_SUB_PREC"] = "hi"
    y_hi = timed("fp32_HIGHEST (canonical)",
                 lambda f, l: subsample_convs(sub, ccfg, f, l)[0],
                 feats, lens)
    del os.environ["QASR_SUB_PREC"]

    def sub_prec(prec):
        def fn(f, l):
            y = f[:, :, :, None]
            for blk in sub["convs"]:
                y = jax.lax.conv_general_dilated(
                    y, blk["c1"]["w"], (2, 2), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=prec) + blk["c1"]["b"]
                y = jax.nn.relu(y)
            bb, t, ff, c = y.shape
            return y.transpose(0, 1, 3, 2).reshape(bb, t, c * ff)
        return fn

    y_def = timed("fp32_DEFAULT", sub_prec(jax.lax.Precision.DEFAULT),
                  feats, lens)

    def sub_bf16(f, l):
        # bf16 in AND out + upcast — the shipped form (autodiff-safe; see
        # models/conformer.py::subsample_convs)
        y = f.astype(jnp.bfloat16)[:, :, :, None]
        for blk in sub["convs"]:
            y = jax.lax.conv_general_dilated(
                y, blk["c1"]["w"].astype(jnp.bfloat16), (2, 2),
                [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32) + blk["c1"]["b"]
            y = jax.nn.relu(y).astype(jnp.bfloat16)
        bb, t, ff, c = y.shape
        return y.transpose(0, 1, 3, 2).reshape(bb, t, c * ff
                                               ).astype(jnp.float32)

    y_b16 = timed("bf16_in_w_f32_acc", sub_bf16, feats, lens)

    # downstream flip rate at the S_pre boundary (what the integer encoder
    # actually sees).  Use the max-abs scale the calibrator would pick.
    n8 = 127
    s_pre = float(np.abs(y_hi).max()) / n8
    q = lambda y: np.clip(np.round(y / s_pre), -n8, n8 - 1).astype(np.int8)
    q_hi = q(y_hi)
    for tag, y in (("fp32_DEFAULT", y_def), ("bf16", y_b16)):
        flips = (q(y) != q_hi).mean()
        maxd = int(np.abs(q(y).astype(np.int32) - q_hi).max())
        print(json.dumps({"leg": tag, "int8_flip_frac": round(float(flips), 6),
                          "max_code_delta": maxd}))


if __name__ == "__main__":
    main()
