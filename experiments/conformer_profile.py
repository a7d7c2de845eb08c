"""Frozen-Conformer module-level device profile: where does the step go?

Times each sublayer family of the frozen integer encoder in isolation —
GEMM+epilogue sites, the attention core (scores + integer softmax +
context), the conv module, and the i-LayerNorm glue — so the next fusion
lever is chosen from data, not guesses (the QuartzNet campaign worked this
way: PERF.md round 2c's per-fusion profile named the dw kernels).

Run on the real chip when the tunnel is healthy:
    python experiments/conformer_profile.py [--layers 16 --d_model 256 \
        --batch 32 --seconds 15] [--fused]

Each family runs as its own jitted loop over the same shapes the full
16x256 step uses, with the fetch-forced two-point-slope timing rule
(block_until_ready is not a completion barrier under the axon tunnel).
The families deliberately over-count shared inputs (each is fed fresh
int8 tensors), so the numbers are per-family costs, not a partition of
the full step — compare them against the full step from
experiments/conformer_bench.py.
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
    ap.add_argument("--fused", action="store_true",
                    help="profile with QASR_CONF_FUSED=1")
    args = ap.parse_args()
    os.environ["QASR_CONF_FUSED"] = "1" if args.fused else "0"
    # the family loops below call the freeze helpers directly, so the env
    # flags only matter for the dedicated kernel families added for round 5

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    os.environ.setdefault(
        "QASR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from qasr_tpu.models.conformer import ConformerConfig, \
        init_conformer_params
    from qasr_tpu.quantize.conformer_ptq import (
        ConformerQuantConfig, calibrate_conformer,
    )
    import qasr_tpu.quantize.conformer_freeze as CF
    from qasr_tpu.ops.integer_layernorm import i_layernorm_core
    from qasr_tpu.ops.integer_softmax import i_softmax_grid
    from qasr_tpu.ops.quant_prims import dyadic_requant_static

    ccfg = ConformerConfig(feat_in=80, n_layers=args.layers,
                           d_model=args.d_model, n_heads=args.heads,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=args.d_model,
                           conv_kernel_size=31, dropout=0.0)
    qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                quantize_attention=True,
                                integer_softmax=True,
                                integer_layernorm=True,
                                integer_activations=True,
                                static_attention=True)
    params = init_conformer_params(0, ccfg)
    rng = np.random.default_rng(0)
    calib = [(rng.normal(size=(2, 200, 80)).astype(np.float32),
              np.asarray([200, 160], np.int32))]
    qstate = jax.tree_util.tree_map(
        np.asarray, calibrate_conformer(params, ccfg, qcfg, calib))
    tables = CF.freeze_conformer(params, ccfg, qcfg, qstate)

    b = args.batch
    t = (1 + int(16000 * args.seconds) // 160) // 4  # post-subsampling
    d, h = args.d_model, args.heads
    d_k = d // h
    ab = tables["act_bit"]
    n8 = 2 ** (ab - 1) - 1
    L = args.layers
    tbl = tables["layers"][0]

    x8 = jnp.asarray(rng.integers(-n8, n8, size=(b, t, d)).astype(np.int8))
    stream8 = jnp.asarray(rng.integers(-n8, n8, size=(b, t, d)
                                       ).astype(np.int8))
    x32 = x8.astype(jnp.int32) << 10
    valid = jnp.ones((b, t), bool)
    from qasr_tpu.models.conformer import attention_mask
    att_mask = attention_mask(valid, ccfg.att_context_size)

    pos_np = CF.rel_positional_encoding(t, d, None)
    pos8 = jnp.asarray(np.clip(np.round(pos_np / (1.0 / n8)), -n8, n8 - 1
                               ).astype(np.int8))

    def timed(tag, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm, fetch
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
        print(json.dumps({"family": tag, "ms_per_step": round(ms, 3),
                          "layers": L}))

    # 1) the 4 attention projections + att_out join, x L
    def proj(x8, s8):
        y = x8
        for _ in range(L):
            for key in ("att_q_u", "att_q_v", "att_k", "att_v"):
                y = CF._lin_rq(y, tbl[key], ab)
            y = CF._join_lin(y, tbl["att_out"], s8, tbl["j2_stream"], ab)
        return y
    timed("attn_projections+join", proj, x8, stream8)

    # 2) attention core: scores (ac+bd) -> grid requants -> i-softmax -> ctx
    def att_core(qu, k8v, v8):
        quh = qu.reshape(b, t, h, d_k)
        kh = k8v.reshape(b, t, h, d_k)
        vh = v8.reshape(b, t, h, d_k)
        y = None
        for _ in range(L):
            ac = jnp.einsum("bihd,bjhd->bhij", quh, kh,
                            preferred_element_type=jnp.int32)
            bd_full = jnp.einsum("bihd,phd->bhip", quh,
                                 pos8.reshape(2 * t - 1, h, d_k),
                                 preferred_element_type=jnp.int32)
            idx = (t - 1) + np.arange(t)[:, None] - np.arange(t)[None, :]
            bd = jnp.take_along_axis(
                bd_full, jnp.asarray(idx)[None, None], axis=-1)
            qg = (dyadic_requant_static(ac, jnp.asarray(tbl["ac_grid"][0]),
                                        tbl["ac_grid"][1])
                  + dyadic_requant_static(bd, jnp.asarray(tbl["bd_grid"][0]),
                                          tbl["bd_grid"][1]))
            a8 = i_softmax_grid(qg, mask=att_mask[:, None],
                                out_bits=ab).astype(jnp.int8)
            ctx = jnp.einsum("bhij,bjhd->bihd", a8, vh,
                             preferred_element_type=jnp.int32)
            y = jnp.clip(dyadic_requant_static(
                ctx.reshape(b, t, d), jnp.asarray(tbl["ctx_rq"][0]),
                tbl["ctx_rq"][1]), -n8, n8 - 1).astype(jnp.int8)
            quh = y.reshape(b, t, h, d_k)
        return y
    timed("attn_core(scores+softmax+ctx)", att_core, x8, x8, x8)

    # 3) FFN: l1+swish+l2 join, x 2L (two half-steps per layer)
    def ffn(x8, s8):
        y = x8
        for _ in range(2 * L):
            m8 = CF._ffn_mid(y, tbl["ff1_l1"], tbl["ff1_grid"],
                             tbl["ff1_prod"], ab)
            y = CF._join_lin(m8, tbl["ff1_l2"], s8, tbl["j1_stream"], ab)
        return y
    timed("ffn(l1+swish+l2_join)x2", ffn, x8, stream8)

    # 4) conv module: GLU -> dw+BN+swish -> pw2 join
    def convm(x8, s8):
        y = x8
        pad_mask = jnp.zeros((b, t), bool)
        for _ in range(L):
            y_int = CF._glu_int(tbl, y, ab)
            y_int = jnp.where(pad_mask[:, :, None], 0, y_int)
            glu8 = jnp.clip(dyadic_requant_static(
                y_int, jnp.asarray(tbl["glu_prod"][0]), tbl["glu_prod"][1]),
                -n8, n8 - 1).astype(jnp.int8)
            mid8 = CF._conv_tail_mid(tbl, glu8, ccfg.dw_padding, d, ab)
            y = CF._join_lin(mid8, tbl["pw2"], s8, tbl["j3_stream"], ab)
        return y
    timed("conv_module", convm, x8, stream8)

    # 2b) attention core via the fused Pallas kernel (round-4 default under
    # TPU) — the number the 176 ms step actually contains
    from qasr_tpu.kernels.int_attention import fused_int_attention, supports
    if supports(t):
        lens_dev = jnp.full((b,), t, jnp.int32)
        left, right = CF._ctx_pair(ccfg.att_context_size)

        def att_kernel(qu, qv, k8v, v8):
            quh = qu.reshape(b, t, h, d_k)
            qvh = qv.reshape(b, t, h, d_k)
            kh = k8v.reshape(b, t, h, d_k)
            vh = v8.reshape(b, t, h, d_k)
            y = None
            for _ in range(L):
                y = fused_int_attention(
                    quh, qvh, kh, vh, pos8.reshape(2 * t - 1, h, d_k),
                    lens_dev,
                    ac=(int(tbl["ac_grid"][0]), tbl["ac_grid"][1]),
                    bd=(int(tbl["bd_grid"][0]), tbl["bd_grid"][1]),
                    ctx_rq=(int(tbl["ctx_rq"][0]), tbl["ctx_rq"][1]),
                    left=left, right=right, nbits=ab)
                quh = y.reshape(b, t, h, d_k)
            return y
        timed("attn_core_fused_kernel", att_kernel, x8, x8, x8, x8)

    # 5) i-LayerNorm glue: 5 per layer in the full model (4 pre + ln_out)
    def ln(x32v):
        y = x32v
        for _ in range(5 * L):
            y = CF._apply_affine_rq(i_layernorm_core(y), tbl["ln_ff1"],
                                    ab).astype(jnp.int32) << 10
        return y
    timed("i_layernorm_x5", ln, x32)

    # 6) float subsampler (the one float region; never profiled before
    # round 5): 2x conv2d stride-2 stack from (B, frames, 80) mel input
    from qasr_tpu.models.conformer import subsample_convs
    frames = 1 + int(16000 * args.seconds) // 160
    feats = jnp.asarray(rng.normal(size=(b, frames, 80)).astype(np.float32))
    flens = jnp.full((b,), frames, jnp.int32)
    sub_tbl = tables["subsampler"]

    def subsampler(f, fl):
        y, lens2 = subsample_convs(sub_tbl, ccfg, f, fl)
        return y
    timed("subsampler_float(x1)", subsampler, feats, flens)

    # 7) pre projection + float->int boundary (x1)
    def pre(f):
        x8v = jnp.clip(jnp.round(f / tables["S_pre"]), -n8, n8 - 1
                       ).astype(jnp.int8)
        return CF._lin_rq(x8v, tables["pre"], ab)
    y_sub = subsample_convs(sub_tbl, ccfg, feats, flens)[0]
    timed("pre_projection(x1)", pre, y_sub)


if __name__ == "__main__":
    main()
