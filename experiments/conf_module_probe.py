"""Why does module-granularity fusion LOSE on-chip? (round-5 probe)

bench.py conformer legs measured att=177.2 ms, mod=552.6, mod+att=234.2 —
the module kernels (kernels/conf_module.py) are ~3x SLOWER than the XLA
composition they replace, the opposite of the attention kernel's 2.8x win.
This probe isolates the candidate causes on the chip:

  1. apples-to-apples sublayer timings: fused_ffn_ln vs the XLA
     LN+FFN+join+LN chain; fused_conv_block vs the XLA join+LN+conv chain
     (the bench legs change many things at once).
  2. Mosaic integer-division cost: the kernels run i_layernorm_core and
     i_sigmoid_grid IN-KERNEL, whose per-element `//` by a tensor has no
     native VPU lowering — a minimal pallas kernel times tensor-int-div
     against multiply+shift on the same shapes.
  3. serial-grid cost: the kernels run grid=(b,) with each program a long
     GEMM->VPU dependency chain (MXU and VPU mutually idle); a rows-tiled
     FFN variant with grid over row blocks would pipeline.  The div probe
     plus the per-GEMM numbers bound how much of the loss is schedule vs
     int-div.

Usage (healthy tunnel): python experiments/conf_module_probe.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from qasr_tpu.utils.compile_cache import setup_compile_cache
    os.environ.setdefault(
        "QASR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import qasr_tpu.quantize.conformer_freeze as CF
    from qasr_tpu.kernels.conf_module import fused_conv_block, fused_ffn_ln
    from qasr_tpu.models.conformer import ConformerConfig, \
        init_conformer_params
    from qasr_tpu.ops.integer_layernorm import i_layernorm_core
    from qasr_tpu.ops.quant_prims import dyadic_requant_static
    from qasr_tpu.quantize.conformer_ptq import (ConformerQuantConfig,
                                                 calibrate_conformer)

    d, h, L = 256, 4, 16
    b, t = 32, 376
    ccfg = ConformerConfig(feat_in=80, n_layers=1, d_model=d, n_heads=h,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=d, conv_kernel_size=31,
                           dropout=0.0)
    qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                quantize_attention=True, integer_softmax=True,
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
    tbl = tables["layers"][0]
    ab = tables["act_bit"]
    n8 = 2 ** (ab - 1) - 1

    x8 = jnp.asarray(rng.integers(-n8, n8, size=(b, t, d)).astype(np.int8))
    s8 = jnp.asarray(rng.integers(-n8, n8, size=(b, t, d)).astype(np.int8))
    lens = jnp.full((b,), t, jnp.int32)

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
        print(json.dumps({"family": tag, "ms_per_step": round(ms, 3)}),
              flush=True)
        return ms

    # ---- 1) apples-to-apples sublayer chains (x 2L FFN halves, x L conv)
    def ffn_xla(x):
        y = x
        for _ in range(2 * L):
            yln = CF._apply_affine_rq(i_layernorm_core(y), tbl["ln_ff1"], ab)
            m8 = CF._ffn_mid(yln, tbl["ff1_l1"], tbl["ff1_grid"],
                             tbl["ff1_prod"], ab)
            y = CF._join_lin(m8, tbl["ff1_l2"], y, tbl["j1_stream"], ab)
            y = CF._apply_affine_rq(i_layernorm_core(y), tbl["ln_att"], ab)
        return y
    timed("ffn_half+2ln_XLA_x2L", ffn_xla, x8)

    def ffn_mod(x):
        y = x
        for _ in range(2 * L):
            y, _tail = fused_ffn_ln(y, tbl["ln_ff1"], tbl["ff1_l1"],
                                    tbl["ff1_grid"], tbl["ff1_prod"],
                                    tbl["ff1_l2"], tbl["j1_stream"],
                                    tail_tbl=tbl["ln_att"], nbits=ab)
        return y
    timed("ffn_half+2ln_MOD_x2L", ffn_mod, x8)

    def conv_xla(c, s):
        y = c
        for _ in range(L):
            x1 = CF._join_lin(y, tbl["att_out"], s, tbl["j2_stream"], ab)
            yln = CF._apply_affine_rq(i_layernorm_core(x1), tbl["ln_conv"],
                                      ab)
            y_int = CF._glu_int(tbl, yln, ab)
            glu8 = jnp.clip(dyadic_requant_static(
                y_int, jnp.asarray(tbl["glu_prod"][0]), tbl["glu_prod"][1]),
                -n8, n8 - 1).astype(jnp.int8)
            mid8 = CF._conv_tail_mid(tbl, glu8, ccfg.dw_padding, d, ab)
            y = CF._join_lin(mid8, tbl["pw2"], x1, tbl["j3_stream"], ab)
        return y
    timed("convmod+join+ln_XLA_xL", conv_xla, x8, s8)

    def conv_mod(c, s):
        y = c
        for _ in range(L):
            y = fused_conv_block(y, s, lens, tbl, ccfg.dw_padding, nbits=ab)
        return y
    timed("convmod+join+ln_MOD_xL", conv_mod, x8, s8)

    # ---- 2) Mosaic tensor-int-div vs multiply+shift, module shapes
    tp, w = 384, 1024
    x32 = jnp.asarray(rng.integers(1, 1 << 20, size=(b, tp, w)
                                   ).astype(np.int32))
    den = jnp.asarray(rng.integers(1, 1 << 12, size=(b, tp, w)
                                   ).astype(np.int32))

    def _div_kern(x_ref, d_ref, o_ref):
        o_ref[0] = x_ref[0] // d_ref[0]

    def _mul_kern(x_ref, d_ref, o_ref):
        o_ref[0] = (x_ref[0] * d_ref[0]) >> 7

    blk = pl.BlockSpec((1, tp, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    for tag, kern in (("int32_tensor_div", _div_kern),
                      ("int32_mul_shift", _mul_kern)):
        call = pl.pallas_call(
            kern, grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b, tp, w), jnp.int32),
            in_specs=[blk, blk], out_specs=blk)

        def chain(x, dn, _call=call):
            y = x
            for _ in range(L):
                y = _call(y, dn) | jnp.int32(1)  # keep values positive-ish
            return y
        timed(f"pallas_{tag}_xL", chain, x32, den)

    # ---- 3) the same div/mul contrast inside XLA (what the baseline pays)
    def xla_div(x, dn):
        y = x
        for _ in range(L):
            y = (y // dn) | jnp.int32(1)
        return y
    timed("xla_int32_tensor_div_xL", xla_div, x32, den)

    def xla_mul(x, dn):
        y = x
        for _ in range(L):
            y = ((y * dn) >> 7) | jnp.int32(1)
        return y
    timed("xla_int32_mul_shift_xL", xla_mul, x32, den)


if __name__ == "__main__":
    main()
