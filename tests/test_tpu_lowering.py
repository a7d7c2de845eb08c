"""AOT TPU lowering of the Pallas kernels — no TPU needed.

`jax.export` with platforms=["tpu"] runs the full Pallas->Mosaic lowering
rules on a CPU host, so kernels that would be rejected at compile time on
the chip (block-divisibility violations, unsupported primitive lowerings
like variable shifts / vector integer division / lane rolls) fail HERE
instead of in the first on-chip bench attempt.  Interpret-mode tests
cannot catch this class: they bypass Mosaic entirely (the SMEM (1, 1)
lens block in int_attention passed every interpret test and failed TPU
lowering).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export


def _i8(rng, *s):
    return jnp.asarray(rng.integers(-127, 127, size=s).astype(np.int8))


def _lower(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


def test_int_attention_lowers():
    from qasr_tpu.kernels.int_attention import fused_int_attention

    rng = np.random.default_rng(0)
    b, t, h, d_k = 2, 200, 4, 64
    args = (_i8(rng, b, t, h, d_k), _i8(rng, b, t, h, d_k),
            _i8(rng, b, t, h, d_k), _i8(rng, b, t, h, d_k),
            _i8(rng, 2 * t - 1, h, d_k), jnp.asarray([200, 150], jnp.int32))

    def att(qu, qv, k, v, p, lens):
        return fused_int_attention(qu, qv, k, v, p, lens, ac=(9, 12),
                                   bd=(7, 13), ctx_rq=(11, 14), left=4,
                                   right=4, nbits=8, interpret=False)

    _lower(att, *args)


def test_gemm_fused_lowers():
    from qasr_tpu.kernels.gemm_fused import (
        fused_lin_join, fused_lin_rq, fused_lin_swish,
    )

    rng = np.random.default_rng(1)
    x8, w8 = _i8(rng, 300, 96), _i8(rng, 96, 160)
    bias = jnp.asarray(rng.integers(-1000, 1000, size=(160,)
                                    ).astype(np.int32))
    m = jnp.asarray(rng.integers(1, 1 << 26, size=(160,)).astype(np.int32))
    s8 = _i8(rng, 300, 160)
    _lower(lambda x, w, b_, m_: fused_lin_rq(
        x, w, b_, m_, 17, lo=-127, hi=126, interpret=False),
        x8, w8, bias, m)
    _lower(lambda x, w, b_, m_, s: fused_lin_join(
        x, w, b_, m_, 22, s, 123457, 14, lo=-127, hi=126, interpret=False),
        x8, w8, bias, m, s8)
    _lower(lambda x, w, b_, m_: fused_lin_swish(
        x, w, b_, m_, 19, 998877, 12, 445566, 24, lo=-127, hi=126,
        interpret=False), x8, w8, bias, m)


def test_pw_join_cm_lowers():
    from qasr_tpu.kernels.cm_fused import fused_pw_join_cm

    rng = np.random.default_rng(2)
    x3, wt = _i8(rng, 64, 128, 256), _i8(rng, 96, 64)
    res3 = jnp.asarray(rng.integers(-100000, 100000, size=(96, 128, 256)
                                    ).astype(np.int32))
    b96 = jnp.asarray(rng.integers(-1000, 1000, size=(96,)).astype(np.int32))
    m96 = jnp.asarray(rng.integers(1, 1 << 20, size=(96,)).astype(np.int32))
    _lower(lambda x, w, b_, r, m_, mr: fused_pw_join_cm(
        x, w, b_, r, m_, 18, mr, 16, 7, interpret=False),
        x3, wt, b96, res3, m96, m96)


def test_pw_and_dw_cm_lowers():
    from qasr_tpu.kernels.cm_fused import fused_pw_cm, fused_dw_win_cm
    from qasr_tpu.kernels.dw_mxu import band_tiles_cm

    rng = np.random.default_rng(3)
    x3, wt = _i8(rng, 64, 128, 256), _i8(rng, 96, 64)
    b96 = jnp.asarray(rng.integers(-1000, 1000, size=(96,)).astype(np.int32))
    m96 = jnp.asarray(rng.integers(1, 1 << 20, size=(96,)).astype(np.int32))
    mask2 = jnp.ones((128, 256), jnp.int32)
    _lower(lambda x, w, b_, m_, mk: fused_pw_cm(
        x, w, b_, mk, m_, 18, 7, True, interpret=False),
        x3, wt, b96, m96, mask2)


def test_conf_module_lowers(monkeypatch):
    """The round-5 module-granularity kernels: the in-kernel i-LayerNorm
    (vector integer division + Newton i_sqrt fori_loop), the depthwise
    sublane rolls, and the two-output FFN kernel all must pass Mosaic
    lowering, at the serving d_model and a d_model=512 scale point."""
    import qasr_tpu.quantize.conformer_freeze as CF
    from qasr_tpu.kernels.conf_module import fused_conv_block, fused_ffn_ln
    from qasr_tpu.models.conformer import ConformerConfig, \
        init_conformer_params
    from qasr_tpu.quantize.conformer_ptq import (
        ConformerQuantConfig, calibrate_conformer,
    )

    for d_model, heads in ((256, 4), (512, 8)):
        cfg = ConformerConfig(feat_in=32, n_layers=1, d_model=d_model,
                              n_heads=heads, subsampling="striding",
                              subsampling_factor=4,
                              subsampling_conv_channels=16,
                              conv_kernel_size=31, dropout=0.0)
        qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                    quantize_attention=True,
                                    integer_softmax=True,
                                    integer_layernorm=True,
                                    integer_activations=True,
                                    static_attention=True)
        params = init_conformer_params(0, cfg)
        rng = np.random.default_rng(3)
        batches = [(rng.normal(size=(2, 40, 32)).astype(np.float32),
                    np.asarray([40, 33], np.int32))]
        qstate = jax.tree_util.tree_map(
            np.asarray, calibrate_conformer(params, cfg, qcfg, batches))
        tables = CF.freeze_conformer(params, cfg, qcfg, qstate)
        tbl = tables["layers"][0]

        b, t = 2, 376
        x8 = _i8(rng, b, t, d_model)
        c8 = _i8(rng, b, t, d_model)
        lens = jnp.asarray([376, 300], jnp.int32)

        _lower(lambda x: fused_ffn_ln(
            x, tbl["ln_ff1"], tbl["ff1_l1"], tbl["ff1_grid"],
            tbl["ff1_prod"], tbl["ff1_l2"], tbl["j1_stream"],
            tail_tbl=tbl["ln_att"], nbits=8, interpret=False)[0], x8)
        _lower(lambda c, x, ln: fused_conv_block(
            c, x, ln, tbl, cfg.dw_padding, nbits=8, interpret=False),
            c8, x8, lens)
