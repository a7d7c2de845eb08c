"""Fused int8 GEMM + epilogue kernels (kernels/gemm_fused.py): bit-identity
against the unfused XLA composition they replace, at the kernel level and
through the whole frozen Conformer (offline + cache-aware streaming).

Reference semantics: the integer linear + fixedpoint requant chain of
/root/reference/nemo/quantization/utils/quant_modules.py:420-480 and
quant_utils.py:149-216 — the fused kernels must be indistinguishable from
the repo's XLA composition of the same ops (which is itself parity-tested
against the reference in test_reference_quant_parity.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qasr_tpu.kernels.gemm_fused import (
    fused_lin_join, fused_lin_rq, fused_lin_swish,
)
from qasr_tpu.ops.quant_prims import dyadic_requant_static


def _rand_tbl(rng, k, d, e):
    w = rng.integers(-127, 127, size=(k, d), dtype=np.int64).astype(np.int8)
    b = rng.integers(-(1 << 15), 1 << 15, size=(d,), dtype=np.int64
                     ).astype(np.int32)
    m = rng.integers(1, (1 << 26), size=(d,), dtype=np.int64
                     ).astype(np.int32)
    return w, b, m, e


@pytest.mark.parametrize("shape,k,d,e", [
    ((3, 50), 96, 200, 17),   # odd K/D -> padding paths
    ((7,), 128, 64, 35),      # e > 31 limb split; D < tile
    ((2, 300), 256, 256, 8),  # multiple row tiles
])
def test_fused_lin_rq_bit_identical(shape, k, d, e):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, size=shape + (k,),
                                  dtype=np.int64).astype(np.int8))
    w, b, m, e = _rand_tbl(rng, k, d, e)
    acc = jax.lax.dot_general(x8, jnp.asarray(w),
                              (((x8.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ref = jnp.clip(dyadic_requant_static(acc + b, jnp.asarray(m), e),
                   -127, 126).astype(jnp.int8)
    got = fused_lin_rq(x8, w, b, m, e, lo=-127, hi=126)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_lin_join_bit_identical():
    rng = np.random.default_rng(1)
    k, d, e = 96, 160, 22
    x8 = jnp.asarray(rng.integers(-127, 127, size=(2, 70, k),
                                  dtype=np.int64).astype(np.int8))
    stream8 = jnp.asarray(rng.integers(-127, 127, size=(2, 70, d),
                                       dtype=np.int64).astype(np.int8))
    w, b, m, e = _rand_tbl(rng, k, d, e)
    m_s, e_s = 123457, 14
    acc = jax.lax.dot_general(x8, jnp.asarray(w),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    yb = dyadic_requant_static(acc + b, jnp.asarray(m), e)
    ys = dyadic_requant_static(stream8.astype(jnp.int32),
                               jnp.asarray(np.int32(m_s)), e_s)
    ref = jnp.clip(yb + ys, -127, 126).astype(jnp.int8)
    got = fused_lin_join(x8, w, b, m, e, stream8, m_s, e_s,
                         lo=-127, hi=126)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_lin_swish_bit_identical():
    from qasr_tpu.ops.integer_sigmoid import i_sigmoid_grid

    rng = np.random.default_rng(2)
    k, d, e = 64, 96, 19
    x8 = jnp.asarray(rng.integers(-127, 127, size=(40, k),
                                  dtype=np.int64).astype(np.int8))
    w, b, m, e = _rand_tbl(rng, k, d, e)
    grid_m, grid_e = 998877, 12
    prod_m, prod_e = 445566, 24
    acc = jax.lax.dot_general(x8, jnp.asarray(w), (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    a8 = jnp.clip(dyadic_requant_static(acc + b, jnp.asarray(m), e),
                  -127, 126)
    g = dyadic_requant_static(a8, jnp.asarray(np.int32(grid_m)), grid_e)
    y = a8 * i_sigmoid_grid(g)
    ref = jnp.clip(dyadic_requant_static(y, jnp.asarray(np.int32(prod_m)),
                                         prod_e), -127, 126
                   ).astype(jnp.int8)
    got = fused_lin_swish(x8, w, b, m, e, grid_m, grid_e, prod_m, prod_e,
                          lo=-127, hi=126)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---------------------------------------------------------------------------
# whole-model: QASR_CONF_FUSED=1 is bit-identical through the frozen
# Conformer, offline and cache-aware streaming
# ---------------------------------------------------------------------------


def _frozen_fixture():
    from qasr_tpu.models.conformer import ConformerConfig, \
        init_conformer_params
    from qasr_tpu.quantize.conformer_ptq import (
        ConformerQuantConfig, calibrate_conformer,
    )
    from qasr_tpu.quantize.conformer_freeze import freeze_conformer

    cfg = ConformerConfig(feat_in=32, n_layers=2, d_model=64, n_heads=4,
                          subsampling="striding", subsampling_factor=4,
                          subsampling_conv_channels=16, conv_kernel_size=9,
                          dropout=0.0)
    qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                quantize_attention=True,
                                integer_softmax=True,
                                integer_layernorm=True,
                                integer_activations=True,
                                static_attention=True)
    params = init_conformer_params(0, cfg)
    rng = np.random.default_rng(1)
    batches = [(rng.normal(size=(4, 50, 32)).astype(np.float32),
                np.asarray([50, 44, 50, 37], np.int32)) for _ in range(3)]
    qstate = jax.tree_util.tree_map(
        np.asarray, calibrate_conformer(params, cfg, qcfg, batches))
    tables = freeze_conformer(params, cfg, qcfg, qstate)
    feats = jnp.asarray(rng.normal(size=(4, 50, 32)).astype(np.float32))
    lens = jnp.asarray([50, 40, 33, 50], jnp.int32)
    return cfg, tables, feats, lens


def test_frozen_conformer_fused_bit_identical(monkeypatch):
    from qasr_tpu.quantize.conformer_freeze import frozen_conformer_apply

    cfg, tables, feats, lens = _frozen_fixture()
    monkeypatch.setenv("QASR_CONF_FUSED", "0")
    base, bl = jax.jit(
        lambda f, l: frozen_conformer_apply(tables, cfg, f, l))(feats, lens)
    monkeypatch.setenv("QASR_CONF_FUSED", "1")
    fused, fl = jax.jit(
        lambda f, l: frozen_conformer_apply(tables, cfg, f, l))(feats, lens)
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(fl))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fused))


def test_cache_aware_stream_fused_bit_exact(monkeypatch):
    """Streaming with the fused kernels == offline without them: the
    flag changes the schedule, never a bit of the integer dataflow."""
    from qasr_tpu.models.conformer import (
        ConformerConfig, init_conformer_params, subsample_convs,
    )
    from qasr_tpu.quantize.conformer_ptq import (
        ConformerQuantConfig, calibrate_conformer,
    )
    from qasr_tpu.quantize.conformer_freeze import (
        freeze_conformer, frozen_conformer_apply, frozen_stream_init,
        frozen_stream_step,
    )

    cfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                          subsampling="striding", subsampling_factor=4,
                          subsampling_conv_channels=16, conv_kernel_size=9,
                          att_context_size=(6, 0), causal_conv=True,
                          dropout=0.0)
    qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                quantize_attention=True,
                                integer_softmax=True,
                                integer_layernorm=True,
                                integer_activations=True,
                                static_attention=True)
    params = init_conformer_params(0, cfg)
    rng = np.random.default_rng(3)
    batches = [(rng.normal(size=(2, 60, 32)).astype(np.float32),
                np.asarray([60, 48], np.int32)) for _ in range(3)]
    qstate = jax.tree_util.tree_map(
        np.asarray, calibrate_conformer(params, cfg, qcfg, batches))
    tables = freeze_conformer(params, cfg, qcfg, qstate)

    feats = jnp.asarray(rng.normal(size=(1, 60, 32)).astype(np.float32))
    lens = jnp.asarray([60], jnp.int32)
    monkeypatch.setenv("QASR_CONF_FUSED", "0")
    ref, el = frozen_conformer_apply(tables, cfg, feats, lens)
    ref = np.asarray(ref)[0, : int(el[0])]
    x_sub, slens = subsample_convs(tables["subsampler"], cfg, feats, lens)
    x_sub = np.asarray(x_sub)[0, : int(slens[0])]

    monkeypatch.setenv("QASR_CONF_FUSED", "1")
    state = frozen_stream_init(tables, cfg, 1)
    outs, i = [], 0
    for nn in (4, 7, 4):
        chunk = x_sub[i: i + nn]
        i += nn
        if not len(chunk):
            break
        o, state = frozen_stream_step(tables, cfg, jnp.asarray(chunk[None]),
                                      state)
        outs.append(np.asarray(o)[0])
    enc_stream = np.concatenate(outs, axis=0)[: ref.shape[0]]
    np.testing.assert_array_equal(enc_stream, ref)
