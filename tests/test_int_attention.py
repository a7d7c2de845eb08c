"""Fused integer relative-position attention (kernels/int_attention.py):
bit-identity against the XLA composition it replaces
(quantize/conformer_freeze.py attention core), at the kernel level and
through the whole frozen Conformer.

Reference semantics: RelPositionMultiHeadAttention
(/root/reference/nemo/collections/asr/parts/multi_head_attention.py:136-247)
in the I-BERT integer arithmetic of the frozen path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qasr_tpu.kernels.int_attention import fused_int_attention, supports
from qasr_tpu.models.conformer import attention_mask
from qasr_tpu.ops.integer_softmax import i_softmax_grid
from qasr_tpu.ops.quant_prims import dyadic_requant_static


def _xla_reference(qu8, qv8, k8, v8, p8, lens, ac_t, bd_t, ctx_t,
                   att_context, nbits):
    """The exact conformer_freeze.py XLA composition."""
    b, t, h, d_k = qu8.shape
    n = 2 ** (nbits - 1) - 1
    valid = jnp.arange(t)[None, :] < lens[:, None]
    mask = attention_mask(valid, att_context)
    ac = jnp.einsum("bihd,bjhd->bhij", qu8, k8,
                    preferred_element_type=jnp.int32)
    bd_full = jnp.einsum("bihd,phd->bhip", qv8, p8,
                         preferred_element_type=jnp.int32)
    idx = (t - 1) + np.arange(t)[:, None] - np.arange(t)[None, :]
    bd = jnp.take_along_axis(bd_full, jnp.asarray(idx)[None, None], axis=-1)
    qg = (dyadic_requant_static(ac, jnp.asarray(np.int32(ac_t[0])), ac_t[1])
          + dyadic_requant_static(bd, jnp.asarray(np.int32(bd_t[0])),
                                  bd_t[1]))
    a8 = i_softmax_grid(qg, mask=mask[:, None], out_bits=nbits
                        ).astype(jnp.int8)
    ctx = jnp.einsum("bhij,bjhd->bihd", a8, v8,
                     preferred_element_type=jnp.int32).reshape(b, t,
                                                               h * d_k)
    return jnp.clip(dyadic_requant_static(
        ctx, jnp.asarray(np.int32(ctx_t[0])), ctx_t[1]),
        -n, n - 1).astype(jnp.int8)


@pytest.mark.parametrize("b,t,h,d_k,ctx,lens", [
    (2, 50, 4, 16, -1, [50, 31]),          # single tile, full context
    (1, 200, 2, 64, -1, [173]),            # two query tiles
    (2, 140, 4, 16, 4, [140, 99]),         # symmetric local window
    (1, 130, 2, 32, (6, 0), [130]),        # causal (left-only)
    (2, 64, 2, 16, (3, 2), [64, 1]),       # asymmetric; near-empty row
])
def test_kernel_bit_identical(b, t, h, d_k, ctx, lens):
    rng = np.random.default_rng(hash((b, t, h, d_k)) % (2 ** 31))
    def i8(*s):
        return jnp.asarray(rng.integers(-127, 127, size=s).astype(np.int8))
    qu8, qv8 = i8(b, t, h, d_k), i8(b, t, h, d_k)
    k8, v8 = i8(b, t, h, d_k), i8(b, t, h, d_k)
    p8 = i8(2 * t - 1, h, d_k)
    lens = jnp.asarray(lens, jnp.int32)
    # grid-requant tables sized so scores land inside the i-softmax window
    ac_t, bd_t, ctx_t = (9, 12), (7, 13), (11, 14)
    ref = _xla_reference(qu8, qv8, k8, v8, p8, lens, ac_t, bd_t, ctx_t,
                         ctx, 8)
    if isinstance(ctx, tuple):
        left, right = ctx
    else:
        left = right = int(ctx)
    got = fused_int_attention(qu8, qv8, k8, v8, p8, lens,
                              ac=ac_t, bd=bd_t, ctx_rq=ctx_t,
                              left=left, right=right, nbits=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_supports_guard():
    assert supports(128) and supports(2048)
    assert not supports(2049)
    with pytest.raises(ValueError):
        fused_int_attention(
            jnp.zeros((1, 4000, 1, 16), jnp.int8),
            jnp.zeros((1, 4000, 1, 16), jnp.int8),
            jnp.zeros((1, 4000, 1, 16), jnp.int8),
            jnp.zeros((1, 4000, 1, 16), jnp.int8),
            jnp.zeros((7999, 1, 16), jnp.int8),
            jnp.asarray([4000], jnp.int32),
            ac=(1, 1), bd=(1, 1), ctx_rq=(1, 1), left=-1, right=-1,
            nbits=8)


def test_frozen_conformer_att_fused_bit_identical(monkeypatch):
    """QASR_CONF_ATT=1 through the whole frozen encoder == the XLA path,
    with and without the GEMM-epilogue fusion stacked on top."""
    from qasr_tpu.models.conformer import ConformerConfig, \
        init_conformer_params
    from qasr_tpu.quantize.conformer_ptq import (
        ConformerQuantConfig, calibrate_conformer,
    )
    from qasr_tpu.quantize.conformer_freeze import (
        freeze_conformer, frozen_conformer_apply,
    )

    cfg = ConformerConfig(feat_in=32, n_layers=2, d_model=64, n_heads=4,
                          subsampling="striding", subsampling_factor=4,
                          subsampling_conv_channels=16, conv_kernel_size=9,
                          att_context_size=8, dropout=0.0)
    qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                quantize_attention=True,
                                integer_softmax=True,
                                integer_layernorm=True,
                                integer_activations=True,
                                static_attention=True)
    params = init_conformer_params(0, cfg)
    rng = np.random.default_rng(7)
    batches = [(rng.normal(size=(3, 70, 32)).astype(np.float32),
                np.asarray([70, 55, 61], np.int32)) for _ in range(3)]
    qstate = jax.tree_util.tree_map(
        np.asarray, calibrate_conformer(params, cfg, qcfg, batches))
    tables = freeze_conformer(params, cfg, qcfg, qstate)
    feats = jnp.asarray(rng.normal(size=(3, 70, 32)).astype(np.float32))
    lens = jnp.asarray([70, 49, 70], jnp.int32)

    outs = {}
    for att, gemm in (("0", "0"), ("1", "0"), ("1", "1")):
        monkeypatch.setenv("QASR_CONF_ATT", att)
        monkeypatch.setenv("QASR_CONF_FUSED", gemm)
        out, ol = jax.jit(lambda f, l: frozen_conformer_apply(
            tables, cfg, f, l))(feats, lens)
        outs[(att, gemm)] = (np.asarray(out), np.asarray(ol))
    for key in (("1", "0"), ("1", "1")):
        np.testing.assert_array_equal(outs[("0", "0")][1], outs[key][1])
        np.testing.assert_array_equal(outs[("0", "0")][0], outs[key][0])
