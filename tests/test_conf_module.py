"""Module-granularity fused Conformer kernels (kernels/conf_module.py):
bit-identity against the XLA composition in quantize/conformer_freeze.py,
at the sublayer level and through the whole frozen encoder.

Reference semantics: ConformerFeedForward / ConformerConvolution /
ConformerLayer (/root/reference/nemo/collections/asr/parts/
conformer_modules.py) in the I-BERT integer arithmetic of the frozen path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import qasr_tpu.quantize.conformer_freeze as CF
from qasr_tpu.kernels.conf_module import (fused_conv_block, fused_ffn_ln,
                                          pad_t, supports)
from qasr_tpu.models.conformer import ConformerConfig, init_conformer_params
from qasr_tpu.ops.integer_layernorm import i_layernorm_core
from qasr_tpu.ops.quant_prims import dyadic_requant_static
from qasr_tpu.quantize.conformer_ptq import (ConformerQuantConfig,
                                             calibrate_conformer)


@pytest.fixture(scope="module")
def frozen_small():
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
    rng = np.random.default_rng(7)
    batches = [(rng.normal(size=(3, 70, 32)).astype(np.float32),
                np.asarray([70, 55, 61], np.int32)) for _ in range(3)]
    qstate = jax.tree_util.tree_map(
        np.asarray, calibrate_conformer(params, cfg, qcfg, batches))
    tables = CF.freeze_conformer(params, cfg, qcfg, qstate)
    return cfg, tables


def _rand8(rng, *shape):
    return jnp.asarray(rng.integers(-127, 127, size=shape).astype(np.int8))


@pytest.mark.parametrize("b,t,tail", [(2, 40, True), (3, 17, True),
                                      (1, 130, False)])
def test_ffn_kernel_bit_identical(frozen_small, b, t, tail):
    cfg, tables = frozen_small
    tbl = tables["layers"][0]
    ab = tables["act_bit"]
    rng = np.random.default_rng(t)
    x8 = _rand8(rng, b, t, cfg.d_model)

    # the XLA composition (conformer_freeze.frozen_conformer_apply FFN1)
    yln = CF._apply_affine_rq(i_layernorm_core(x8), tbl["ln_ff1"], ab)
    m8 = CF._ffn_mid(yln, tbl["ff1_l1"], tbl["ff1_grid"],
                     tbl["ff1_prod"], ab)
    ref = CF._join_lin(m8, tbl["ff1_l2"], x8, tbl["j1_stream"], ab)
    ref_tail = CF._apply_affine_rq(i_layernorm_core(ref), tbl["ln_att"], ab)

    got, got_tail = fused_ffn_ln(
        x8, tbl["ln_ff1"], tbl["ff1_l1"], tbl["ff1_grid"], tbl["ff1_prod"],
        tbl["ff1_l2"], tbl["j1_stream"],
        tail_tbl=tbl["ln_att"] if tail else None, nbits=ab)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    if tail:
        np.testing.assert_array_equal(np.asarray(got_tail),
                                      np.asarray(ref_tail))
    else:
        assert got_tail is None


@pytest.mark.parametrize("b,t,lens", [(2, 40, [40, 23]), (3, 17, [9, 17, 1]),
                                      (1, 129, [100])])
def test_conv_kernel_bit_identical(frozen_small, b, t, lens):
    cfg, tables = frozen_small
    tbl = tables["layers"][1]
    ab = tables["act_bit"]
    n = 2 ** (ab - 1) - 1
    d = cfg.d_model
    rng = np.random.default_rng(b * 1000 + t)
    c8 = _rand8(rng, b, t, d)       # attention context entering att_out
    x8 = _rand8(rng, b, t, d)       # stream at the attention sublayer
    lens = jnp.asarray(lens, jnp.int32)
    pad_mask = ~(jnp.arange(t)[None, :] < lens[:, None])

    # XLA composition: att_out join -> ln_conv -> GLU -> mask -> dw tail ->
    # pw2 join (conformer_freeze.frozen_conformer_apply conv module)
    x1 = CF._join_lin(c8, tbl["att_out"], x8, tbl["j2_stream"], ab)
    yln = CF._apply_affine_rq(i_layernorm_core(x1), tbl["ln_conv"], ab)
    y_int = CF._glu_int(tbl, yln, ab)
    y_int = jnp.where(pad_mask[:, :, None], 0, y_int)
    glu8 = jnp.clip(dyadic_requant_static(
        y_int, jnp.asarray(tbl["glu_prod"][0]), tbl["glu_prod"][1]),
        -n, n - 1).astype(jnp.int8)
    mid8 = CF._conv_tail_mid(tbl, glu8, cfg.dw_padding, d, ab)
    ref = CF._join_lin(mid8, tbl["pw2"], x1, tbl["j3_stream"], ab)

    got = fused_conv_block(c8, x8, lens, tbl, cfg.dw_padding, nbits=ab)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_frozen_conformer_mod_bit_identical(frozen_small, monkeypatch):
    """QASR_CONF_MOD=1 through the whole frozen encoder == the XLA path,
    alone and stacked with the fused attention kernel."""
    cfg, tables = frozen_small
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.normal(size=(3, 70, 32)).astype(np.float32))
    lens = jnp.asarray([70, 49, 70], jnp.int32)

    outs = {}
    for mod, att in (("0", "0"), ("1", "0"), ("1", "1"),
                     ("conv", "0"), ("conv", "1"), ("ffn", "0")):
        monkeypatch.setenv("QASR_CONF_MOD", mod)
        monkeypatch.setenv("QASR_CONF_ATT", att)
        out, ol = jax.jit(lambda f, l: CF.frozen_conformer_apply(
            tables, cfg, f, l))(feats, lens)
        outs[(mod, att)] = (np.asarray(out), np.asarray(ol))
    for key in (("1", "0"), ("1", "1"), ("conv", "0"), ("conv", "1"),
                ("ffn", "0")):
        np.testing.assert_array_equal(outs[("0", "0")][1], outs[key][1])
        np.testing.assert_array_equal(outs[("0", "0")][0], outs[key][0])


def test_supports_guard():
    from qasr_tpu.kernels.conf_module import supports_conv, supports_ffn

    assert supports(376, 256) and supports(376, 512)
    assert not supports(4000, 1024)
    # the FFN kernel additionally holds its two (d, ff*d) weight mats:
    # shapes exist where conv-only fits but the FFN kernel does not (the
    # per-family gate in conformer_freeze._mod_parts relies on this split)
    assert supports_conv(256, 1024) and not supports_ffn(256, 1024)
    assert pad_t(376) == 384 and pad_t(128) == 128
