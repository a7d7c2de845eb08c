"""Config loading: reference YAMLs verbatim (incl. ${...} interpolation),
presets, heads path, W4A8 sweep."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from qasr_tpu.models import jasper as J
from qasr_tpu.models.config import (
    ModelConfig, PRESETS, QuantConfig, matchboxnet3x1x64, quartznet15x5,
    resolve_interpolations,
)

REF_CONF = "/root/reference/examples/asr/conf"


def test_interpolation_resolution():
    raw = {"model": {"repeat": 3, "enc": {"r": "${model.repeat}",
                                          "lst": ["${model.repeat}", 1]}}}
    out = resolve_interpolations(raw)
    assert out["model"]["enc"]["r"] == 3
    assert out["model"]["enc"]["lst"] == [3, 1]


@pytest.mark.parametrize("name", ["quartznet_15x5.yaml", "jasper_10x5dr.yaml",
                                  "matchboxnet_3x1x64_v1.yaml"])
def test_reference_yamls_load(name):
    path = os.path.join(REF_CONF, name)
    if not os.path.exists(path):
        pytest.skip("reference not available")
    cfg = ModelConfig.from_yaml(path)
    plan = J.build_encoder_plan(cfg.encoder)
    assert len(plan.blocks) == len(cfg.encoder.blocks)
    # plan channel threading is consistent
    assert plan.feat_out == cfg.encoder.blocks[-1].filters


def test_presets_build_plans():
    for name, factory in PRESETS.items():
        cfg = factory()
        plan = J.build_encoder_plan(cfg.encoder)
        assert plan.feat_out > 0, name
    # quartznet15x5: 18 blocks, 1024 out (conf/quartznet_15x5.yaml)
    p = J.build_encoder_plan(quartznet15x5().encoder)
    assert len(p.blocks) == 18 and p.feat_out == 1024


def test_heads_float_path(rng):
    """heads: depthwise conv over `heads` channels with batch folding
    (jasper.py:139-147)."""
    spec = J.ConvSpec(in_ch=32, out_ch=32, kernel=5, padding=2, heads=8,
                      groups=32, has_bn=False)
    p = J._init_conv(np.random.default_rng(0), spec)
    assert p["w"].shape == (5, 1, 8)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
    y = J.conv_nwc(x, jnp.asarray(p["w"]), spec)
    assert y.shape == (2, 16, 32)
    # equivalent: weights tile over channel groups of size `heads`
    w_full = np.tile(np.asarray(p["w"]), (1, 1, 4))  # (5, 1, 32)
    spec_full = J.ConvSpec(in_ch=32, out_ch=32, kernel=5, padding=2,
                           groups=32, has_bn=False)
    y2 = J.conv_nwc(x, jnp.asarray(w_full), spec_full)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_w4a8_sweep(rng):
    """W4A8 low-bit config (BASELINE.json config #5) through freeze."""
    from qasr_tpu.quantize.freeze import FrozenExec, freeze_model
    from tests.test_jasper_model import make_model, _calibrate, FEAT

    cfg, plan, enc, dec, dec_cfg = make_model()
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=4, act_bit=8)
    qstate = J.init_qstate(plan)
    lens = np.asarray([32, 32], np.int32)
    qstate = _calibrate(plan, folded, qstate, qcfg,
                        [rng.normal(size=(2, 32, FEAT)).astype(np.float32)],
                        lens)
    ex = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=True)
    x = jnp.asarray(rng.normal(size=(2, 32, FEAT)).astype(np.float32))
    o, _ = J.encoder_forward(ex, plan, x, jnp.asarray(lens))
    J.decoder_forward_quant(ex, dec, o)
    tables = freeze_model(plan, folded, dec, ex.new_qstate, qcfg, dec_cfg)
    # 4-bit weights clamp to [-8, 7]
    for b in tables["blocks"]:
        for e in b["convs"] + b["res"]:
            w = np.asarray(e["w"])
            assert w.min() >= -8 and w.max() <= 7
    fx = FrozenExec(tables, qcfg, activation="relu")
    out, _ = J.encoder_forward(fx, plan, x, jnp.asarray(lens))
    assert np.isfinite(np.asarray(out.dequantize())).all()


@pytest.mark.parametrize("rel", [
    "experimental/citrinet/citrinet_192_2x_stride.yaml",
    "experimental/citrinet/citrinet_192_4x_stride.yaml",
    "experimental/citrinet/config_bpe.yaml",
    "experimental/contextnet_rnnt/config_rnnt.yaml",
    "experimental/configs/quartznet_15x5_aug.yaml",
])
def test_reference_experimental_yamls_load(rel):
    """The reference's experimental Citrinet / ContextNet-RNNT / augmented
    QuartzNet configs parse and build consistent encoder plans."""
    path = os.path.join(os.path.dirname(REF_CONF), rel)
    if not os.path.exists(path):
        pytest.skip("reference not available")
    cfg = ModelConfig.from_yaml(path)
    plan = J.build_encoder_plan(cfg.encoder)
    assert len(plan.blocks) == len(cfg.encoder.blocks) and plan.feat_out > 0
