"""Dense-residual (Jasper-Dr) quantized pipeline: multi-pane res_act tables
in freeze/FrozenExec, plus the hardtanh integer activation path."""
import numpy as np
import jax
import jax.numpy as jnp

from qasr_tpu.models import jasper as J
from qasr_tpu.models.config import (
    BlockConfig, DecoderConfig, EncoderConfig, ModelConfig, QuantConfig,
)
from qasr_tpu.quantize.freeze import FrozenExec, freeze_model

FEAT = 16


def dense_model(activation="relu", seed=0):
    blocks = (
        BlockConfig(filters=24, repeat=1, kernel=(7,), stride=(2,), residual=False),
        BlockConfig(filters=24, repeat=2, kernel=(5,), residual=True,
                    residual_dense=True),
        BlockConfig(filters=24, repeat=2, kernel=(5,), residual=True,
                    residual_dense=True),
        BlockConfig(filters=32, repeat=2, kernel=(5,), residual=True,
                    residual_dense=True),
        BlockConfig(filters=40, repeat=1, kernel=(1,), residual=False),
    )
    cfg = EncoderConfig(feat_in=FEAT, blocks=blocks, activation=activation)
    plan = J.build_encoder_plan(cfg)
    rng = np.random.default_rng(seed)
    enc = J.init_encoder_params(rng, plan)
    for b in enc["blocks"]:
        for p in b["convs"] + b["res"]:
            if "bn" in p:
                c = p["bn"]["mean"].shape[0]
                p["bn"]["mean"] = rng.normal(size=c).astype(np.float32) * 0.2
                p["bn"]["var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)
    dec_cfg = DecoderConfig(feat_in=40, num_classes=28)
    dec = J.init_decoder_params(rng, dec_cfg)
    return plan, enc, dec, dec_cfg


def test_dense_residual_panes_in_plan():
    plan, enc, dec, dec_cfg = dense_model()
    # 3rd dense block sees three panes (its own input + two earlier)
    assert len(plan.blocks[3].res) == 3
    assert plan.blocks[3].dense_residual


def _run_quant_pipeline(activation, rng):
    plan, enc, dec, dec_cfg = dense_model(activation)
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=6, act_bit=6)
    qstate = J.init_qstate(plan)
    x = rng.normal(size=(2, 32, FEAT)).astype(np.float32)
    lens = jnp.asarray([32, 32], np.int32)
    for _ in range(3):
        ex = J.QuantExec(folded, qstate, qcfg, activation=activation,
                         update_ranges=True)
        o, _ = J.encoder_forward(ex, plan, jnp.asarray(x), lens)
        J.decoder_forward_quant(ex, dec, o)
        qstate = ex.new_qstate
    ex2 = J.QuantExec(folded, qstate, qcfg, activation=activation,
                      update_ranges=False)
    out_q, _ = J.encoder_forward(ex2, plan, jnp.asarray(x), lens)
    tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg)
    fx = FrozenExec(tables, qcfg, activation=activation)
    out_f, _ = J.encoder_forward(fx, plan, jnp.asarray(x), lens)
    return out_q, out_f, tables, plan


def test_dense_residual_quant_frozen_agreement(rng):
    out_q, out_f, tables, plan = _run_quant_pipeline("relu", rng)
    # per-pane dyadic tables exist for each dense block
    assert len(tables["blocks"][3]["res_act"]) == 3
    v1 = np.asarray(out_q.values).astype(np.int64)
    v2 = np.asarray(out_f.values).astype(np.int64)
    assert np.abs(v1 - v2).max() <= 2
    assert (v1 != v2).mean() < 0.05


def test_hardtanh_quant_path(rng):
    out_q, out_f, tables, plan = _run_quant_pipeline("hardtanh", rng)
    dq = np.asarray(out_f.dequantize())
    assert np.isfinite(dq).all()
    assert dq.min() >= -1e-6 and dq.max() <= 20.0 + 1e-3  # Hardtanh(0, 20)
