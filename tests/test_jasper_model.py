"""Model-level parity tests on tiny configs (the reference's test style:
test_asr_ctcencdec_model.py builds 1-block models from inline configs).

Float path is checked against an independent torch implementation of the
documented semantics (masked conv -> BN -> relu -> residual add); the quant
pipeline is checked for internal consistency (frozen integer path vs the
in-graph QuantExec path) and for closeness to fp32 at 8 bits.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.config import (
    BlockConfig, DecoderConfig, EncoderConfig, ModelConfig, QuantConfig,
)
from qasr_tpu.models import jasper as J
from qasr_tpu.quantize.freeze import FrozenExec, freeze_model

FEAT = 16


def tiny_encoder_cfg(separable=True, dense=False):
    blocks = (
        BlockConfig(filters=24, repeat=1, kernel=(7,), stride=(2,), residual=False,
                    separable=separable),
        BlockConfig(filters=24, repeat=2, kernel=(5,), residual=True,
                    separable=separable, residual_dense=dense),
        BlockConfig(filters=32, repeat=2, kernel=(5,), residual=True,
                    separable=separable, residual_dense=dense),
        BlockConfig(filters=40, repeat=1, kernel=(1,), residual=False,
                    separable=False),
    )
    return EncoderConfig(feat_in=FEAT, blocks=blocks, activation="relu")


def make_model(separable=True, dense=False, seed=0):
    cfg = tiny_encoder_cfg(separable, dense)
    plan = J.build_encoder_plan(cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    enc = J.init_encoder_params(k1, plan)
    dec_cfg = DecoderConfig(feat_in=40, num_classes=28)
    dec = J.init_decoder_params(k2, dec_cfg)
    # randomize BN stats so folding is non-trivial
    rng = np.random.default_rng(seed)
    def ruffle(p):
        if "bn" in p:
            c = p["bn"]["mean"].shape[0]
            p["bn"]["mean"] = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.2)
            p["bn"]["var"] = jnp.asarray((rng.uniform(0.5, 2.0, size=c)).astype(np.float32))
            p["bn"]["gamma"] = jnp.asarray(rng.uniform(0.5, 1.5, size=c).astype(np.float32))
            p["bn"]["beta"] = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    for b in enc["blocks"]:
        for p in b["convs"] + b["res"]:
            ruffle(p)
    return cfg, plan, enc, dec, dec_cfg


def torch_block_forward(plan, enc_params, x_np, lens_np):
    """Independent torch implementation of the documented float semantics."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x_np.transpose(0, 2, 1).copy())  # (B, C, T)
    lens = torch.from_numpy(lens_np.copy()).long()

    def mask(t, l):
        m = torch.arange(t.shape[-1])[None, :] >= l[:, None]
        return t.masked_fill(m[:, None, :], 0.0)

    def conv(t, p, spec):
        w = torch.from_numpy(np.asarray(p["w"]).transpose(2, 1, 0).copy())
        b = torch.from_numpy(np.asarray(p["b"]).copy()) if "b" in p else None
        return F.conv1d(t, w, b, stride=spec.stride, padding=spec.padding,
                        dilation=spec.dilation, groups=spec.groups)

    def bn(t, p):
        g = torch.from_numpy(np.asarray(p["bn"]["gamma"]).copy())
        be = torch.from_numpy(np.asarray(p["bn"]["beta"]).copy())
        mu = torch.from_numpy(np.asarray(p["bn"]["mean"]).copy())
        var = torch.from_numpy(np.asarray(p["bn"]["var"]).copy())
        return (t - mu[:, None]) / torch.sqrt(var[:, None] + 1e-3) * g[:, None] + be[:, None]

    def new_len(l, spec):
        return (l + 2 * spec.padding - spec.dilation * (spec.kernel - 1) - 1) // spec.stride + 1

    xs = [x]
    cur_lens = lens
    for bp, bparams in zip(plan.blocks, enc_params["blocks"]):
        out = xs[-1]
        lens_orig = cur_lens
        l = cur_lens
        n = len(bp.convs)
        for ci, spec in enumerate(bp.convs):
            p = bparams["convs"][ci]
            out = mask(out, l)
            l = new_len(l, spec)
            out = conv(out, p, spec)
            if spec.has_bn:
                out = bn(out, p)
            if spec.end_of_repeat and ci != n - 1:
                out = torch.relu(out)
        if bp.residual:
            for pi, rspec in enumerate(bp.res):
                r = mask(xs[pi], lens_orig)
                r = conv(r, bparams["res"][pi], rspec)
                r = bn(r, bparams["res"][pi])
                out = out + r
        out = torch.relu(out)
        xs = xs + [out] if bp.dense_residual else [out]
        cur_lens = l
    return xs[-1].numpy().transpose(0, 2, 1), cur_lens.numpy()


@pytest.mark.parametrize("separable,dense", [(True, False), (False, False), (False, True)])
def test_float_encoder_matches_torch(separable, dense, rng):
    pytest.importorskip("torch")
    cfg, plan, enc, dec, dec_cfg = make_model(separable, dense)
    x = rng.normal(size=(2, 64, FEAT)).astype(np.float32)
    lens = np.asarray([64, 37], np.int32)
    ex = J.FloatExec(enc, activation="relu")
    got, got_lens = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    ref, ref_lens = torch_block_forward(plan, enc, x, lens)
    np.testing.assert_array_equal(np.asarray(got_lens), ref_lens)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_bn_folding_preserves_float_forward(rng):
    cfg, plan, enc, dec, dec_cfg = make_model()
    x = rng.normal(size=(2, 32, FEAT)).astype(np.float32)
    lens = np.asarray([32, 20], np.int32)
    ex = J.FloatExec(enc, activation="relu")
    y0, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    folded = J.fold_bn_encoder(enc)
    ex2 = J.FloatExec(folded, activation="relu")
    y1, _ = J.encoder_forward(ex2, plan, jnp.asarray(x), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-4)


def _calibrate(plan, folded, qstate, qcfg, batches, lens):
    for x in batches:
        ex = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=True)
        enc_out, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
        qstate = ex.new_qstate
    return qstate


def test_quant_pipeline_frozen_matches_quantexec(rng):
    cfg, plan, enc, dec, dec_cfg = make_model()
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=6, act_bit=6)
    qstate = J.init_qstate(plan)
    x = rng.normal(size=(2, 32, FEAT)).astype(np.float32)
    lens = np.asarray([32, 32], np.int32)
    qstate = _calibrate(plan, folded, qstate, qcfg,
                        [rng.normal(size=(2, 32, FEAT)).astype(np.float32)
                         for _ in range(3)], lens)
    # decoder act range needs calibration too: run decoder once with update
    ex = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=True)
    enc_out, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    _ = J.decoder_forward_quant(ex, dec, enc_out)
    qstate = ex.new_qstate

    # in-graph static path
    ex2 = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=False)
    out2, l2 = J.encoder_forward(ex2, plan, jnp.asarray(x), jnp.asarray(lens))
    lp2 = J.decoder_forward_quant(ex2, dec, out2)
    # frozen integer path
    tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg)
    fx = FrozenExec(tables, qcfg, activation="relu")
    out3, l3 = J.encoder_forward(fx, plan, jnp.asarray(x), jnp.asarray(lens))
    lp3 = fx.decoder(out3)

    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l3))
    # integer activations: should agree except rare mantissa-low-bit ties
    v2, v3 = np.asarray(out2.values), np.asarray(out3.values)
    frac_diff = np.mean(v2 != v3)
    assert frac_diff < 0.01, frac_diff
    assert np.abs(v2.astype(np.int64) - v3.astype(np.int64)).max() <= 1
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp3), atol=0.05)


def test_quantized_close_to_fp32_at_8bit(rng):
    cfg, plan, enc, dec, dec_cfg = make_model()
    x = rng.normal(size=(2, 32, FEAT)).astype(np.float32)
    lens = np.asarray([32, 32], np.int32)
    exf = J.FloatExec(enc, activation="relu")
    yf, _ = J.encoder_forward(exf, plan, jnp.asarray(x), jnp.asarray(lens))
    lpf = J.decoder_forward_float(dec, yf)

    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=8, act_bit=8)
    qstate = J.init_qstate(plan)
    for _ in range(4):
        ex = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=True)
        o, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
        J.decoder_forward_quant(ex, dec, o)
        qstate = ex.new_qstate
    tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg)
    fx = FrozenExec(tables, qcfg, activation="relu")
    yq, _ = J.encoder_forward(fx, plan, jnp.asarray(x), jnp.asarray(lens))
    lpq = fx.decoder(yq)
    # argmax agreement on nearly all frames
    agree = np.mean(np.argmax(np.asarray(lpf), -1) == np.argmax(np.asarray(lpq), -1))
    assert agree > 0.95, agree
    err = np.abs(np.asarray(yq.dequantize()) - np.asarray(yf))
    rel = err.mean() / (np.abs(np.asarray(yf)).mean() + 1e-9)
    assert rel < 0.1, rel


def test_nemo_state_dict_roundtrip(tmp_path):
    pytest.importorskip("torch")
    from qasr_tpu.compat.nemo_loader import params_from_state_dict, state_dict_from_params

    cfg, plan, enc, dec, dec_cfg = make_model(separable=True)
    params = {"encoder": enc, "decoder": dec}
    sd = state_dict_from_params(plan, params)
    back = params_from_state_dict(plan, sd)
    flat1, _ = jax.tree_util.tree_flatten(params)
    flat2, _ = jax.tree_util.tree_flatten(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_fused_dw_path_matches_unfused(rng):
    """Long-T frozen eval engages the fused dw kernel (requant+mask+taps+
    requant in one pallas call, freeze.py fuse_next); outputs must be
    bit-identical to the unfused FrozenExec composition."""
    cfg, plan, enc, dec, dec_cfg = make_model()
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=6, act_bit=6)
    qstate = J.init_qstate(plan)
    T = 400  # above the fused kernel's tile+halo envelope
    lens = np.asarray([T, T - 57], np.int32)
    qstate = _calibrate(plan, folded, qstate, qcfg,
                        [rng.normal(size=(2, T, FEAT)).astype(np.float32)
                         for _ in range(2)], lens)
    x = rng.normal(size=(2, T, FEAT)).astype(np.float32)
    ex = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=True)
    enc_out, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    _ = J.decoder_forward_quant(ex, dec, enc_out)
    qstate = ex.new_qstate

    tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg)
    n_fused = sum(1 for tb in tables["blocks"] for e in tb["convs"]
                  if e and e.get("fuse_next"))
    assert n_fused > 0, "fused dw->pw pairs should be marked in this model"

    fx = FrozenExec(tables, qcfg, activation="relu", fuse_dw=True)
    out_f, l_f = J.encoder_forward(fx, plan, jnp.asarray(x), jnp.asarray(lens))
    lp_f = fx.decoder(out_f)

    # unfused reference (the default path)
    fx_u = FrozenExec(tables, qcfg, activation="relu")
    out_u, l_u = J.encoder_forward(fx_u, plan, jnp.asarray(x), jnp.asarray(lens))
    lp_u = fx_u.decoder(out_u)

    np.testing.assert_array_equal(np.asarray(l_f), np.asarray(l_u))
    np.testing.assert_array_equal(np.asarray(out_f.values), np.asarray(out_u.values))
    np.testing.assert_array_equal(np.asarray(lp_f), np.asarray(lp_u))
