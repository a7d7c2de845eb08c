"""Static-exponent dyadic requant: exactness and closeness to the
per-channel-exponent reference mode."""
import numpy as np
import pytest
import jax.numpy as jnp

from qasr_tpu.ops.quant_prims import (
    Dyadic, dyadic_from_scale_host, dyadic_from_scale_host_static_e,
    dyadic_requant, dyadic_requant_static, requant_clamp,
)


def test_static_matches_vector_when_e_uniform(rng):
    z = jnp.asarray(rng.integers(-(2**27), 2**27, size=5000), jnp.int32)
    m = jnp.asarray(rng.integers(2**30, 2**31, size=()), jnp.int32)
    for e in (18, 31, 32, 40, 45):
        a = dyadic_requant(z, Dyadic(m, jnp.int32(e)))
        b = dyadic_requant_static(z, m, e)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_e_decomposition_value(rng):
    scales = np.abs(rng.normal(size=16).astype(np.float64)) * 1e-3 + 1e-6
    m, e = dyadic_from_scale_host_static_e(scales)
    vals = m.astype(np.float64) * 2.0 ** -e
    # largest channel keeps full 31-bit precision; others lose bits
    # proportionally to their magnitude but stay within 2**-23 relative
    rel = np.abs(vals - scales) / scales
    assert rel.max() < 2**-20, rel.max()
    assert isinstance(e, int) and m.dtype == np.int32
    assert m.max() < 2**31 and m.min() >= 1


def test_frozen_static_vs_per_channel_pipeline(rng):
    from qasr_tpu.models.config import QuantConfig
    from qasr_tpu.models import jasper as J
    from qasr_tpu.quantize.freeze import FrozenExec, freeze_model
    from tests.test_jasper_model import make_model, _calibrate

    cfg, plan, enc, dec, dec_cfg = make_model()
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=6, act_bit=6)
    qstate = J.init_qstate(plan)
    x = rng.normal(size=(2, 32, 16)).astype(np.float32)
    lens = np.asarray([32, 32], np.int32)
    qstate = _calibrate(plan, folded, qstate, qcfg,
                        [rng.normal(size=(2, 32, 16)).astype(np.float32)
                         for _ in range(3)], lens)
    ex = J.QuantExec(folded, qstate, qcfg, activation="relu", update_ranges=True)
    enc_out, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    J.decoder_forward_quant(ex, dec, enc_out)
    qstate = ex.new_qstate

    outs = {}
    for mode in ("per_channel", "static_e"):
        tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg,
                              dyadic_mode=mode)
        fx = FrozenExec(tables, qcfg, activation="relu")
        o, _ = J.encoder_forward(fx, plan, jnp.asarray(x), jnp.asarray(lens))
        outs[mode] = np.asarray(o.values).astype(np.int64)
    diff = np.abs(outs["per_channel"] - outs["static_e"])
    assert diff.max() <= 2, diff.max()
    assert (diff > 0).mean() < 0.02, (diff > 0).mean()


def test_frozen_static_e16_pipeline(rng):
    """16-bit-mantissa mode (dyadic_mode='static_e16'): the deployed
    integer outputs stay within a small drift of the reference-exact
    per-channel mode (scale error <= 2**-16 per requant), and the greedy
    transcript is preserved end-to-end."""
    from qasr_tpu.models.config import QuantConfig
    from qasr_tpu.models import jasper as J
    from qasr_tpu.quantize.freeze import FrozenExec, freeze_model
    from tests.test_jasper_model import make_model, _calibrate

    cfg, plan, enc, dec, dec_cfg = make_model()
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=6, act_bit=6)
    qstate = J.init_qstate(plan)
    x = rng.normal(size=(2, 32, 16)).astype(np.float32)
    lens = np.asarray([32, 32], np.int32)
    qstate = _calibrate(plan, folded, qstate, qcfg,
                        [rng.normal(size=(2, 32, 16)).astype(np.float32)
                         for _ in range(3)], lens)
    ex = J.QuantExec(folded, qstate, qcfg, activation="relu",
                     update_ranges=True)
    enc_out, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    J.decoder_forward_quant(ex, dec, enc_out)
    qstate = ex.new_qstate

    outs = {}
    lps = {}
    for mode in ("per_channel", "static_e16"):
        tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg,
                              dyadic_mode=mode)
        assert tables["dyadic16"] == (mode == "static_e16")
        fx = FrozenExec(tables, qcfg, activation="relu")
        o, _ = J.encoder_forward(fx, plan, jnp.asarray(x), jnp.asarray(lens))
        outs[mode] = np.asarray(o.values).astype(np.int64)
        lps[mode] = np.asarray(J.decoder_forward_quant_frozen(fx, o)) \
            if hasattr(J, "decoder_forward_quant_frozen") else None
    diff = np.abs(outs["per_channel"] - outs["static_e16"])
    # 2**-16 relative scale error per requant accumulates through the
    # stack; integer activations live on a ~2**6 grid so the drift stays
    # within a few counts
    assert diff.max() <= 4, diff.max()
    assert (diff > 0).mean() < 0.10, (diff > 0).mean()


def test_static_e16_whole_model_transcripts(rng, monkeypatch):
    """ASRModel frozen forward in static_e16 mode: greedy ids match the
    exact-mode transcripts on the fused-kernel path."""
    from qasr_tpu.models.config import (
        BlockConfig, DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.ctc_model import ASRModel, make_frozen_fn

    blocks = (
        BlockConfig(filters=64, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(33,), residual=True,
                    separable=True),
    )
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=64, blocks=blocks, activation="relu"),
        decoder=DecoderConfig(feat_in=64, num_classes=28),
        preprocessor={"features": 64, "dither": 1e-5})
    audio = rng.normal(size=(2, 16000)).astype(np.float32) * 0.1
    lens = np.asarray([16000, 12000], np.int32)
    monkeypatch.setenv("QASR_DW_MXU", "1")
    monkeypatch.setenv("QASR_CM", "1")
    monkeypatch.setenv("QASR_CM_FUSED", "1")

    m = ASRModel.from_config(cfg, seed=0)
    m.set_quant_bit(6, "all")
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
    ids = {}
    for mode in ("static_e", "static_e16"):
        fn = make_frozen_fn(m, m.freeze(dyadic_mode=mode), argmax=True)
        ids[mode], _ = fn(jnp.asarray(audio), jnp.asarray(lens))
    # greedy ids (hence transcripts) preserved under the narrow multipliers
    agree = np.mean(np.asarray(ids["static_e"]) == np.asarray(ids["static_e16"]))
    assert agree > 0.999, agree


def test_static_e16_overflow_falls_back(rng):
    """A non-separable conv with a huge contraction (K*Cin) can push the
    worst-case int32 accumulator past the 16-bit scheme's |z| < 2**30
    exactness bound; freeze must detect it and fall back to static_e
    (ADVICE r2: dyadic_requant_static16's p_hi would overflow silently)."""
    import jax
    from qasr_tpu.models.config import (
        BlockConfig, DecoderConfig, EncoderConfig, QuantConfig,
    )
    from qasr_tpu.models import jasper as J
    from qasr_tpu.quantize.freeze import freeze_model
    from tests.test_jasper_model import FEAT, _calibrate

    blocks = (
        BlockConfig(filters=1024, repeat=1, kernel=(3,), residual=False,
                    separable=False),
        # contraction = 65 * 1024 = 66560; with 8-bit acts (bound 2**8 after
        # the asymmetric trick) and |w| <= 127: > 2**30
        BlockConfig(filters=8, repeat=1, kernel=(65,), residual=False,
                    separable=False),
    )
    cfg = EncoderConfig(feat_in=FEAT, blocks=blocks, activation="relu")
    plan = J.build_encoder_plan(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc = J.init_encoder_params(k1, plan)
    dec_cfg = DecoderConfig(feat_in=8, num_classes=28)
    dec = J.init_decoder_params(k2, dec_cfg)
    folded = J.fold_bn_encoder(enc)
    qcfg = QuantConfig(weight_bit=8, act_bit=8)
    x = rng.normal(size=(1, 16, FEAT)).astype(np.float32)
    lens = np.asarray([16], np.int32)
    ex = J.QuantExec(folded, J.init_qstate(plan), qcfg, activation="relu",
                     update_ranges=True)
    enc_out, _ = J.encoder_forward(ex, plan, jnp.asarray(x), jnp.asarray(lens))
    J.decoder_forward_quant(ex, dec, enc_out)
    qstate = ex.new_qstate
    tables = freeze_model(plan, folded, dec, qstate, qcfg, dec_cfg,
                          dyadic_mode="static_e16")
    assert tables["dyadic16"] is False  # fell back to the 31-bit scheme
    # a small-contraction model keeps the 16-bit mode
    from tests.test_jasper_model import make_model
    _, plan2, enc2, dec2, dec_cfg2 = make_model()
    folded2 = J.fold_bn_encoder(enc2)
    ex2 = J.QuantExec(folded2, J.init_qstate(plan2), qcfg, activation="relu",
                      update_ranges=True)
    eo2, _ = J.encoder_forward(ex2, plan2, jnp.asarray(x), jnp.asarray(lens))
    J.decoder_forward_quant(ex2, dec2, eo2)
    t2 = freeze_model(plan2, folded2, dec2, ex2.new_qstate, qcfg, dec_cfg2,
                      dyadic_mode="static_e16")
    assert t2["dyadic16"] is True


def test_int16_pcm_ingest_bit_exact(rng, monkeypatch):
    """make_frozen_fn accepts int16 PCM and scales it on-device
    (ctc_model._pcm_f32); since wav decode is x_i16/32768 and the device
    applies x_i16 * 2**-15 in f32 (both exact), the log-probs must be
    bit-identical to feeding the host-decoded float32.  This is the
    half-the-ingest-bytes serving path (PERF.md round 3d)."""
    from qasr_tpu.models.config import (
        BlockConfig, DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.ctc_model import ASRModel, make_frozen_fn

    blocks = (
        BlockConfig(filters=64, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(33,), residual=True,
                    separable=True),
    )
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=64, blocks=blocks, activation="relu"),
        decoder=DecoderConfig(feat_in=64, num_classes=28),
        preprocessor={"features": 64, "dither": 1e-5})
    pcm16 = rng.integers(-3000, 3000, (2, 16000)).astype(np.int16)
    audio = pcm16.astype(np.float32) / 32768.0   # read_wav's decode
    lens = np.asarray([16000, 12000], np.int32)
    monkeypatch.setenv("QASR_DW_MXU", "1")
    monkeypatch.setenv("QASR_CM", "1")

    m = ASRModel.from_config(cfg, seed=0)
    m.set_quant_bit(6, "all")
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
    tables = m.freeze()
    for fused in ("0", "1"):
        monkeypatch.setenv("QASR_CM_FUSED", fused)
        fn = make_frozen_fn(m, tables)
        lp_f32, el_f32 = fn(jnp.asarray(audio), jnp.asarray(lens))
        lp_i16, el_i16 = fn(jnp.asarray(pcm16), jnp.asarray(lens))
        np.testing.assert_array_equal(np.asarray(el_f32), np.asarray(el_i16))
        np.testing.assert_array_equal(np.asarray(lp_f32), np.asarray(lp_i16),
                                      err_msg=f"fused={fused}")
