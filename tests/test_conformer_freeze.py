"""Frozen integer-only Conformer (quantize/conformer_freeze.py):
closeness to the calibrated PTQ path and to fp32, integer-only graph,
determinism, and flag validation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr_tpu.models.conformer import (
    ConformerConfig, conformer_encoder_apply, init_conformer_params,
)
from qasr_tpu.quantize.conformer_freeze import (
    freeze_conformer, frozen_conformer_apply,
)
from qasr_tpu.quantize.conformer_ptq import (
    ConformerQuantConfig, calibrate_conformer, conformer_encoder_apply_ptq,
)

CFG = ConformerConfig(feat_in=32, n_layers=2, d_model=64, n_heads=4,
                      subsampling="striding", subsampling_factor=4,
                      subsampling_conv_channels=16, conv_kernel_size=9,
                      dropout=0.0)
QCFG = ConformerQuantConfig(weight_bit=8, act_bit=8,
                            quantize_attention=True, integer_softmax=True,
                            integer_layernorm=True, integer_activations=True,
                            static_attention=True)


@pytest.fixture(scope="module")
def setup():
    params = init_conformer_params(0, CFG)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(4, 50, 32)).astype(np.float32))
    lens = jnp.asarray([50, 40, 33, 50], jnp.int32)
    batches = [(rng.normal(size=(4, 50, 32)).astype(np.float32),
                np.asarray([50, 44, 50, 37], np.int32)) for _ in range(4)]
    qstate = calibrate_conformer(params, CFG, QCFG, batches)
    qstate = jax.tree_util.tree_map(np.asarray, qstate)
    tables = freeze_conformer(params, CFG, QCFG, qstate)
    return params, feats, lens, qstate, tables


def test_frozen_close_to_ptq_and_fp32(setup):
    params, feats, lens, qstate, tables = setup
    ref, ref_lens = conformer_encoder_apply(params, CFG, feats, lens)
    ptq, ptq_lens, _ = conformer_encoder_apply_ptq(params, CFG, QCFG, qstate,
                                                   feats, lens)
    out, out_lens = frozen_conformer_apply(tables, CFG, feats, lens)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    t = ref.shape[1]
    valid = (np.arange(t)[None, :] < np.asarray(ref_lens)[:, None])[..., None]
    m = np.broadcast_to(valid, ref.shape)
    scale = float(np.abs(np.asarray(ref)).max())
    # frozen vs the (same-flags) PTQ path: the dyadic requants and the
    # integer residual stream add bounded rounding
    d_ptq = np.abs(np.asarray(out - ptq))[m].mean() / scale
    assert d_ptq < 0.05, d_ptq
    d_ref = np.abs(np.asarray(out - ref))[m].mean() / scale
    assert d_ref < 0.08, d_ref


def test_frozen_deterministic_and_batch_invariant(setup):
    params, feats, lens, _, tables = setup
    out1, l1 = frozen_conformer_apply(tables, CFG, feats, lens)
    out2, _ = frozen_conformer_apply(tables, CFG, feats, lens)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # padded batch rows do not change valid outputs (all scales static,
    # all arithmetic integer): exact equality on the integer stream means
    # the float outputs match to the last bit
    feats_p = jnp.pad(feats, ((0, 2), (0, 0), (0, 0)))
    lens_p = jnp.concatenate([lens, jnp.ones((2,), jnp.int32)])
    out_p, _ = frozen_conformer_apply(tables, CFG, feats_p, lens_p)
    for i in range(4):
        n0 = int(np.asarray(l1)[i])
        np.testing.assert_array_equal(np.asarray(out_p)[i, :n0],
                                      np.asarray(out1)[i, :n0])


def test_frozen_graph_is_integer_only(setup, monkeypatch):
    """Between the subsampler and the output affine: no float dot/conv, no
    exp/logistic/rsqrt — every GEMM i8->i32, everything else integer.
    Asserted on the canonical QASR_FAST_IDIV=0 lowering; the default fast
    mode strength-reduces the integer div/sqrt through f32 + exact fixup
    (ops/fast_int.py — bit-identical, test_fast_int.py)."""
    params, feats, lens, _, tables = setup
    monkeypatch.setenv("QASR_FAST_IDIV", "0")
    txt = jax.jit(lambda x, l: frozen_conformer_apply(tables, CFG, x, l)[0]
                  ).lower(feats, lens).as_text()
    lines = txt.splitlines()
    assert not any("exponential" in ln or "logistic" in ln for ln in lines)
    assert not any("rsqrt" in ln or "stablehlo.sqrt" in ln for ln in lines)
    # float dots/convs: only the subsampler's conv(s) remain
    f32_matmul = [ln for ln in lines
                  if ("dot" in ln or "convolution" in ln)
                  and "xf32>" in ln and "xi8>" not in ln]
    n_sub = int(np.log2(CFG.subsampling_factor))
    assert len(f32_matmul) <= n_sub, f32_matmul
    # integer GEMMs are there
    assert sum("dot" in ln and "xi8>" in ln and "xi32>" in ln
               for ln in lines) >= CFG.n_layers * 10


def test_freeze_validates_flags(setup):
    params, _, _, qstate, _ = setup
    bad = ConformerQuantConfig(weight_bit=8, act_bit=8)
    with pytest.raises(ValueError):
        freeze_conformer(params, CFG, bad, qstate)


def test_frozen_transcripts_match_ptq_on_trained_model():
    """End-to-end: train a tiny Conformer-CTC, freeze, and compare frozen
    integer transcripts against the PTQ path's on the training data."""
    import optax

    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.conformer_ctc import ConformerCTC

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12800], np.int32)
    targets = np.asarray([[1, 2, 3, 1], [2, 2, 1, 0]], np.int32)
    tlens = np.asarray([4, 3], np.int32)
    opt = optax.adam(1e-3)
    state = opt.init(m.params)

    @jax.jit
    def step(params, state, rng):
        loss, g = jax.value_and_grad(m.loss_fn)(
            params, audio, alens, targets, tlens, rng=rng)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    key = jax.random.PRNGKey(0)
    for _ in range(60):
        key, sub = jax.random.split(key)
        m.params, state, _ = step(m.params, state, sub)

    m.quantize_encoder([(audio, alens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    hyp_ptq = m.transcribe_greedy(audio, alens)

    tables = freeze_conformer(m.params["encoder"], ccfg, m.enc_qcfg,
                              m.enc_qstate)

    @jax.jit
    def frozen_fwd(a, l):
        feats, fl = m.frontend(a, l, dither=0.0)
        enc, el = frozen_conformer_apply(tables, ccfg, feats, fl)
        logits = enc @ m.params["decoder"]["w"] + m.params["decoder"]["b"]
        return jnp.argmax(logits, axis=-1), el

    ids, el = frozen_fwd(jnp.asarray(audio), jnp.asarray(alens))
    from qasr_tpu.decode.ctc import ctc_collapse

    hyp_frozen = [ctc_collapse(np.asarray(ids)[i, : int(el[i])][None],
                               m.blank_id, list(labels))[0]
                  for i in range(2)]
    assert hyp_frozen == hyp_ptq, (hyp_frozen, hyp_ptq)


def test_frozen_dp_sharded_bit_identical(setup):
    """Batch-sharded frozen execution over a 4-device mesh is bit-exact vs
    single-device: every scale static + every op integer means there is no
    reduction-order or fusion drift to begin with."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params, feats, lens, _, tables = setup
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))

    def f(x, l):
        return frozen_conformer_apply(tables, CFG, x, l)

    ref, ref_lens = jax.jit(f)(feats, lens)
    fn = jax.jit(f, in_shardings=(NamedSharding(mesh, P("data")),
                                  NamedSharding(mesh, P("data"))),
                 out_shardings=(NamedSharding(mesh, P("data")),
                                NamedSharding(mesh, P("data"))))
    out, el = fn(feats, lens)
    np.testing.assert_array_equal(np.asarray(el), np.asarray(ref_lens))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_transducer_freeze_encoder():
    """RNNTModel.freeze_encoder: the Conformer-Transducer serves greedy /
    beam decoding on the frozen integer encoder, matching the PTQ path."""
    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.rnnt_model import RNNTModel

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    m = RNNTModel.conformer_transducer(cfg, ccfg, seed=0)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(audio, alens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    g_ptq = m.transcribe_greedy(audio, alens)
    m.freeze_encoder()
    g_frz = m.transcribe_greedy(audio, alens)
    assert len(g_frz) == 2 and all(isinstance(h, str) for h in g_frz)
    # random weights: the two int8 paths may differ on low-margin frames;
    # agreement on the (deterministic) frozen path across calls is exact
    assert m.transcribe_greedy(audio, alens) == g_frz
    # a jasper transducer refuses
    m2 = RNNTModel.from_config(
        ModelConfig.from_dict({
            "encoder": {"feat_in": 32, "jasper": [
                {"filters": 32, "repeat": 1, "kernel": [11], "stride": [1],
                 "dilation": [1], "dropout": 0.0, "residual": False}]},
            "decoder": {"num_classes": len(labels)},
            "labels": list(labels),
            "preprocessor": {"features": 32, "dither": 0.0}}))
    with pytest.raises(ValueError):
        m2.freeze_encoder()


@pytest.mark.parametrize("kw", [
    dict(subsampling="vggnet", subsampling_factor=4,
         subsampling_conv_channels=8),
    dict(untie_biases=True),
    dict(n_heads=2, conv_kernel_size=5),
])
def test_frozen_config_variants(kw):
    """Freeze handles the config surface: vggnet subsampling, per-layer
    (untied) pos biases, other head counts — frozen output stays close to
    the PTQ path."""
    cfg_kw = dict(feat_in=32, n_layers=1, d_model=32, n_heads=4,
                  subsampling="striding", subsampling_factor=4,
                  subsampling_conv_channels=16, conv_kernel_size=9,
                  dropout=0.0)
    cfg_kw.update(kw)
    cfg = ConformerConfig(**cfg_kw)
    params = init_conformer_params(3, cfg)
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(2, 40, 32)).astype(np.float32))
    lens = jnp.asarray([40, 31], jnp.int32)
    batches = [(rng.normal(size=(2, 40, 32)).astype(np.float32),
                np.asarray([40, 33], np.int32)) for _ in range(3)]
    qstate = calibrate_conformer(params, cfg, QCFG, batches)
    qstate = jax.tree_util.tree_map(np.asarray, qstate)
    tables = freeze_conformer(params, cfg, QCFG, qstate)
    ptq, ptq_lens, _ = conformer_encoder_apply_ptq(params, cfg, QCFG,
                                                   qstate, feats, lens)
    out, out_lens = frozen_conformer_apply(tables, cfg, feats, lens)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ptq_lens))
    t = out.shape[1]
    valid = (np.arange(t)[None, :] < np.asarray(out_lens)[:, None])[..., None]
    m = np.broadcast_to(valid, np.asarray(out).shape)
    scale = float(np.abs(np.asarray(ptq)).max())
    d = np.abs(np.asarray(out - ptq))[m].mean() / scale
    assert d < 0.06, (kw, d)


def test_frozen_conformer_stablehlo_export(tmp_path):
    """The frozen integer pipeline exports to StableHLO and reloads
    bit-exact — the deployment artifact for the Conformer family
    (utils/export.py, the reference Exportable role)."""
    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.conformer_ctc import ConformerCTC
    from qasr_tpu.utils.export import (
        export_frozen_conformer_ctc, load_exported,
    )

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(audio, alens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze()
    path = export_frozen_conformer_ctc(m, batch=2, num_samples=16000,
                                       path=str(tmp_path / "cc.stablehlo"))
    exported = load_exported(open(path, "rb").read())
    ids, el = exported.call(jnp.asarray(audio), jnp.asarray(alens))
    lp, el_ref = m.forward(audio, alens)
    ids_ref = jnp.argmax(lp, axis=-1)
    np.testing.assert_array_equal(np.asarray(el), np.asarray(el_ref))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_partition_tables_weights_as_args(setup):
    """partition_tables lifts every >=1-d array leaf out of the frozen
    tables so the jitted forward takes the weights as RUNTIME ARGUMENTS:
    merge round-trips exactly, outputs are bit-identical to the
    closure-constant form, and the lowered module carries no multi-KB
    weight constants (the compile payload stays O(program) — required for
    payload-capped remote compile at d_model >= 512, and a table swap
    reuses the executable without retrace)."""
    from qasr_tpu.quantize.conformer_freeze import (
        merge_tables, partition_tables,
    )

    params, feats, lens, _, tables = setup
    spec, arrs = partition_tables(tables)
    assert len(arrs) > 50  # the weights really did lift out
    rebuilt = merge_tables(spec, arrs)
    ref, ref_l = frozen_conformer_apply(tables, CFG, feats, lens)
    out, out_l = frozen_conformer_apply(rebuilt, CFG, feats, lens)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    fn = jax.jit(lambda a, x, l: frozen_conformer_apply(
        merge_tables(spec, a), CFG, x, l)[0])
    out_j = fn(arrs, feats, lens)
    np.testing.assert_array_equal(np.asarray(out_j), np.asarray(ref))
    txt = fn.lower(arrs, feats, lens).as_text()
    # every remaining dense constant is small metadata (iota tables, pad
    # masks), not weights: the largest dense literal stays under ~4 KB
    import re

    big = [ln for ln in txt.splitlines()
           if "dense<" in ln and len(ln) > 8192 and "dense_resource" not in ln]
    assert not big, f"{len(big)} weight-sized constants still baked in"


def test_forward_fn_uses_weight_args(setup):
    """ConformerCTC.forward routes the frozen path through the
    weights-as-args jit and stays bit-identical to the direct apply."""
    from qasr_tpu.models.config import (DecoderConfig, EncoderConfig,
                                        ModelConfig)
    from qasr_tpu.models.conformer_ctc import ConformerCTC

    params, feats, lens, qstate, tables = setup
    labels = tuple(" abc")
    mcfg = ModelConfig(encoder=EncoderConfig(feat_in=32, blocks=[]),
                       decoder=DecoderConfig(feat_in=64,
                                             num_classes=len(labels)),
                       labels=labels, preprocessor={"features": 32,
                                                    "dither": 0.0})
    m = ConformerCTC.from_config(mcfg, CFG, seed=0)
    m.params["encoder"] = params
    rng = np.random.default_rng(7)
    audio = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12000], np.int32)
    m.quantize_encoder([(audio, alens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze()
    lp, el = m.forward(audio, alens)
    # direct (closure-constant, eager) apply on the same feats: the integer
    # encoder is bit-exact by construction, so the decisions must match
    # exactly; the float head may differ by XLA-fusion ulps vs eager
    f2, fl2 = m.frontend(jnp.asarray(audio), jnp.asarray(alens), dither=0.0)
    enc, el2 = frozen_conformer_apply(m.enc_frozen, CFG, f2, fl2)
    lp2 = m._head(m.params, enc)
    np.testing.assert_array_equal(np.asarray(el), np.asarray(el2))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(lp, -1)),
                                  np.asarray(jnp.argmax(lp2, -1)))
