"""Data-free Conformer calibration (quantize/conformer_synth.py):
BN-stat refresh compensation, distillation convergence, and the full
zero-shot pipeline (synthesize -> calibrate -> transcribe)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qasr_tpu.models.config import (
    DecoderConfig, EncoderConfig, ModelConfig,
)
from qasr_tpu.models.conformer import (
    ConformerConfig, conformer_encoder_apply, init_conformer_params,
)
from qasr_tpu.models.conformer_ctc import ConformerCTC
from qasr_tpu.quantize.conformer_synth import (
    conformer_bn_targets, estimate_bn_stats, get_synthetic_conformer_data,
)

CCFG = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                       subsampling="striding", subsampling_factor=4,
                       subsampling_conv_channels=16, conv_kernel_size=9,
                       dropout=0.0)


def test_estimate_bn_stats_is_output_preserving():
    params = init_conformer_params(0, CCFG)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(4, 40, 32)).astype(np.float32))
    lens = jnp.asarray([40, 33, 40, 28], jnp.int32)
    ref, _ = conformer_encoder_apply(params, CCFG, feats, lens)
    new = estimate_bn_stats(params, CCFG, [(feats, lens)])
    bn0 = params["layers"][0]["conv"]["bn"]
    bn1 = new["layers"][0]["conv"]["bn"]
    # stats changed (now data-informed) ...
    assert float(np.abs(bn1["mean"] - bn0["mean"]).max()) > 1e-3
    # ... but the model's function is numerically unchanged
    out, _ = conformer_encoder_apply(new, CCFG, feats, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_distillation_converges_toward_bn_stats():
    params = init_conformer_params(0, CCFG)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(4, 40, 32)).astype(np.float32) * 2)
    lens = jnp.full((4,), 40, jnp.int32)
    params = estimate_bn_stats(params, CCFG, [(feats, lens)])
    batches, losses = get_synthetic_conformer_data(
        params, CCFG, batch_size=4, seqlen=40, train_iter=150, num_batch=1,
        lr=0.05, seed=0)
    assert losses.shape == (1, 150)
    assert losses[0, -1] < 0.25 * losses[0, 0], losses[0, [0, -1]]
    x, ls = batches[0]
    assert x.shape == (4, 40, 32) and (ls == 40).all()


def test_zero_shot_pipeline_on_trained_model():
    """The headline zero-shot claim at Conformer scale: train on the
    procedural corpus, refresh BN stats (output-preserving), then
    quantize WITHOUT ANY REAL DATA — synthetic calibration must land
    within a few substitutions of real-data calibration."""
    from tests.corpus_utils import make_corpus, tokenize
    from qasr_tpu.decode.ctc import WER

    labels = tuple(" abcdefghijklmnopqrstuvwxyz")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    m = ConformerCTC.from_config(cfg, CCFG, seed=0)
    texts, audio, lens = make_corpus(30, seed=3)
    toks, tlens = tokenize(texts, labels)
    opt = optax.adam(2e-3)
    state = opt.init(m.params)

    @jax.jit
    def step(params, state, rng, a, al, tk, tl):
        loss, g = jax.value_and_grad(m.loss_fn)(params, a, al, tk, tl,
                                                rng=rng)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    params = m.params
    for _ in range(350):
        idx = nprng.choice(len(texts), size=10, replace=False)
        rng, sub = jax.random.split(rng)
        params, state, _ = step(params, state, sub, audio[idx],
                                lens[idx], toks[idx], tlens[idx])
    m.params = params

    # provider step: refresh BN stats from training features (the torch
    # train-mode running-stat role), output-preserving
    @jax.jit
    def front(a, l):
        return m.frontend(a, l, dither=0.0)

    feat_batches = [front(jnp.asarray(audio[i:i + 10]),
                          jnp.asarray(lens[i:i + 10]))
                    for i in range(0, 30, 10)]
    m.params["encoder"] = estimate_bn_stats(m.params["encoder"], CCFG,
                                            feat_batches)

    def wer_of():
        w = WER(list(labels))
        for i in range(0, len(texts), 10):
            sl = slice(i, i + 10)
            lp, el = m.forward(audio[sl], lens[sl])
            preds = np.asarray(jnp.argmax(lp, axis=-1))
            w.update(preds, toks[sl], tlens[sl], np.asarray(el))
        return w.compute()

    wer_f = wer_of()
    assert wer_f < 0.15, wer_f

    calib = [(audio[i:i + 10], lens[i:i + 10]) for i in range(0, 30, 10)]
    m.quantize_encoder(calib, weight_bit=8, act_bit=8)
    wer_real = wer_of()

    m.quantize_encoder_synthetic(num_batch=2, batch_size=8, seqlen=96,
                                 train_iter=200, lr=0.05, seed=0,
                                 weight_bit=8, act_bit=8)
    wer_synth = wer_of()
    total_words = sum(len(t.split()) for t in texts)
    # zero-shot within a few substitutions of real-data calibration
    assert wer_synth <= wer_real + 4.0 / total_words, (wer_synth, wer_real)
    assert wer_synth <= wer_f + 6.0 / total_words, (wer_synth, wer_f)
