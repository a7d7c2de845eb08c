"""Conformer-CTC composition (models/conformer_ctc.py): training smoke,
greedy decode, PTQ with the dec_in head site, checkpoint round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qasr_tpu.models.config import (
    DecoderConfig, EncoderConfig, ModelConfig,
)
from qasr_tpu.models.conformer import ConformerConfig
from qasr_tpu.models.conformer_ctc import ConformerCTC

LABELS = (" ", "a", "b", "c")
CCFG = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                       subsampling="striding", subsampling_factor=4,
                       subsampling_conv_channels=16, conv_kernel_size=9,
                       dropout=0.0)


def _model(seed=0):
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(LABELS)),
        labels=LABELS,
        preprocessor={"features": 32, "dither": 0.0},
    )
    return ConformerCTC.from_config(cfg, CCFG, seed=seed)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12800], np.int32)
    targets = np.asarray([[1, 2, 3, 1], [2, 2, 1, 0]], np.int32)
    tlens = np.asarray([4, 3], np.int32)
    return audio, alens, targets, tlens


def test_forward_shapes_and_blank(data):
    m = _model()
    audio, alens, _, _ = data
    lp, el = m.forward(audio, alens)
    assert lp.shape[0] == 2 and lp.shape[2] == len(LABELS) + 1
    assert m.blank_id == len(LABELS)
    np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0,
                               rtol=1e-4)
    assert int(el[1]) < int(el[0])


def test_ctc_training_reduces_loss(data):
    m = _model()
    audio, alens, targets, tlens = data
    opt = optax.adam(3e-4)
    state = opt.init(m.params)

    @jax.jit
    def step(params, state, rng):
        loss, g = jax.value_and_grad(m.loss_fn)(
            params, audio, alens, targets, tlens, rng=rng)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    rng = jax.random.PRNGKey(0)
    losses = []
    params = m.params
    for i in range(12):
        rng, sub = jax.random.split(rng)
        params, state, loss = step(params, state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_quantize_encoder_and_decoder_site(data):
    m = _model()
    audio, alens, _, _ = data
    lp_f, el_f = m.forward(audio, alens)
    m.quantize_encoder([(audio, alens)], weight_bit=8, act_bit=8)
    assert "dec_in" in m.enc_qstate
    assert float(m.enc_qstate["dec_in"]["x_max"]) > \
        float(m.enc_qstate["dec_in"]["x_min"])
    lp_q, el_q = m.forward(audio, alens)
    np.testing.assert_array_equal(np.asarray(el_f), np.asarray(el_q))
    n0 = int(np.asarray(el_f)[0])
    drift = np.abs(np.asarray(lp_q - lp_f))[:, :n0].mean()
    assert drift < 0.25, drift
    hyps = m.transcribe_greedy(audio, alens)
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)


def test_checkpoint_roundtrip(tmp_path, data):
    m = _model()
    audio, alens, _, _ = data
    m.quantize_encoder([(audio, alens)], weight_bit=6, act_bit=6,
                       quantize_attention=True)
    lp, _ = m.forward(audio, alens)
    p = str(tmp_path / "cc.qasr")
    m.save_to(p)
    m2 = ConformerCTC.restore_from(p)
    assert m2.enc_qcfg.weight_bit == 6
    assert m2.enc_qcfg.quantize_attention is True
    lp2, _ = m2.forward(audio, alens)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lp2))
    # family guard
    from qasr_tpu.models.rnnt_model import RNNTModel

    with pytest.raises(ValueError):
        RNNTModel.restore_from(p)


def test_corpus_wer_vs_bits():
    """Corpus-scale accuracy for Conformer PTQ (the Conformer analogue of
    the QuartzNet WER-vs-bits capstone, test_e2e_quantization_accuracy.py):
    train to low WER on the 30-utterance procedural corpus, then assert
    the int8 path preserves WER and lower bit widths degrade in order."""
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
    for i in range(350):
        idx = nprng.choice(len(texts), size=10, replace=False)
        rng, sub = jax.random.split(rng)
        params, state, loss = step(params, state, sub, audio[idx],
                                   lens[idx], toks[idx], tlens[idx])
    m.params = params

    def wer_of(model):
        w = WER(list(labels))
        for i in range(0, len(texts), 10):
            sl = slice(i, i + 10)
            lp, el = model.forward(audio[sl], lens[sl])
            preds = np.asarray(jnp.argmax(lp, axis=-1))
            w.update(preds, toks[sl], tlens[sl], np.asarray(el))
        return w.compute()

    wer_f = wer_of(m)
    assert wer_f < 0.15, f"float model failed to train (WER {wer_f})"

    calib = [(audio[i:i + 10], lens[i:i + 10]) for i in range(0, 30, 10)]
    wers = {}
    for wb, ab in ((8, 8), (4, 6)):
        m.enc_qstate = None
        m.quantize_encoder(calib, weight_bit=wb, act_bit=ab,
                           quantize_attention=True)
        wers[(wb, ab)] = wer_of(m)
    assert wers[(8, 8)] <= wer_f + 0.05, (wers, wer_f)
    assert wers[(8, 8)] <= wers[(4, 6)] + 1e-9, wers
