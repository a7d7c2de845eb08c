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


REF_CONF_DIR = "/root/reference/examples/asr/experimental/conformer"


@pytest.mark.parametrize("name", ["conformer_char.yaml",
                                  "conformer_bpe.yaml",
                                  "conformer_linear_decoder_bpe.yaml"])
def test_reference_conformer_yamls_build(name):
    """The reference's own conformer configs construct a working model
    (char: labels from YAML + LSTMDecoder head; bpe: labels from the
    tokenizer)."""
    import os

    from qasr_tpu.models.conformer_ctc import conformer_ctc_from_yaml

    path = os.path.join(REF_CONF_DIR, name)
    if not os.path.exists(path):
        pytest.skip("reference not available")
    tok = None
    if "bpe" in name:
        class _Tok:
            vocab = [chr(ord("a") + i) for i in range(16)]
        tok = _Tok()
    m = conformer_ctc_from_yaml(path, tokenizer=tok, seed=0)
    assert m.ccfg.n_layers == 16 and m.ccfg.d_model == 256
    assert m.ccfg.feat_in == 80
    # vggnet subsampling with conv channels resolved (-1 -> d_model in bpe)
    assert m.ccfg.subsampling in ("vggnet", "striding")
    if "linear_decoder" in name:
        assert m.decoder_kind == "linear"
    else:
        assert m.decoder_kind == "lstm"
        assert len(m.params["decoder"]["lstm"]) >= 1
    # abstract forward: shapes thread without running 16 layers
    audio = jax.ShapeDtypeStruct((2, 16000), jnp.float32)
    alens = jax.ShapeDtypeStruct((2,), jnp.int32)

    def f(a, l):
        feats, fl = m.frontend(a, l, dither=0.0)
        return m._apply(m.params, feats, fl)

    lp, el = jax.eval_shape(f, audio, alens)
    assert lp.shape[0] == 2 and lp.shape[2] == len(m.cfg.labels) + 1


def test_lstm_decoder_head_roundtrip(tmp_path, data):
    """decoder_kind='lstm' trains/infers and survives save/restore."""
    audio, alens, _, _ = data
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(LABELS)),
        labels=LABELS,
        preprocessor={"features": 32, "dither": 0.0},
    )
    m = ConformerCTC.from_config(cfg, CCFG, seed=0, decoder_kind="lstm",
                                 lstm_hidden=32, lstm_layers=2,
                                 bidirectional=True)
    lp, el = m.forward(audio, alens)
    assert lp.shape[2] == len(LABELS) + 1
    np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0,
                               rtol=1e-4)
    # PTQ still quantizes the encoder; the recurrent head stays float
    m.quantize_encoder([(audio, alens)])
    hyps = m.transcribe_greedy(audio, alens)
    p = str(tmp_path / "lstm.qasr")
    m.save_to(p)
    m2 = ConformerCTC.restore_from(p)
    assert m2.decoder_kind == "lstm"
    assert m2.transcribe_greedy(audio, alens) == hyps


def test_speech_to_text_cli_trains_conformer(tmp_path):
    """cli/speech_to_text.py dispatches ConformerEncoder configs to the
    Conformer-CTC trainer (the reference runs its conformer YAMLs through
    the same speech_to_text.py loop)."""
    import json
    import yaml

    from qasr_tpu.data.audio import write_wav
    from qasr_tpu.cli.speech_to_text import main as stt_main

    rng = np.random.default_rng(0)
    man = tmp_path / "manifest.json"
    with open(man, "w") as f:
        for i, text in enumerate(["ab", "ba", "aab"]):
            p = tmp_path / f"u{i}.wav"
            write_wav(str(p), (rng.normal(size=12000) * 0.05
                               ).astype(np.float32))
            f.write(json.dumps({"audio_filepath": str(p), "duration": 0.75,
                                "text": text}) + "\n")
    cfg = {
        "model": {
            "sample_rate": 16000,
            "labels": [" ", "a", "b"],
            "preprocessor": {"features": 32, "dither": 0.0},
            "encoder": {
                "_target_": "nemo.collections.asr.modules.ConformerEncoder",
                "feat_in": 32, "n_layers": 1, "d_model": 32, "n_heads": 4,
                "subsampling": "striding", "subsampling_factor": 4,
                "subsampling_conv_channels": 16, "conv_kernel_size": 9,
                "dropout": 0.0, "dropout_emb": 0.0, "dropout_att": 0.0},
            "decoder": {
                "_target_": "nemo.collections.asr.modules.ConvASRDecoder",
                "num_classes": 3},
            "train_ds": {"manifest_filepath": str(man), "batch_size": 3},
            "optim": {"name": "novograd", "lr": 0.01,
                      "sched": {"name": "CosineAnnealing",
                                "warmup_steps": 0}},
        },
        "trainer": {"max_steps": 3},
        "exp_manager": {"exp_dir": str(tmp_path / "exp")},
    }
    cpath = tmp_path / "tiny_conformer.yaml"
    with open(cpath, "w") as f:
        yaml.safe_dump(cfg, f)
    stt_main(["--config-path", str(cpath),
              f"model.validation_ds.manifest_filepath={man}",
              "model.validation_ds.batch_size=3"])
    # a checkpoint was written by exp_manager
    import glob
    assert glob.glob(str(tmp_path / "exp" / "**" / "*.ckpt*"),
                     recursive=True) or \
        glob.glob(str(tmp_path / "exp" / "**" / "checkpoints" / "*"),
                  recursive=True)
    # resume: a second invocation restores and continues (the shim-based
    # trainer must train from the RESTORED weights, not a fresh init)
    stt_main(["--config-path", str(cpath),
              f"model.validation_ds.manifest_filepath={man}",
              "model.validation_ds.batch_size=3",
              "trainer.max_steps=5",
              "exp_manager.resume_if_exists=true"])
    assert glob.glob(str(tmp_path / "exp" / "**" / "step_5*"),
                     recursive=True)


def test_transcribe_beam_matches_greedy_on_confident_model(data):
    """C++ prefix beam over the quantized Conformer's log-probs; on 2
    random-weight utterances beam(width=1..N) at least returns strings,
    and a trained confident model's beam == greedy."""
    audio, alens, targets, tlens = data
    m = _model()
    opt = optax.adam(1e-3)
    state = opt.init(m.params)

    @jax.jit
    def step(params, state, rng):
        loss, g = jax.value_and_grad(m.loss_fn)(
            params, audio, alens, targets, tlens, rng=rng)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    rng = jax.random.PRNGKey(0)
    params = m.params
    for i in range(60):
        rng, sub = jax.random.split(rng)
        params, state, _ = step(params, state, sub)
    m.params = params
    m.quantize_encoder([(audio, alens)])
    greedy = m.transcribe_greedy(audio, alens)
    beam = m.transcribe_beam(audio, alens, beam_width=16)
    assert beam == greedy, (beam, greedy)


def test_corpus_wer_frozen_matches_ptq():
    """Frozen integer-only path at corpus scale: WER within one
    substitution of the calibrated PTQ path on the 30-utterance corpus."""
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

    def wer_of():
        w = WER(list(labels))
        for i in range(0, len(texts), 10):
            sl = slice(i, i + 10)
            lp, el = m.forward(audio[sl], lens[sl])
            preds = np.asarray(jnp.argmax(lp, axis=-1))
            w.update(preds, toks[sl], tlens[sl], np.asarray(el))
        return w.compute()

    calib = [(audio[i:i + 10], lens[i:i + 10]) for i in range(0, 30, 10)]
    m.quantize_encoder(calib, quantize_attention=True, integer_softmax=True,
                       integer_layernorm=True, integer_activations=True,
                       static_attention=True)
    wer_ptq = wer_of()
    m.freeze()
    wer_frozen = wer_of()
    total_words = sum(len(t.split()) for t in texts)
    assert abs(wer_frozen - wer_ptq) <= 2.0 / total_words, \
        (wer_frozen, wer_ptq)


def test_corpus_wer_frozen_matches_ptq_w6a6_d512():
    """W6A6 zero-shot at d_model=512 / 8 heads (VERDICT r4 stretch): the
    scale the reference Conformer config family tops out at
    (examples/asr/experimental/conformer/ goes to d_model 512).  Guards
    the frozen path's int8 context requant at wide heads (d_k=64: the
    per-head score/ctx accumulators grow 4x vs the d=64 test above, so a
    requant-headroom bug would surface here first): frozen WER within one
    substitution of the calibrated PTQ path, both at weight_bit=6/act_bit=6."""
    from tests.corpus_utils import make_corpus, tokenize
    from qasr_tpu.decode.ctc import WER

    labels = tuple(" abcdefghijklmnopqrstuvwxyz")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=512, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=512, n_heads=8,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    texts, audio, lens = make_corpus(30, seed=3)
    toks, tlens = tokenize(texts, labels)
    opt = optax.adam(1e-3)
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
    for _ in range(300):
        idx = nprng.choice(len(texts), size=10, replace=False)
        rng, sub = jax.random.split(rng)
        params, state, _ = step(params, state, sub, audio[idx],
                                lens[idx], toks[idx], tlens[idx])
    m.params = params

    def wer_of():
        w = WER(list(labels))
        for i in range(0, len(texts), 10):
            sl = slice(i, i + 10)
            lp, el = m.forward(audio[sl], lens[sl])
            preds = np.asarray(jnp.argmax(lp, axis=-1))
            w.update(preds, toks[sl], tlens[sl], np.asarray(el))
        return w.compute()

    wer_f = wer_of()
    assert wer_f < 0.15, f"float d=512 model failed to train (WER {wer_f})"

    calib = [(audio[i:i + 10], lens[i:i + 10]) for i in range(0, 30, 10)]
    m.quantize_encoder(calib, weight_bit=6, act_bit=6,
                       quantize_attention=True, integer_softmax=True,
                       integer_layernorm=True, integer_activations=True,
                       static_attention=True)
    wer_ptq = wer_of()
    m.freeze()
    wer_frozen = wer_of()
    total_words = sum(len(t.split()) for t in texts)
    assert abs(wer_frozen - wer_ptq) <= 2.0 / total_words, \
        (wer_frozen, wer_ptq)
    # zero-shot W6A6 quality at this width: the calibrated path itself must
    # stay within a few substitutions of float (wide-head requant headroom)
    assert wer_ptq <= wer_f + 6.0 / total_words, (wer_ptq, wer_f)
