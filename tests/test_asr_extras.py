"""Coverage for the smaller reference-parity pieces: speech-label dataset
(audio_to_label.py), LSTM CTC decoder head (lstm_decoder.py, golden vs
torch.nn.LSTM), Chars/Phonemes vocabs (data/vocabs.py), and the BPE
transducer (rnnt_bpe_models.py)."""
import json

import numpy as np
import pytest
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# AudioToSpeechLabelDataset
# ---------------------------------------------------------------------------


@pytest.fixture
def label_manifest(tmp_path, rng):
    from qasr_tpu.data.audio import write_wav

    man = tmp_path / "labels.json"
    labels = ["yes", "no", "stop"]
    with open(man, "w") as f:
        for i in range(5):
            p = tmp_path / f"cmd{i}.wav"
            write_wav(str(p), rng.normal(size=8000 + 500 * i).astype(np.float32) * 0.05)
            f.write(json.dumps({"audio_filepath": str(p),
                                "duration": (8000 + 500 * i) / 16000.0,
                                "label": labels[i % 3]}) + "\n")
    return str(man), labels


def test_speech_label_dataset(label_manifest):
    from qasr_tpu.data.audio_to_label import AudioToSpeechLabelDataset

    man, labels = label_manifest
    ds = AudioToSpeechLabelDataset(man, labels)
    assert len(ds) == 5
    sig, lab = ds[0]
    assert sig.dtype == np.float32 and lab == 0
    batches = list(ds.batches(batch_size=2))
    assert sum(b[0].shape[0] for b in batches) == 5
    audio, lens, labs = batches[0]
    assert audio.shape[0] == 2 and lens.shape == (2,) and labs.shape == (2,)
    # padding zeroed
    assert np.all(audio[0, lens[0]:] == 0)


def test_speech_label_fixed_slice_and_vad_windows(label_manifest):
    from qasr_tpu.data.audio_to_label import AudioToSpeechLabelDataset

    man, labels = label_manifest
    ds = AudioToSpeechLabelDataset(man, labels, time_length=0.25,
                                   shift_length=0.1)
    sig, _ = ds[4]  # longer than the slice
    assert len(sig) == 4000
    sig0, _ = AudioToSpeechLabelDataset(man, labels, time_length=1.0)[0]
    assert len(sig0) == 16000  # repeat-padded up to the slice
    wins = list(ds.vad_windows(4))
    assert len(wins) >= 2
    assert all(len(w) == 4000 for w, _ in wins)


def test_speech_label_duration_filter(label_manifest):
    from qasr_tpu.data.audio_to_label import AudioToSpeechLabelDataset

    man, labels = label_manifest
    ds = AudioToSpeechLabelDataset(man, labels, min_duration=0.55)
    assert len(ds) < 5


# ---------------------------------------------------------------------------
# LSTM decoder (golden vs torch.nn.LSTM)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bidirectional,layers", [(False, 1), (True, 2)])
def test_lstm_decoder_matches_torch(bidirectional, layers, rng):
    torch = pytest.importorskip("torch")
    from qasr_tpu.models.lstm_decoder import (
        init_lstm_decoder, lstm_decoder_forward,
    )

    B, T, D, H, V = 2, 12, 8, 16, 5
    params = init_lstm_decoder(rng, D, V, hidden=H, num_layers=layers,
                               bidirectional=bidirectional)
    ref = torch.nn.LSTM(D, H, num_layers=layers, batch_first=True,
                        bidirectional=bidirectional)
    lin = torch.nn.Linear(H * (2 if bidirectional else 1), V + 1)
    with torch.no_grad():
        for li in range(layers):
            for d in range(2 if bidirectional else 1):
                p = params["lstm"][li][d]
                sfx = "_reverse" if d == 1 else ""
                getattr(ref, f"weight_ih_l{li}{sfx}").copy_(
                    torch.from_numpy(np.asarray(p["wi"]).T.copy()))
                getattr(ref, f"weight_hh_l{li}{sfx}").copy_(
                    torch.from_numpy(np.asarray(p["wh"]).T.copy()))
                getattr(ref, f"bias_ih_l{li}{sfx}").copy_(
                    torch.from_numpy(np.asarray(p["b"]).copy()))
                getattr(ref, f"bias_hh_l{li}{sfx}").zero_()
        lin.weight.copy_(torch.from_numpy(np.asarray(params["w"]).T.copy()))
        lin.bias.copy_(torch.from_numpy(np.asarray(params["b"]).copy()))

    x = rng.normal(size=(B, T, D)).astype(np.float32)
    with torch.no_grad():
        y, _ = ref(torch.from_numpy(x))
        lp_ref = torch.log_softmax(lin(y), dim=-1).numpy()
    lp = np.asarray(lstm_decoder_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(lp, lp_ref, atol=2e-5)


# ---------------------------------------------------------------------------
# vocabs
# ---------------------------------------------------------------------------


def test_chars_vocab_roundtrip():
    from qasr_tpu.data.vocabs import Chars

    v = Chars(punct=True)
    ids = v.encode("Hello, world!")
    assert v.decode(ids) == "hello, world!"
    # unknown symbol -> oov token
    ids2 = v.encode("a#b")
    assert v.oov in ids2


def test_phonemes_vocab_with_injected_g2p():
    from qasr_tpu.data.vocabs import Phonemes

    fake = lambda text: ["HH", "AH0", "L", "OW1", " "]
    v = Phonemes(g2p=fake)
    ids = v.encode("hello ")
    assert v.decode(ids) == "HHAH0LOW1 "
    bare = Phonemes()
    if bare._g2p is None:  # g2p_en not installed in this image
        with pytest.raises(ImportError):
            bare.encode("x")


# ---------------------------------------------------------------------------
# RNNT-BPE model
# ---------------------------------------------------------------------------


def test_rnnt_bpe_transcribe_detokenizes(tmp_path, rng):
    from qasr_tpu.data.tokenizers import BPETokenizer
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.rnnt import RNNTConfig
    from qasr_tpu.models.rnnt_model import EncDecRNNTBPEModel
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    tok = BPETokenizer.train(["the cat sat on the mat"] * 20, vocab_size=32,
                             save_path=str(tmp_path / "tok.json"))
    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=1),
                      preprocessor={"features": FEAT, "dither": 0.0})
    rnnt_cfg = RNNTConfig(num_classes=tok.vocab_size, enc_hidden=40,
                          pred_hidden=16, joint_hidden=16)
    m = EncDecRNNTBPEModel.from_config_and_tokenizer(cfg, tok,
                                                     rnnt_cfg=rnnt_cfg, seed=2)
    audio = rng.normal(size=(1, 6000)).astype(np.float32) * 0.05
    hyps = m.transcribe_greedy(audio, np.asarray([6000], np.int32))
    assert len(hyps) == 1 and isinstance(hyps[0], str)
    loss = m.loss_fn(m.params, jnp.asarray(audio),
                     jnp.asarray([6000]),
                     jnp.asarray([[1, 2, 3]], jnp.int32),
                     jnp.asarray([3], jnp.int32))
    assert np.isfinite(float(loss))
