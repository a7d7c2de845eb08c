"""Tokenizer + tarred dataset + BPE model tests."""
import json
import os

import numpy as np
import pytest

from qasr_tpu.data.tokenizers import BPETokenizer, CharTokenizer, WordTokenizer
from qasr_tpu.data.tarred import TarredAudioToCharDataset, create_tarred_dataset


def test_char_word_tokenizers():
    ct = CharTokenizer([" ", "a", "b"])
    assert ct.text_to_ids("ab a") == [1, 2, 0, 1]
    assert ct.ids_to_text([1, 2]) == "ab"
    wt = WordTokenizer(["hello", "world"])
    assert wt.ids_to_text(wt.text_to_ids("world hello")) == "world hello"
    assert wt.text_to_ids("unknown")[0] == wt.vocab_size - 1


def test_bpe_tokenizer_train_roundtrip(tmp_path):
    texts = ["the cat sat on the mat", "the dog sat on the log",
             "cats and dogs sat"] * 20
    tok = BPETokenizer.train(texts, vocab_size=60, save_path=str(tmp_path / "tok.json"))
    ids = tok.text_to_ids("the cat sat")
    assert len(ids) > 0
    assert tok.ids_to_text(ids) == "the cat sat"
    assert tok.vocab_size <= 60
    # reload from file
    tok2 = BPETokenizer(str(tmp_path / "tok.json"))
    assert tok2.text_to_ids("the cat sat") == ids


def test_bpe_ctc_model(tmp_path, rng):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.ctc_bpe_model import EncDecCTCModelBPE
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    tok = BPETokenizer.train(["hello world the cat sat"] * 30, vocab_size=40,
                             save_path=str(tmp_path / "tok.json"))
    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = EncDecCTCModelBPE.from_config_and_tokenizer(cfg, tok)
    assert m.blank_id == tok.vocab_size
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    lp, el, preds = m.forward(audio, np.asarray([4000, 3000], np.int32),
                              mode="fp32")
    assert lp.shape[-1] == tok.vocab_size + 1
    hyps = m.decode_hypotheses(preds, el)
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)


@pytest.fixture
def wav_manifest(tmp_path, rng):
    from qasr_tpu.data.audio import write_wav

    man = tmp_path / "manifest.json"
    with open(man, "w") as f:
        for i in range(6):
            p = tmp_path / f"utt{i}.wav"
            write_wav(str(p), rng.normal(size=4000).astype(np.float32) * 0.05)
            f.write(json.dumps({"audio_filepath": str(p), "duration": 0.25,
                                "text": f"utterance number {i}"}) + "\n")
    return str(man)


def test_tarred_dataset_scatter(tmp_path, wav_manifest):
    shards, man = create_tarred_dataset(wav_manifest, str(tmp_path / "tarred"),
                                        num_shards=2)
    assert len(shards) == 2 and all(os.path.exists(s) for s in shards)
    labels = [" ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l",
              "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y",
              "z", "'"]
    full = list(TarredAudioToCharDataset(shards, man, labels,
                                         shard_strategy="replicate"))
    assert len(full) == 6
    # scatter over 2 workers partitions the shards
    w0 = list(TarredAudioToCharDataset(shards, man, labels, global_rank=0,
                                       world_size=2))
    w1 = list(TarredAudioToCharDataset(shards, man, labels, global_rank=1,
                                       world_size=2))
    assert len(w0) + len(w1) == 6
    sig, toks = full[0]
    assert sig.dtype == np.float32 and toks.dtype == np.int32
    # batch collation
    batches = list(TarredAudioToCharDataset(shards, man, labels,
                                            shard_strategy="replicate").batches(4))
    assert batches[0][0].shape[0] == 4
