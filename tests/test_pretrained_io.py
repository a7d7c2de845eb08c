"""from_pretrained cache lookup + .nemo round trip through a real archive."""
import os

import numpy as np
import pytest

from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.models.config import DecoderConfig, ModelConfig
from tests.test_jasper_model import tiny_encoder_cfg, FEAT


def _tiny_cfg_dict():
    return {
        "sample_rate": 16000,
        "labels": [" ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k",
                   "l", "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w",
                   "x", "y", "z", "'"],
        "preprocessor": {"features": FEAT, "dither": 0.0},
        "encoder": {
            "feat_in": FEAT, "activation": "relu",
            "jasper": [
                {"filters": 24, "repeat": 1, "kernel": [7], "stride": [2],
                 "dilation": [1], "dropout": 0.0, "residual": False,
                 "separable": True},
                {"filters": 24, "repeat": 2, "kernel": [5], "stride": [1],
                 "dilation": [1], "dropout": 0.0, "residual": True,
                 "separable": True},
                {"filters": 40, "repeat": 1, "kernel": [1], "stride": [1],
                 "dilation": [1], "dropout": 0.0, "residual": False},
            ],
        },
        "decoder": {"feat_in": 40, "num_classes": 28},
    }


def test_nemo_save_load_roundtrip_and_cache_lookup(tmp_path, monkeypatch, rng):
    pytest.importorskip("torch")
    from qasr_tpu.compat.nemo_loader import save_nemo
    from qasr_tpu.models.config import ModelConfig

    cfg_d = _tiny_cfg_dict()
    cfg = ModelConfig.from_dict(cfg_d)
    m = ASRModel.from_config(cfg, seed=3)
    nemo_path = tmp_path / "TinyNet.nemo"
    save_nemo(str(nemo_path), cfg_d, m.plan, m.params)

    # direct path load
    m2 = ASRModel.from_pretrained(str(nemo_path))
    audio = rng.normal(size=(1, 4000)).astype(np.float32) * 0.1
    lens = np.asarray([4000], np.int32)
    lp1 = m.forward(audio, lens, mode="fp32")[0]
    lp2 = m2.forward(audio, lens, mode="fp32")[0]
    np.testing.assert_allclose(lp1, lp2, atol=1e-5)

    # cache-dir lookup by name (the NGC cache role)
    monkeypatch.setenv("QASR_PRETRAINED_DIR", str(tmp_path))
    m3 = ASRModel.from_pretrained("TinyNet")
    lp3 = m3.forward(audio, lens, mode="fp32")[0]
    np.testing.assert_allclose(lp1, lp3, atol=1e-5)


def test_list_available_models():
    cards = ASRModel.list_available_models()
    names = {c["name"] for c in cards}
    assert "QuartzNet15x5Base-En" in names and "Jasper10x5Dr-En" in names
    qn = next(c for c in cards if c["name"] == "QuartzNet15x5Base-En")
    assert qn["dev_clean_wer"] == 3.79  # ctc_models.py:58


def test_save_to_restore_from_qasr(tmp_path, rng):
    from qasr_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_dict(_tiny_cfg_dict())
    m = ASRModel.from_config(cfg, seed=5)
    audio = rng.normal(size=(1, 4000)).astype(np.float32) * 0.1
    lens = np.asarray([4000], np.int32)
    lp1 = m.forward(audio, lens, mode="fp32")[0]
    p = tmp_path / "model.qasr"
    m.save_to(str(p))
    m2 = ASRModel.restore_from(str(p))
    lp2 = m2.forward(audio, lens, mode="fp32")[0]
    np.testing.assert_allclose(lp1, lp2, atol=1e-6)
    assert list(m2.vocabulary) == list(m.vocabulary)


def test_save_to_nemo_then_restore(tmp_path, rng):
    pytest.importorskip("torch")
    from qasr_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_dict(_tiny_cfg_dict())
    m = ASRModel.from_config(cfg, seed=6)
    p = tmp_path / "model.nemo"
    m.save_to(str(p))
    m2 = ASRModel.restore_from(str(p))
    audio = rng.normal(size=(1, 4000)).astype(np.float32) * 0.1
    lens = np.asarray([4000], np.int32)
    np.testing.assert_allclose(m.forward(audio, lens, mode="fp32")[0],
                               m2.forward(audio, lens, mode="fp32")[0],
                               atol=1e-5)


def test_preset_without_cache_raises(monkeypatch):
    """Preset honesty: fabricated weights must be opt-in (common.py:378-433
    would download or fail; it never silently invents parameters)."""
    monkeypatch.delenv("QASR_PRETRAINED_DIR", raising=False)
    with pytest.raises(FileNotFoundError):
        ASRModel.from_pretrained("QuartzNet15x5Base-En")
    m = ASRModel.from_pretrained("QuartzNet15x5Base-En",
                                 allow_random_weights=True)
    assert m.cfg.decoder.num_classes == 28


def test_folded_qasr_roundtrip(tmp_path, rng):
    """A BN-folded + calibrated model's .qasr archive must restore to a
    numerically identical model (the quantization workflow's checkpoint)."""
    from qasr_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_dict(_tiny_cfg_dict())
    m = ASRModel.from_config(cfg, seed=7)
    m.set_quant_bit(6, "all")
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.25)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    lens = np.asarray([4000, 3200], np.int32)
    lp1 = m.forward(audio, lens)[0]

    p = tmp_path / "folded.qasr"
    m.save_to(str(p))
    m2 = ASRModel.restore_from(str(p))
    assert m2.folded
    assert m2.qcfg.weight_bit == 6 and m2.qcfg.act_bit == 6
    lp2 = m2.forward(audio, lens)[0]
    np.testing.assert_array_equal(lp1, lp2)


def test_restricted_unpickler_blocks_code(tmp_path):
    import pickle

    from qasr_tpu.compat.pickle_io import load_synthetic, save_synthetic

    # round-trips the legitimate payload
    b = [np.zeros((2, 4, 8), np.float32)]
    p = tmp_path / "syn.pkl"
    save_synthetic(str(p), b)
    out = load_synthetic(str(p))
    assert out[0].shape == (2, 8, 4)  # stored (B, C, T)

    # blocks a code-executing payload
    class Evil:
        def __reduce__(self):
            return (__import__("os").system, ("true",))

    evil = tmp_path / "evil.pkl"
    with open(evil, "wb") as f:
        pickle.dump([Evil()], f)
    with pytest.raises(pickle.UnpicklingError):
        load_synthetic(str(evil))


def test_training_ckpt_suffix_normalization(tmp_path):
    from qasr_tpu.utils.checkpoint import load_training_ckpt, save_training_ckpt

    params = {"w": np.ones((3,), np.float32)}
    opt = (np.zeros((3,), np.float32),)
    path = str(tmp_path / "ckpt")  # no .npz suffix
    save_training_ckpt(path, params, opt, step=5)
    p2, o2, step, _ = load_training_ckpt(path, params, opt)
    assert step == 5
    np.testing.assert_array_equal(p2["w"], params["w"])


def _bpe_model(tmp_path):
    from qasr_tpu.data.tokenizers import BPETokenizer
    from qasr_tpu.models.config import ModelConfig
    from qasr_tpu.models.ctc_bpe_model import EncDecCTCModelBPE

    tok = BPETokenizer.train(["hello world the cat sat on the mat"] * 30,
                             vocab_size=40, save_path=str(tmp_path / "tok.json"))
    cfg = ModelConfig.from_dict(_tiny_cfg_dict())
    import dataclasses as dc
    cfg = dc.replace(cfg, decoder=dc.replace(cfg.decoder, feat_in=40))
    return EncDecCTCModelBPE.from_config_and_tokenizer(cfg, tok, seed=9), tok


@pytest.mark.parametrize("ext", ["qasr", "nemo"])
def test_bpe_tokenizer_artifact_roundtrip(tmp_path, ext):
    """A BPE model's archive must pack + restore its tokenizer (the
    reference's artifact registry, modelPT.py:254-296,383): the restored
    model detokenizes identically with no reference to the original file."""
    if ext == "nemo":
        pytest.importorskip("torch")
    from qasr_tpu.models.ctc_bpe_model import EncDecCTCModelBPE

    m, tok = _bpe_model(tmp_path)
    ids = tok.text_to_ids("the cat sat")
    p = tmp_path / f"bpe_model.{ext}"
    m.save_to(str(p))
    # remove the original tokenizer file: restore must use the packed copy
    os.remove(tok.path)

    m2 = ASRModel.restore_from(str(p))
    assert isinstance(m2, EncDecCTCModelBPE)
    assert m2.tokenizer is not None
    assert m2.tokenizer.ids_to_text(ids) == "the cat sat"
    assert list(m2.vocabulary) == list(m.vocabulary)
    # weights survived too
    audio = np.random.default_rng(1).normal(size=(1, 4000)).astype(np.float32) * 0.1
    lens = np.asarray([4000], np.int32)
    np.testing.assert_allclose(m.forward(audio, lens, mode="fp32")[0],
                               m2.forward(audio, lens, mode="fp32")[0], atol=1e-5)
