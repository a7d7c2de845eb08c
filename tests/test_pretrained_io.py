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
