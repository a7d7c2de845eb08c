"""The remaining reference example-script surfaces as CLIs:
speech_to_label (classification training), vad_infer (sliding-window VAD),
speech_to_text_rnnt (+ --tokenizer = the _bpe variant), and real-data
calibration in cli.inference (--calib_manifest, the role of the reference's
pytorch-quantization-based speech_to_text_calibrate/quant_infer examples).
"""
import json
import os

import numpy as np
import pytest
import yaml

from qasr_tpu.data.audio import write_wav

TINY_YAML = {
    "sample_rate": 16000,
    "labels": [" ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k",
               "l", "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w",
               "x", "y", "z", "'"],
    "preprocessor": {"features": 32, "dither": 0.0},
    "encoder": {
        "feat_in": 32, "activation": "relu",
        "jasper": [
            {"filters": 24, "repeat": 1, "kernel": [7], "stride": [2],
             "dilation": [1], "dropout": 0.0, "residual": False,
             "separable": True},
            {"filters": 32, "repeat": 1, "kernel": [1], "stride": [1],
             "dilation": [1], "dropout": 0.0, "residual": False},
        ],
    },
    "decoder": {"feat_in": 32, "num_classes": 28},
}


@pytest.fixture
def label_manifest(tmp_path, rng):
    man = tmp_path / "labels.json"
    with open(man, "w") as f:
        for i in range(6):
            p = tmp_path / f"c{i}.wav"
            # two separable classes: tone vs noise
            if i % 2 == 0:
                sig = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000) * 0.2
            else:
                sig = rng.normal(size=8000) * 0.1
            write_wav(str(p), sig.astype(np.float32))
            f.write(json.dumps({"audio_filepath": str(p), "duration": 0.5,
                                "label": "tone" if i % 2 == 0 else "noise"})
                    + "\n")
    return str(man)


@pytest.fixture
def text_manifest(tmp_path, rng):
    man = tmp_path / "text.json"
    with open(man, "w") as f:
        for i, t in enumerate(["hello world", "the cat sat"]):
            p = tmp_path / f"u{i}.wav"
            write_wav(str(p), (rng.normal(size=12000) * 0.05).astype(np.float32))
            f.write(json.dumps({"audio_filepath": str(p), "duration": 0.75,
                                "text": t}) + "\n")
    return str(man)


@pytest.fixture
def tiny_cfg_yaml(tmp_path):
    p = tmp_path / "tiny.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(TINY_YAML, f)
    return str(p)


def test_speech_to_label_cli(tmp_path, label_manifest, tiny_cfg_yaml):
    from qasr_tpu.cli.speech_to_label import main

    acc = main(["--train_manifest", label_manifest, "--config", tiny_cfg_yaml,
                "--batch_size", "2", "--max_steps", "6", "--lr", "0.05",
                "--time_length", "0.5"])
    assert 0.0 <= acc <= 1.0


def test_vad_infer_cli(tmp_path, label_manifest):
    from qasr_tpu.cli.vad_infer import main

    out_dir = str(tmp_path / "vad")
    outs = main(["--dataset", label_manifest, "--out_dir", out_dir,
                 "--time_length", "0.25", "--shift_length", "0.1",
                 "--labels", "tone,noise"])
    assert len(outs) == 6
    rows = open(outs[0]).read().strip().splitlines()
    assert len(rows) >= 2
    probs = [float(x) for x in rows[0].split()]
    assert abs(sum(probs) - 1.0) < 1e-3


def test_speech_to_text_rnnt_cli(tmp_path, text_manifest, tiny_cfg_yaml):
    from qasr_tpu.cli.speech_to_text_rnnt import main

    out = main(["--config", tiny_cfg_yaml, "--train_manifest", text_manifest,
                "--batch_size", "2", "--max_steps", "3",
                "--pred_hidden", "16", "--joint_hidden", "16"])
    assert np.isfinite(out["final_loss"])


def test_speech_to_text_rnnt_bpe_cli(tmp_path, text_manifest, tiny_cfg_yaml):
    from qasr_tpu.cli.speech_to_text_rnnt import main
    from qasr_tpu.data.tokenizers import BPETokenizer

    tok_path = str(tmp_path / "tok.json")
    BPETokenizer.train(["hello world the cat sat"] * 20, vocab_size=32,
                       save_path=tok_path)
    out = main(["--config", tiny_cfg_yaml, "--train_manifest", text_manifest,
                "--tokenizer", tok_path, "--batch_size", "2",
                "--max_steps", "3", "--pred_hidden", "16",
                "--joint_hidden", "16"])
    assert np.isfinite(out["final_loss"])


def test_inference_cli_real_data_calibration(tmp_path, text_manifest):
    """--calib_manifest: calibrate activation ranges on real audio instead of
    a synthetic pickle (speech_to_text_calibrate.py + quant_infer.py role)."""
    from qasr_tpu.cli.inference import main as infer_main
    from qasr_tpu.models.config import register_preset, ModelConfig

    register_preset("TinyCalibNet", lambda: ModelConfig.from_dict(TINY_YAML))
    wer = infer_main(["--asr_model", "TinyCalibNet", "--allow_random_weights",
                      "--dataset", text_manifest,
                      "--calib_manifest", text_manifest,
                      "--num_calib_batch", "1",
                      "--weight_bit", "8", "--act_bit", "8",
                      "--percentile", "99.9", "--batch_size", "2"])
    assert np.isfinite(wer)


def test_speech_to_label_save_then_vad_model(tmp_path, label_manifest,
                                             tiny_cfg_yaml):
    """Train -> save .qasr -> vad_infer --vad_model restores the checkpoint
    (closes the reference vad_infer workflow: trained model in, frames out)."""
    from qasr_tpu.cli.speech_to_label import main as train_main
    from qasr_tpu.cli.vad_infer import main as vad_main
    from qasr_tpu.models.classification import EncDecClassificationModel

    ckpt = str(tmp_path / "vad.qasr")
    train_main(["--train_manifest", label_manifest, "--config", tiny_cfg_yaml,
                "--batch_size", "2", "--max_steps", "4",
                "--time_length", "0.5", "--save_to", ckpt])
    m = EncDecClassificationModel.restore_from(ckpt)
    assert m.num_classes == 2

    outs = vad_main(["--vad_model", ckpt, "--dataset", label_manifest,
                     "--out_dir", str(tmp_path / "vad2"),
                     "--time_length", "0.25", "--shift_length", "0.1",
                     "--labels", "tone,noise"])
    assert len(outs) == 6


def test_speaker_model_save_restore(tmp_path, rng):
    from qasr_tpu.models.classification import EncDecSpeakerLabelModel
    from qasr_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_dict(TINY_YAML)
    m = EncDecSpeakerLabelModel.from_config(cfg, num_speakers=5,
                                            emb_sizes=(16,), angular=True)
    audio = rng.normal(size=(2, 6000)).astype(np.float32) * 0.1
    alens = np.full((2,), 6000, np.int32)
    e1 = m.embeddings(audio, alens)
    p = str(tmp_path / "spk.qasr")
    m.save_to(p)
    m2 = EncDecSpeakerLabelModel.restore_from(p)
    assert m2.num_speakers == 5 and m2.angular
    np.testing.assert_allclose(m2.embeddings(audio, alens), e1, atol=1e-6)


def test_vad_model_label_order_mismatch_rejected(tmp_path, label_manifest,
                                                 tiny_cfg_yaml):
    """A checkpoint trained with one label order must refuse a different
    --labels order (a silent mismatch would swap the speech column)."""
    from qasr_tpu.cli.speech_to_label import main as train_main
    from qasr_tpu.cli.vad_infer import main as vad_main
    from qasr_tpu.models.classification import (
        EncDecClassificationModel, EncDecSpeakerLabelModel,
    )

    ckpt = str(tmp_path / "vad.qasr")
    train_main(["--train_manifest", label_manifest, "--config", tiny_cfg_yaml,
                "--batch_size", "2", "--max_steps", "2",
                "--time_length", "0.5", "--save_to", ckpt])
    with pytest.raises(ValueError, match="training order"):
        vad_main(["--vad_model", ckpt, "--dataset", label_manifest,
                  "--out_dir", str(tmp_path / "x"), "--time_length", "0.25",
                  "--shift_length", "0.1", "--labels", "noise,tone"])
    # cross-family restore gives a clear error, not a KeyError
    with pytest.raises(ValueError, match="not a speaker checkpoint"):
        EncDecSpeakerLabelModel.restore_from(ckpt)
