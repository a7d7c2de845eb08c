"""speech_to_text_sclite CLI: trn emission format and WER output."""
import json
import os

import numpy as np
import pytest

from qasr_tpu.cli.speech_to_text_sclite import main, write_trn


def test_write_trn_format(tmp_path):
    ref, hyp = write_trn(str(tmp_path), ["u0", "u1"],
                         ["the cat", "a dog"], ["the cat", "the dog"])
    lines = open(hyp).read().splitlines()
    assert lines == [" the cat (u0)", " a dog (u1)"]
    rlines = open(ref).read().splitlines()
    assert rlines[1] == " the dog (u1)"


def test_sclite_cli_end_to_end(tmp_path, monkeypatch):
    from qasr_tpu.data.audio import write_wav
    from qasr_tpu.models.ctc_model import ASRModel
    from tests.test_cli_e2e import _tiny_cfg

    # cached preset
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("QASR_PRETRAINED_DIR", str(cache))
    m = ASRModel.from_config(_tiny_cfg(), seed=0)
    m.save_to(str(cache / "TinySclite.nemo"))

    rng = np.random.default_rng(0)
    man = tmp_path / "man.json"
    with open(man, "w") as f:
        for i, text in enumerate(["hello world", "the cat"]):
            p = tmp_path / f"utt{i}.wav"
            write_wav(str(p), (rng.normal(size=16000) * 0.05
                               ).astype(np.float32))
            f.write(json.dumps({"audio_filepath": str(p), "duration": 1.0,
                                "text": text}) + "\n")
    out = tmp_path / "out"
    hypfile = main(["--asr_model", "TinySclite", "--dataset", str(man),
                    "--out_dir", str(out), "--batch_size", "2"])
    assert os.path.exists(hypfile)
    hyp_lines = open(hypfile).read().splitlines()
    ref_lines = open(out / "ref.trn").read().splitlines()
    assert len(hyp_lines) == 2 and len(ref_lines) == 2
    assert ref_lines[0].endswith("(utt0)") and "hello world" in ref_lines[0]
    assert hyp_lines[1].endswith("(utt1)")


def test_conformer_infer_cli(tmp_path):
    """cli/conformer_infer.py: restore -> calibrate (real audio) -> freeze
    -> integer evaluate -> WER (the inference.py workflow for the
    Conformer family)."""
    import json

    import numpy as np

    from qasr_tpu.cli.conformer_infer import main
    from qasr_tpu.data.audio import write_wav
    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), rng.standard_normal(8000).astype(np.float32)
                  * 0.05, 16000)
        rows.append({"audio_filepath": str(p), "duration": 0.5,
                     "text": "ab"})
    man = tmp_path / "m.json"
    man.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(encoder=EncoderConfig(feat_in=32, blocks=[]),
                      decoder=DecoderConfig(feat_in=64,
                                            num_classes=len(labels)),
                      labels=labels,
                      preprocessor={"features": 32, "dither": 0.0})
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16,
                           conv_kernel_size=9, dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    ckpt = tmp_path / "model.qasr"
    m.save_to(str(ckpt))

    wer = main(["--restore", str(ckpt), "--dataset", str(man),
                "--calib_manifest", str(man), "--num_calib_batch", "1",
                "--freeze", "--batch_size", "2"])
    assert np.isfinite(wer)
