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
