"""cli/manifest_tools.py: the scp / long-audio / speech-commands / vad-data
dataset-prep roles (reference scripts/{scp_to_manifest,
write_long_audio_manifest,process_speech_commands_data,process_vad_data})."""
import json
import os

import numpy as np
import pytest

from qasr_tpu.cli.manifest_tools import (
    chunk_long_audio, main, process_speech_commands, process_vad_data,
    scp_to_manifest, stratified_split,
)
from qasr_tpu.data.audio import write_wav


def _wav(path, seconds=0.5, sr=16000, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    write_wav(str(path), rng.standard_normal(int(sr * seconds)) * 0.05, sr)
    return str(path)


def _read_manifest(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_scp_to_manifest(tmp_path):
    paths = [_wav(tmp_path / "data" / spk / f"utt{i}.wav", seed=i)
             for i, spk in enumerate(["spk_a", "spk_a", "spk_a",
                                      "spk_b", "spk_b", "spk_b"])]
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(paths) + "\n")
    out = tmp_path / "all.json"
    label_id = str(paths[0]).count("/") - 1  # the <spk> path component
    rows = scp_to_manifest(str(scp), label_id, str(out), split=True)
    assert {r["label"] for r in rows} == {"spk_a", "spk_b"}
    assert all(abs(r["duration"] - 0.5) < 1e-6 for r in rows)
    train = _read_manifest(tmp_path / "train.json")
    dev = _read_manifest(tmp_path / "dev.json")
    assert len(train) + len(dev) == 6
    # stratified: both speakers appear in both splits
    assert {r["label"] for r in dev} == {"spk_a", "spk_b"}


def test_stratified_split_proportions():
    labels = ["x"] * 50 + ["y"] * 30
    tr, te = stratified_split(labels, test_size=0.1, seed=0)
    assert len(tr) + len(te) == 80 and not set(tr) & set(te)
    te_labels = [labels[i] for i in te]
    assert te_labels.count("x") == 5 and te_labels.count("y") == 3


def test_chunk_long_audio_joint_offsets():
    """Chunks cover the file; every chunk after the first starts
    time_length early so VAD frame windows abut
    (write_long_audio_manifest.py:60-102)."""
    tl, sd = 0.63, 4.0
    rows = chunk_long_audio("f.wav", 10.0, sd, tl)
    assert [round(r["offset"], 4) for r in rows] == [0.0, 4 - tl, 8 - tl]
    assert [round(r["duration"], 4) for r in rows] == [4.0, 4 + tl, 2 + tl]
    # end of each chunk reaches (offset+duration): last one reaches 10
    assert rows[-1]["offset"] + rows[-1]["duration"] == pytest.approx(10.0)
    # short file: single untouched line
    single = chunk_long_audio("f.wav", 3.0, sd, tl)
    assert single == [{"audio_filepath": "f.wav", "duration": 3.0,
                       "label": "infer", "text": "_", "offset": 0.0}]


def _speech_commands_tree(tmp_path):
    root = tmp_path / "sc"
    for word, n in (("yes", 4), ("no", 4), ("bird", 4)):
        for i in range(n):
            _wav(root / word / f"uid{word}{i}_nohash_0.wav", 0.2,
                 seed=i)
    _wav(root / "_background_noise_" / "pink.wav", 1.5, seed=9)
    val = [f"yes/uidyes0_nohash_0.wav\n", f"bird/uidbird0_nohash_0.wav\n"]
    test = [f"no/uidno1_nohash_0.wav\n", f"bird/uidbird1_nohash_0.wav\n"]
    (root / "validation_list.txt").write_text("".join(val))
    (root / "testing_list.txt").write_text("".join(test))
    return root


def test_speech_commands_all(tmp_path):
    root = _speech_commands_tree(tmp_path)
    dst = tmp_path / "out"
    counts = process_speech_commands(str(root), str(dst), class_split="all")
    train = _read_manifest(dst / "train_manifest.json")
    val = _read_manifest(dst / "validation_manifest.json")
    test = _read_manifest(dst / "test_manifest.json")
    assert counts == {"train": len(train), "validation": len(val),
                      "test": len(test)}
    assert len(val) == 2 and len(test) == 2 and len(train) == 8
    assert {r["command"] for r in train} == {"yes", "no", "bird"}
    # no noise folder rows
    assert all("_background_noise_" not in r["audio_filepath"]
               for r in train + val + test)


def test_speech_commands_sub_and_rebalance(tmp_path):
    root = _speech_commands_tree(tmp_path)
    dst = tmp_path / "out_sub"
    counts = process_speech_commands(str(root), str(dst),
                                     class_split="sub", rebalance=True)
    train = _read_manifest(dst / "train_manifest.json")
    labels = {}
    for r in train:
        labels[r["command"]] = labels.get(r["command"], 0) + 1
    # silence slices were generated and all train classes equalized
    assert "silence" in labels
    assert len(set(labels.values())) == 1
    assert "bird" not in labels and "unknown" in labels
    assert (root / "silence").is_dir()


def test_vad_data(tmp_path):
    sp = tmp_path / "speech"
    bg = tmp_path / "background"
    for i in range(5):
        _wav(sp / "w" / f"s{i}.wav", 0.4, seed=i)
    _wav(bg / "noise1.wav", 2.0, seed=7)
    out = tmp_path / "manifests"
    counts = process_vad_data(str(sp), str(bg), str(out), test_size=0.2,
                              val_size=0.2, seg_len=0.63)
    rows = _read_manifest(out / "balanced_background_training_manifest.json")
    # the 2 s noise file segments into 0.63 s windows
    assert rows and all(r["duration"] == pytest.approx(0.63) for r in rows)
    assert sum(counts[f"speech_{s}"] for s in
               ("training", "validation", "testing")) == 5


def test_cli_entry(tmp_path, capsys):
    p = _wav(tmp_path / "d" / "spk" / "a.wav")
    scp = tmp_path / "wav.scp"
    scp.write_text(p + "\n")
    out = tmp_path / "m.json"
    main(["scp", "--scp", str(scp), "--id",
          str(p.count("/") - 1), "--out", str(out)])
    assert "wrote 1 rows" in capsys.readouterr().out
    assert _read_manifest(out)[0]["label"] == "spk"
