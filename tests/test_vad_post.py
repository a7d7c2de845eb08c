"""VAD post-processing parity vs the reference's own scripts.

The reference implementations (scripts/vad_overlap_posterior.py) are loaded
via importlib and run on the same inputs; our vectorized versions must match
their file outputs exactly (modulo the documented final-segment labeling fix,
avoided here by ending sequences without a last-element flip).
"""
import importlib.util
import json
import os

import numpy as np
import pytest

from qasr_tpu.decode.vad import (
    frames_to_segments,
    read_segment_table,
    segments_to_manifest,
    smooth_overlap,
    write_segment_table,
)

REF = "/root/reference/scripts/vad_overlap_posterior.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_vad", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF):
        pytest.skip("reference scripts unavailable")
    return _load_ref()


@pytest.mark.parametrize("method", ["mean", "median"])
@pytest.mark.parametrize("overlap,seg_len,shift_len",
                         [(0.875, 0.63, 0.01), (0.5, 0.4, 0.02)])
def test_smooth_overlap_matches_reference(ref, tmp_path, method, overlap,
                                          seg_len, shift_len):
    rng = np.random.default_rng(0)
    frame = rng.uniform(size=200)
    fp = tmp_path / "utt.frame"
    np.savetxt(fp, frame, delimiter="\n")
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    ref.gen_overlap_seq(str(fp), {
        "method": method, "overlap": overlap, "seg_len": seg_len,
        "shift_len": shift_len, "out_dir": str(out_dir)})
    expected = np.loadtxt(out_dir / f"utt.{method}")
    got = smooth_overlap(frame, method=method, overlap=overlap,
                         seg_len=seg_len, shift_len=shift_len)
    np.testing.assert_array_equal(got, expected)


def test_seg_table_matches_reference(ref, tmp_path):
    rng = np.random.default_rng(1)
    # ensure the last two elements share a state (the reference labels the
    # final segment off the second-to-last element; see decode/vad.py)
    seq = rng.uniform(size=300)
    seq[-1] = seq[-2]
    fp = tmp_path / "utt.median"
    np.savetxt(fp, np.round(seq, 4), delimiter="\n")
    out_dir = tmp_path / "tables"
    out_dir.mkdir()
    ref.gen_seg_table(str(fp), {"threshold": 0.5, "shift_len": 0.01,
                                "out_dir": str(out_dir)})
    expected = read_segment_table(str(out_dir / "utt.txt"))
    got = frames_to_segments(np.round(seq, 4), threshold=0.5, shift_len=0.01)
    assert len(got) == len(expected)
    for (s1, e1, st1), (s2, e2, st2) in zip(got, expected):
        assert st1 == st2
        assert abs(s1 - s2) < 1e-9 and abs(e1 - e2) < 1e-9


def test_final_segment_label_uses_last_element():
    # flip at the very last element: our label follows the data (the
    # reference's would not — documented deviation)
    seq = np.asarray([0.9, 0.9, 0.1])
    segs = frames_to_segments(seq, threshold=0.5, shift_len=0.01)
    assert segs[-1][2] == "non-speech"
    assert segs[0][2] == "speech"
    # single element does not crash (the reference raises NameError)
    one = frames_to_segments(np.asarray([0.7]), threshold=0.5, shift_len=0.01)
    assert one == [(0.0, 0.01, "speech")]


def test_segments_to_manifest(tmp_path):
    vad_dir = tmp_path / "tables"
    vad_dir.mkdir()
    write_segment_table([(0.0, 1.5, "speech"), (1.5, 2.0, "non-speech"),
                         (2.0, 3.25, "speech")], str(vad_dir / "utt1.txt"))
    mf = str(tmp_path / "diar.json")
    segments_to_manifest(str(vad_dir), "/data/wavs", mf)
    lines = [json.loads(l) for l in open(mf)]
    assert len(lines) == 2  # speech segments only (vad_to_manifest.py:42-47)
    assert lines[0] == {"audio_filepath": "/data/wavs/utt1.wav", "offset": 0.0,
                        "duration": 1.5, "label": "UNK"}
    assert lines[1]["offset"] == 2.0 and abs(lines[1]["duration"] - 1.25) < 1e-9


def test_vad_post_cli_end_to_end(tmp_path):
    from qasr_tpu.cli.vad_post import main

    rng = np.random.default_rng(2)
    frames = tmp_path / "frames"
    frames.mkdir()
    np.savetxt(frames / "a.frame", rng.uniform(size=150), delimiter="\n")
    np.savetxt(frames / "b.frame", rng.uniform(size=90), delimiter="\n")
    ov = tmp_path / "ov"
    tb = tmp_path / "tb"
    mf = tmp_path / "m.json"
    main(["--gen_overlap_seq", "--gen_seg_table", "--to_manifest",
          "--frame_folder", str(frames), "--method", "median",
          "--overlap_out_dir", str(ov), "--table_out_dir", str(tb),
          "--threshold", "0.6", "--audio_directory", "/wavs",
          "--manifest_file", str(mf)])
    assert sorted(os.listdir(ov)) == ["a.median", "b.median"]
    assert sorted(os.listdir(tb)) == ["a.txt", "b.txt"]
    lines = [json.loads(l) for l in open(mf)]
    assert lines and all(l["label"] == "UNK" for l in lines)
    assert {os.path.basename(l["audio_filepath"]) for l in lines} <= {
        "a.wav", "b.wav"}
