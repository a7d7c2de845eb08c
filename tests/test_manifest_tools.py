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


# ---------------------------------------------------------------------------
# corpus getters: an4 / hub5 / commonvoice / rir (+ NIST SPHERE decode)
# ---------------------------------------------------------------------------

def _sphere_bytes(samples, rate=16000, coding="pcm", channels=1):
    """Build a NIST SPHERE file body (header format per the SPHERE spec)."""
    x = np.asarray(samples)
    if coding == "pcm":
        data = x.astype("<i2").tobytes()
        nbytes, fmt = 2, "sample_byte_format -s2 01\n"
    elif coding == "ulaw":
        import audioop
        data = audioop.lin2ulaw(x.astype("<i2").tobytes(), 2)
        nbytes, fmt = 1, ""
    else:
        raise ValueError(coding)
    n = x.shape[0] if x.ndim == 1 else x.shape[0]
    head = ("NIST_1A\n   1024\n"
            f"channel_count -i {channels}\n"
            f"sample_count -i {n}\n"
            f"sample_rate -i {rate}\n"
            f"sample_n_bytes -i {nbytes}\n"
            f"sample_coding -s{len(coding)} {coding}\n"
            f"{fmt}end_head\n")
    return head.encode("ascii").ljust(1024, b" ") + data


def test_sphere_pcm_roundtrip(tmp_path):
    from qasr_tpu.data.sphere import read_sphere, sphere_to_wav
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(800) * 3000).astype(np.int16)
    p = tmp_path / "a.sph"
    p.write_bytes(_sphere_bytes(x))
    got, sr = read_sphere(str(p))
    assert sr == 16000
    np.testing.assert_array_equal(got, x)
    wav = tmp_path / "a.wav"
    sphere_to_wav(str(p), str(wav))
    from qasr_tpu.data.audio import read_wav
    y, sr2 = read_wav(str(wav))
    np.testing.assert_allclose(y * 32768.0, x, atol=0.5)


def test_sphere_mulaw_matches_audioop(tmp_path):
    """mu-law expansion table vs the stdlib G.711 implementation."""
    import audioop
    from qasr_tpu.data.sphere import read_sphere
    codes = np.arange(256, dtype=np.uint8)
    want = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2")
    head = ("NIST_1A\n   1024\n"
            "channel_count -i 1\nsample_count -i 256\nsample_rate -i 8000\n"
            "sample_n_bytes -i 1\nsample_coding -s4 ulaw\nend_head\n")
    p = tmp_path / "u.sph"
    p.write_bytes(head.encode().ljust(1024, b" ") + codes.tobytes())
    got, sr = read_sphere(str(p))
    assert sr == 8000
    np.testing.assert_array_equal(got, want)


def test_sphere_alaw_matches_audioop(tmp_path):
    import audioop
    from qasr_tpu.data.sphere import _alaw_table
    codes = np.arange(256, dtype=np.uint8)
    want = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2")
    np.testing.assert_array_equal(_alaw_table()[codes], want)


def test_sphere_rejects_shorten(tmp_path):
    head = ("NIST_1A\n   1024\n"
            "sample_coding -s20 pcm,embedded-shorten\nend_head\n")
    p = tmp_path / "s.sph"
    p.write_bytes(head.encode().ljust(1024, b" ") + b"\x00\x00")
    from qasr_tpu.data.sphere import read_sphere
    with pytest.raises(NotImplementedError, match="sph2pipe"):
        read_sphere(str(p))


def test_process_an4(tmp_path):
    from qasr_tpu.cli.manifest_tools import process_an4
    root = tmp_path
    rng = np.random.default_rng(1)
    # layout per process_an4_data.py: wav/an4_clstk/<speaker>/<fileID>.sph
    for split, wavdir, fid in (("train", "an4_clstk", "cen4-fash-b"),
                               ("test", "an4test_clstk", "cen5-mblw-b")):
        spk = fid[fid.find("-") + 1: fid.rfind("-")]
        d = root / "an4" / "wav" / wavdir / spk
        d.mkdir(parents=True)
        x = (rng.standard_normal(1600) * 2000).astype(np.int16)
        (d / f"{fid}.sph").write_bytes(_sphere_bytes(x))
        etc = root / "an4" / "etc"
        etc.mkdir(parents=True, exist_ok=True)
        (etc / f"an4_{split}.transcription").write_text(
            f"<s> HELLO WORLD </s> ({fid})\n")
    counts = process_an4(str(root))
    assert counts == {"converted_sph": 2, "train": 1, "test": 1}
    rows = _read_manifest(root / "an4" / "train_manifest.json")
    assert rows[0]["text"] == "hello world"
    assert rows[0]["duration"] == pytest.approx(0.1)
    assert os.path.exists(rows[0]["audio_filepath"])


def test_process_hub5(tmp_path):
    from qasr_tpu.cli.manifest_tools import process_hub5
    rng = np.random.default_rng(2)
    sr = 8000
    # one 2-channel ulaw sphere file, 8 s
    stereo = (rng.standard_normal((8 * sr, 2)) * 2000).astype(np.int16)
    sph_dir = tmp_path / "hub5e_00" / "english"
    sph_dir.mkdir(parents=True)
    (sph_dir / "en_0001.sph").write_bytes(
        _sphere_bytes(stereo.reshape(-1), rate=sr, coding="ulaw", channels=2))
    stm_dir = tmp_path / "2000_hub5_eng_eval_tr" / "reference"
    stm_dir.mkdir(parents=True)
    (stm_dir / "hub5e00.english.000405.stm").write_text(
        ";; comment line\n"
        "en_0001 A spk1 0.50 2.00 <o,f0,male> HELLO (%HESITATION) THERE\n"
        "en_0001 A spk1 2.50 4.20 <o,f0,male> GENERAL KENOBI\n"
        "en_0001 B spk2 0.00 1.00 <o,f0,fem> IGNORE_TIME_SEGMENT_IN_SCORING\n")
    dest = tmp_path / "dest"
    counts = process_hub5(str(tmp_path), str(dest), min_slice_duration=3.0)
    assert counts["converted_sph"] == 1
    assert counts["segments"] == 1
    rows = _read_manifest(dest / "manifest_hub5.json")
    assert rows[0]["text"] == "hello uh there general kenobi"
    assert rows[0]["duration"] == pytest.approx(3.2)
    from qasr_tpu.data.audio import read_wav
    y, sr2 = read_wav(rows[0]["audio_filepath"])
    assert sr2 == sr and len(y) == int(1.5 * sr) + int(1.7 * sr)


def test_commonvoice_manifest(tmp_path):
    from qasr_tpu.cli.manifest_tools import commonvoice_manifest
    clips = tmp_path / "cv" / "clips"
    clips.mkdir(parents=True)
    rng = np.random.default_rng(3)
    # pre-converted tree: tsv says .mp3, a .wav sibling exists (48 kHz)
    write_wav(str(clips / "utt1.wav"),
              rng.standard_normal(48000).astype(np.float32) * 0.05, 48000)
    tsv = tmp_path / "cv" / "train.tsv"
    tsv.write_text("client_id\tpath\tsentence\n"
                   "c1\tutt1.mp3\tHello There \n")
    out = tmp_path / "manifest.json"
    n = commonvoice_manifest(str(tsv), str(tmp_path / "data"), str(out),
                             sample_rate=16000)
    assert n == 1
    row = _read_manifest(out)[0]
    assert row["text"] == "hello there"
    assert row["duration"] == pytest.approx(1.0)
    from qasr_tpu.data.audio import read_wav
    y, sr = read_wav(row["audio_filepath"])
    assert sr == 16000 and len(y) == 16000


def test_commonvoice_rejects_mp3(tmp_path):
    from qasr_tpu.cli.manifest_tools import commonvoice_manifest
    clips = tmp_path / "clips"
    clips.mkdir()
    (clips / "u.mp3").write_bytes(b"\xff\xfb junk")
    tsv = tmp_path / "t.tsv"
    tsv.write_text("path\tsentence\nu.mp3\thi\n")
    with pytest.raises(NotImplementedError, match="mp3"):
        commonvoice_manifest(str(tsv), str(tmp_path / "d"),
                             str(tmp_path / "m.json"))


def test_process_rir(tmp_path):
    import wave
    from qasr_tpu.cli.manifest_tools import process_rir
    rng = np.random.default_rng(4)
    rir_dir = tmp_path / "RIRS_NOISES" / "real_rirs_isotropic_noises"
    rir_dir.mkdir(parents=True)
    # mono rir
    write_wav(str(rir_dir / "mono_rir.wav"),
              rng.standard_normal(1600) * 0.01, 16000)
    # stereo rir (written raw)
    st = (rng.standard_normal((800, 2)) * 500).astype("<i2")
    with wave.open(str(rir_dir / "stereo_rir.wav"), "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(st.tobytes())
    (rir_dir / "rir_list").write_text(
        "1 x x x RIRS_NOISES/real_rirs_isotropic_noises/mono_rir.wav\n"
        "2 x x x RIRS_NOISES/real_rirs_isotropic_noises/stereo_rir.wav\n")
    sim = tmp_path / "RIRS_NOISES" / "simulated_rirs" / "smallroom"
    sim.mkdir(parents=True)
    write_wav(str(sim / "sim1.wav"), rng.standard_normal(800) * 0.01, 16000)
    dest = tmp_path / "processed"
    counts = process_rir(str(tmp_path), str(dest))
    assert counts == {"channel_splits": 2, "rirs": 4}
    names = {os.path.basename(r["audio_filepath"])
             for r in _read_manifest(dest / "rir.json")}
    assert names == {"mono_rir.wav", "stereo_rir-1.wav", "stereo_rir-2.wav",
                     "sim1.wav"}
    # per-channel split preserves samples
    from qasr_tpu.data.audio import read_wav
    y1, _ = read_wav(str(dest / "real_rirs" / "stereo_rir-1.wav"))
    np.testing.assert_allclose(y1 * 32768.0, st[:, 0], atol=0.5)


def test_corpus_cli_entries(tmp_path, capsys):
    # an4 through the argparse surface
    rng = np.random.default_rng(5)
    d = tmp_path / "an4" / "wav" / "an4_clstk" / "fash"
    d.mkdir(parents=True)
    x = (rng.standard_normal(800) * 1000).astype(np.int16)
    (d / "cen1-fash-b.sph").write_bytes(_sphere_bytes(x))
    d2 = tmp_path / "an4" / "wav" / "an4test_clstk" / "mblw"
    d2.mkdir(parents=True)
    (d2 / "cen2-mblw-b.sph").write_bytes(_sphere_bytes(x))
    etc = tmp_path / "an4" / "etc"
    etc.mkdir()
    (etc / "an4_train.transcription").write_text("<s> ONE </s> (cen1-fash-b)\n")
    (etc / "an4_test.transcription").write_text("<s> TWO </s> (cen2-mblw-b)\n")
    main(["an4", "--data_root", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    assert out["train"] == 1 and out["test"] == 1


def test_hub5_transcript_fix_applies(tmp_path):
    """The known-bad STM transcript (reference process_hub5_data.py:55) is
    replaced.  The reference keys its fix dict with the UPPERCASE uid but
    builds uids from the lowercased line, so its own fix is dead code;
    here the lowercase key actually matches."""
    from qasr_tpu.cli.manifest_tools import _hub5_parse_stm

    stm = tmp_path / "x.stm"
    stm.write_text(
        "en_4622 B en_4622_B 120.79 121.87 <o,f0,male> SOME WRONG WORDS\n")
    utts = _hub5_parse_stm(str(stm))
    assert utts[0]["transcript"] == "kind of weird but"
