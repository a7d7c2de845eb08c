"""Single-copy pcm16 batch ingest (DataLoader fast path, PERF.md round 3e).

The serving pipeline decodes each 16-bit mono WAV's data chunk directly into
its row of the padded batch buffer (audio.read_pcm16_into), replacing the
wave-module chunked decode + bucket_pad copy.  These tests pin: bit-equality
with the general path, the per-chunk fallback for entries the plan refuses,
and the RIFF scanner against non-canonical chunk layouts."""
import json
import os

import numpy as np
import pytest

from qasr_tpu.data.audio import (read_pcm16_into, wav_pcm16_info, write_wav)
from qasr_tpu.data.dataset import AudioToCharDataset, DataLoader


@pytest.fixture
def manifest(tmp_path):
    rng = np.random.default_rng(7)
    man = tmp_path / "manifest.json"
    with open(man, "w") as mf:
        for i in range(10):
            n = 16000 + i * 777
            p = tmp_path / f"u{i:02d}.wav"
            write_wav(str(p), (rng.normal(size=n) * 0.1).astype(np.float32))
            mf.write(json.dumps({"audio_filepath": str(p),
                                 "duration": n / 16000.0,
                                 "text": "a cat"}) + "\n")
    return str(man)


class _HidePlan:
    """Wrap a dataset so DataLoader can't see batch_plan (general path)."""

    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        return self._ds[i]


def _batches(dl):
    return [tuple(np.asarray(x) for x in b) for b in dl]


def test_fast_path_bit_equal_general(manifest):
    ds = AudioToCharDataset(manifest, labels=[" ", "a", "c", "t"],
                            normalize_transcripts=False, pcm16=True)
    fast = _batches(DataLoader(ds, batch_size=4, num_workers=4))
    slow = _batches(DataLoader(_HidePlan(ds), batch_size=4, num_workers=1))
    assert len(fast) == len(slow) > 0
    for bf, bs in zip(fast, slow):
        assert bf[0].dtype == np.int16
        for xf, xs in zip(bf, bs):
            np.testing.assert_array_equal(xf, xs)


def test_plan_refused_for_float_or_augmented(manifest):
    ds_float = AudioToCharDataset(manifest, labels=[" ", "a", "c", "t"],
                                  normalize_transcripts=False, pcm16=False)
    assert ds_float.batch_plan([0, 1]) is None
    ds_trim = AudioToCharDataset(manifest, labels=[" ", "a", "c", "t"],
                                 normalize_transcripts=False, pcm16=True,
                                 trim=True)
    assert ds_trim.batch_plan([0, 1]) is None


def test_plan_duration_cap_matches_getitem(manifest, tmp_path):
    # manifest entry with a duration shorter than the file: both paths
    # must truncate identically
    ds = AudioToCharDataset(manifest, labels=[" ", "a", "c", "t"],
                            normalize_transcripts=False, pcm16=True)
    e, _ = ds.items[3]
    man2 = tmp_path / "m2.json"
    with open(man2, "w") as mf:
        mf.write(json.dumps({"audio_filepath": e.audio_file,
                             "duration": 0.5, "text": "a"}) + "\n")
    ds2 = AudioToCharDataset(str(man2), labels=[" ", "a"],
                             normalize_transcripts=False, pcm16=True)
    plan = ds2.batch_plan([0])
    assert plan is not None and plan[0][2] == 8000
    sig, _ = ds2[0]
    assert len(sig) == 8000


def test_riff_scanner_extra_chunks(tmp_path):
    # LIST chunk before data (common in real corpora): scanner must skip it
    p = tmp_path / "list.wav"
    data = (np.arange(100, dtype=np.int16) * 3).tobytes()
    fmt = (1).to_bytes(2, "little") + (1).to_bytes(2, "little") + \
        (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little") + \
        (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    lst = b"INFOISFT" + b"qasr\x00"   # odd-sized payload -> pad byte
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"LIST" + len(lst).to_bytes(4, "little") + lst + b"\x00"
            + b"data" + len(data).to_bytes(4, "little") + data)
    with open(p, "wb") as f:
        f.write(b"RIFF" + len(body).to_bytes(4, "little") + body)
    info = wav_pcm16_info(str(p))
    assert info is not None
    n, sr, off = info
    assert n == 100 and sr == 16000
    out = np.empty((100,), np.int16)
    assert read_pcm16_into(str(p), off, out) == 100
    np.testing.assert_array_equal(out, np.arange(100, dtype=np.int16) * 3)


def test_riff_scanner_rejects_stereo_and_nonwav(tmp_path):
    p = tmp_path / "stereo.wav"
    import wave

    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(64, np.int16).tobytes())
    assert wav_pcm16_info(str(p)) is None
    q = tmp_path / "not.wav"
    q.write_bytes(b"junkjunkjunk")
    assert wav_pcm16_info(str(q)) is None
