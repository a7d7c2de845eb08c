"""Audio I/O (host side).

Equivalent of the reference AudioSegment (parts/segment.py:43-223) minus the
soundfile/librosa dependencies: WAV via stdlib `wave`, resampling via
scipy.signal.resample_poly, int->float normalization by 2**(bits-1).
FLAC/OGG decode is not available in this image; dataset prep converts to WAV
(the reference's own LibriSpeech script shells out to sox for the same
reason, scripts/get_librispeech_data.py:33).
"""
from __future__ import annotations

import math
import wave
from typing import Optional, Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (float32 mono samples in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def read_wav_pcm16(path: str) -> Tuple[np.ndarray, int]:
    """Returns (int16 mono samples, sample_rate) WITHOUT the float decode.

    For 16-bit mono wavs (the ASR-corpus norm) this is a frombuffer view —
    no astype pass, no divide — so the host pipeline moves bytes instead of
    converting samples; the device applies the exact 2**-15 scaling inside
    the jitted frontend (models/ctc_model.py::_pcm_f32).  Other widths /
    multichannel fall back through the float decode and re-grid (exact for
    the values a 16-bit writer can produce)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2 and ch == 1:
        return np.frombuffer(raw, dtype="<i2"), sr
    x, sr = read_wav(path)
    return float_to_pcm16(x), sr


def float_to_pcm16(x: np.ndarray) -> np.ndarray:
    """Exact inverse of the /32768 decode for int16-representable floats;
    rounds (ties to even) and clips otherwise."""
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    from scipy.signal import resample_poly

    g = math.gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def trim_silence(x: np.ndarray, top_db: float = 60.0, frame: int = 2048,
                 hop: int = 512) -> np.ndarray:
    """librosa.effects.trim-style energy trim (segment.py:118 trim=True)."""
    if len(x) < frame:
        return x
    n = 1 + (len(x) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(x[idx] ** 2, axis=1))
    ref = rms.max()
    if ref <= 0:
        return x
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    keep = np.nonzero(db > -top_db)[0]
    if len(keep) == 0:
        return x
    start = keep[0] * hop
    end = min(len(x), keep[-1] * hop + frame)
    return x[start:end]


def read_audio(path: str, target_sr: int = 16000, offset: float = 0.0,
               duration: Optional[float] = None, trim: bool = False) -> np.ndarray:
    """AudioSegment.from_file equivalent (segment.py:112-155)."""
    x, sr = read_wav(path)
    if offset:
        x = x[int(offset * sr):]
    if duration:
        x = x[: int(duration * sr)]
    x = resample(x, sr, target_sr)
    if trim:
        x = trim_silence(x)
    return x


def read_audio_pcm16(path: str, target_sr: int = 16000, offset: float = 0.0,
                     duration: Optional[float] = None,
                     trim: bool = False) -> np.ndarray:
    """read_audio that keeps samples as int16 PCM (device-side scaling
    path).  16-bit mono at the target rate is zero-copy; resample/trim
    force a float round-trip and an exact re-grid."""
    x16, sr = read_wav_pcm16(path)
    if offset:
        x16 = x16[int(offset * sr):]
    if duration:
        x16 = x16[: int(duration * sr)]
    if sr == target_sr and not trim:
        return x16
    x = x16.astype(np.float32) / 32768.0
    x = resample(x, sr, target_sr)
    if trim:
        x = trim_silence(x)
    return float_to_pcm16(x)


def wav_pcm16_info(path: str) -> Optional[Tuple[int, int, int]]:
    """Minimal RIFF scan for the serving fast path: (n_frames, sample_rate,
    data_offset) when `path` is a plain 16-bit mono PCM WAV, else None (the
    caller falls back to the general `wave`-module decoder).  One small read
    per file — the batch decoder then `readinto`s the data chunk straight
    into its row of the padded batch buffer (single copy, page cache ->
    batch; the reference gets the same effect from DALI's device decode,
    data/audio_to_text_dali.py:74-447)."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
            if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
                return None
            fmt = None
            while True:
                ch = f.read(8)
                if len(ch) < 8:
                    return None
                size = int.from_bytes(ch[4:8], "little")
                if ch[:4] == b"fmt ":
                    fmt = f.read(size + (size & 1))
                elif ch[:4] == b"data":
                    if fmt is None or len(fmt) < 16:
                        return None
                    if (int.from_bytes(fmt[0:2], "little") != 1      # PCM
                            or int.from_bytes(fmt[2:4], "little") != 1  # mono
                            or int.from_bytes(fmt[14:16], "little") != 16):
                        return None
                    return size // 2, int.from_bytes(fmt[4:8], "little"), f.tell()
                else:
                    f.seek(size + (size & 1), 1)
    except OSError:
        return None


def read_pcm16_into(path: str, data_offset: int, out: np.ndarray) -> int:
    """Read len(out) int16 frames at data_offset directly into `out` (a
    contiguous int16 view, e.g. a batch-buffer row).  Returns frames read.
    buffering=0 so the kernel copies page cache -> out with no BufferedReader
    staging pass; releases the GIL, so batch rows decode in parallel under a
    thread pool."""
    mv = memoryview(out).cast("B")
    with open(path, "rb", buffering=0) as f:
        f.seek(data_offset)
        # raw reads may legally return short (NFS/FUSE, EINTR): loop until
        # the row is full or EOF, else real audio tail becomes silence
        got = 0
        while got < len(mv):
            n = f.readinto(mv[got:])
            if not n:
                break
            got += n
    return got // 2


def write_wav(path: str, x: np.ndarray, sr: int = 16000) -> None:
    x16 = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x16.tobytes())
