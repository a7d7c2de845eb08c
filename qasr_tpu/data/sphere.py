"""NIST SPHERE (.sph) audio decode — pure Python.

The reference's dataset scripts shell out to external binaries for SPHERE
audio: `sox` for AN4 (`scripts/process_an4_data.py:63-66`) and `sph2pipe`
for HUB5 (`scripts/process_hub5_data.py:68-73`).  Neither binary is a given
on a TPU host image, so the uncompressed SPHERE variants those corpora use
(16-bit PCM for AN4, 8-bit mu-law for HUB5's hub5e_00) are decoded here
directly: a 1024-byte ASCII header of `name type value` lines, then raw
samples.  Shorten-compressed SPHERE ("embedded-shorten") is a proprietary
entropy coder and is rejected with a pointer to sph2pipe.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# mu-law expansion (G.711): 8-bit code -> int16-range float
_MULAW_TABLE: np.ndarray = None  # built lazily
_ALAW_TABLE: np.ndarray = None


def _mulaw_table() -> np.ndarray:
    global _MULAW_TABLE
    if _MULAW_TABLE is None:
        codes = np.arange(256, dtype=np.int32) ^ 0xFF  # stored inverted
        sign = codes >> 7
        exponent = (codes >> 4) & 0x07
        mantissa = codes & 0x0F
        magnitude = ((mantissa << 3) + 0x84 << exponent) - 0x84
        vals = np.where(sign, -magnitude, magnitude).astype(np.int16)
        _MULAW_TABLE = vals
    return _MULAW_TABLE


def _alaw_table() -> np.ndarray:
    global _ALAW_TABLE
    if _ALAW_TABLE is None:
        codes = np.arange(256, dtype=np.int32) ^ 0x55
        sign = codes & 0x80
        exponent = (codes >> 4) & 0x07
        mantissa = codes & 0x0F
        mag = np.where(exponent == 0, (mantissa << 4) + 8,
                       ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0))
        # G.711 A-law: after the 0x55 xor, a SET sign bit means positive
        vals = np.where(sign, mag, -mag).astype(np.int16)
        _ALAW_TABLE = vals
    return _ALAW_TABLE


def parse_sphere_header(raw: bytes) -> Dict[str, str]:
    """The SPHERE header: line 1 'NIST_1A', line 2 header size, then
    `name -<type> value` triples until 'end_head'."""
    text = raw.decode("ascii", errors="replace")
    lines = text.split("\n")
    if not lines or lines[0].strip() != "NIST_1A":
        raise ValueError("not a NIST SPHERE file (missing NIST_1A magic)")
    fields: Dict[str, str] = {}
    for line in lines[2:]:
        line = line.strip()
        if line == "end_head":
            break
        parts = line.split(None, 2)
        if len(parts) == 3:
            fields[parts[0]] = parts[2]
    return fields


def read_sphere(path: str) -> Tuple[np.ndarray, int]:
    """Decode a .sph file -> (int16 samples (T,) or (T, channels), rate)."""
    with open(path, "rb") as f:
        head = f.read(16)
        try:
            hdr_size = int(head.decode("ascii").split("\n")[1].strip())
        except (ValueError, IndexError, UnicodeDecodeError):
            raise ValueError(f"{path}: not a NIST SPHERE file")
        f.seek(0)
        fields = parse_sphere_header(f.read(hdr_size))
        f.seek(hdr_size)
        data = f.read()

    coding = fields.get("sample_coding", "pcm")
    if "shorten" in coding:
        raise NotImplementedError(
            f"{path}: shorten-compressed SPHERE; decompress with sph2pipe "
            f"out of band (scripts/process_hub5_data.py:68-73 does the same)")
    channels = int(fields.get("channel_count", 1))
    rate = int(fields.get("sample_rate", 16000))
    nbytes = int(fields.get("sample_n_bytes", 2))

    if coding.startswith("ulaw") or coding.startswith("mu-law") or (
            nbytes == 1 and "pcm" not in coding):
        x = _mulaw_table()[np.frombuffer(data, np.uint8)]
    elif coding.startswith("alaw"):
        x = _alaw_table()[np.frombuffer(data, np.uint8)]
    elif nbytes == 2:
        fmt = fields.get("sample_byte_format", "01")
        dt = "<i2" if fmt == "01" else ">i2"
        x = np.frombuffer(data, dt).astype(np.int16)
    elif nbytes == 1:  # 8-bit linear pcm (offset binary)
        x = ((np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"{path}: unsupported SPHERE coding "
                         f"{coding!r}/{nbytes}B")
    n = int(fields.get("sample_count", len(x) // channels))
    x = x[: n * channels]
    if channels > 1:
        x = x.reshape(-1, channels)
    return x, rate


def sphere_to_wav(sph_path: str, wav_path: str) -> Tuple[int, int]:
    """Convert .sph -> 16-bit PCM .wav (all channels kept).
    Returns (num_frames, sample_rate)."""
    import wave

    x, rate = read_sphere(sph_path)
    ch = 1 if x.ndim == 1 else x.shape[1]
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(x, dtype="<i2").tobytes())
    return (x.shape[0], rate)
