"""Waveform augmentations (host side, train-time).

Equivalent of the reference parts/perturb.py:84-828: Perturbation base +
speed / time-stretch / gain / impulse (RIR) / shift / noise / white-noise
perturbations, a probability-gated AudioAugmentor, and
process_augmentations(config).  The reference's numba phase vocoder
(numba_utils.py:14-88) is replaced by a numpy STFT phase vocoder; sox-based
transcode is gated on the sox binary being present.
"""
from __future__ import annotations

import math
import random
import shutil
import subprocess
import tempfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from qasr_tpu.data.audio import read_audio, resample


class Perturbation:
    def max_augmentation_length(self, length: float) -> float:
        return length

    def perturb(self, data: np.ndarray, sample_rate: int,
                rng: random.Random) -> np.ndarray:
        raise NotImplementedError


class SpeedPerturbation(Perturbation):
    """Resampling-based speed change (perturb.py:92-154)."""

    def __init__(self, sr=16000, resample_type="kaiser_best", min_speed_rate=0.9,
                 max_speed_rate=1.1, num_rates=5):
        self.sr = sr
        self.min_rate = min_speed_rate
        self.max_rate = max_speed_rate
        self.num_rates = num_rates
        if num_rates > 0:
            self.rates = np.linspace(min_speed_rate, max_speed_rate, num_rates)

    def max_augmentation_length(self, length):
        return length * self.max_rate

    def perturb(self, data, sample_rate, rng):
        if self.num_rates > 0:
            rate = float(self.rates[rng.randrange(self.num_rates)])
        else:
            rate = rng.uniform(self.min_rate, self.max_rate)
        if abs(rate - 1.0) < 1e-6:
            return data
        # playing the same samples at sr*rate == resampling from sr*rate to sr
        new_sr = int(round(sample_rate * rate))
        return resample(data, new_sr, sample_rate)


class TimeStretchPerturbation(Perturbation):
    """Pitch-preserving time stretch via an STFT phase vocoder
    (perturb.py:157-262; inner loop was numba, numba_utils.py:14-88)."""

    def __init__(self, min_speed_rate=0.9, max_speed_rate=1.1, num_rates=5,
                 n_fft=512):
        self.min_rate = min_speed_rate
        self.max_rate = max_speed_rate
        self.num_rates = num_rates
        self.n_fft = n_fft
        if num_rates > 0:
            self.rates = np.linspace(min_speed_rate, max_speed_rate, num_rates)

    def max_augmentation_length(self, length):
        return length * self.max_rate

    def perturb(self, data, sample_rate, rng):
        if self.num_rates > 0:
            rate = float(self.rates[rng.randrange(self.num_rates)])
        else:
            rate = rng.uniform(self.min_rate, self.max_rate)
        if abs(rate - 1.0) < 1e-6:
            return data
        return phase_vocoder_stretch(data, rate, self.n_fft)


def phase_vocoder_stretch(x: np.ndarray, rate: float, n_fft: int = 512) -> np.ndarray:
    hop = n_fft // 4
    window = np.hanning(n_fft).astype(np.float32)
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    stft = np.fft.rfft(xp[idx] * window, axis=1)  # (F, bins)
    steps = np.arange(0, n_frames - 1, rate)
    phi_advance = np.linspace(0, np.pi * hop, stft.shape[1])
    out = np.zeros((len(steps), stft.shape[1]), dtype=np.complex64)
    phase_acc = np.angle(stft[0])
    for i, step in enumerate(steps):
        lo = int(step)
        frac = step - lo
        mag = (1 - frac) * np.abs(stft[lo]) + frac * np.abs(stft[min(lo + 1, n_frames - 1)])
        out[i] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(stft[min(lo + 1, n_frames - 1)]) - np.angle(stft[lo]) - phi_advance
        dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc += phi_advance + dphase
    frames = np.fft.irfft(out, n=n_fft, axis=1).astype(np.float32) * window
    y = np.zeros(n_fft + hop * (len(steps) - 1), np.float32)
    wsum = np.zeros_like(y)
    for i in range(len(steps)):
        y[i * hop: i * hop + n_fft] += frames[i]
        wsum[i * hop: i * hop + n_fft] += window ** 2
    y = y / np.maximum(wsum, 1e-8)
    return y[pad:-pad] if len(y) > 2 * pad else y


class GainPerturbation(Perturbation):
    def __init__(self, min_gain_dbfs=-10, max_gain_dbfs=10):
        self.min_gain_dbfs = min_gain_dbfs
        self.max_gain_dbfs = max_gain_dbfs

    def perturb(self, data, sample_rate, rng):
        gain = rng.uniform(self.min_gain_dbfs, self.max_gain_dbfs)
        return data * (10.0 ** (gain / 20.0))


class ShiftPerturbation(Perturbation):
    def __init__(self, min_shift_ms=-5.0, max_shift_ms=5.0):
        self.min_shift_ms = min_shift_ms
        self.max_shift_ms = max_shift_ms

    def perturb(self, data, sample_rate, rng):
        shift_ms = rng.uniform(self.min_shift_ms, self.max_shift_ms)
        shift = int(sample_rate * shift_ms / 1000.0)
        if abs(shift) >= len(data):
            return data
        out = np.zeros_like(data)
        if shift > 0:
            out[shift:] = data[:-shift]
        elif shift < 0:
            out[:shift] = data[-shift:]
        else:
            out = data
        return out


class WhiteNoisePerturbation(Perturbation):
    def __init__(self, min_level=-90, max_level=-46):
        self.min_level = int(min_level)
        self.max_level = int(max_level)

    def perturb(self, data, sample_rate, rng):
        noise_level_db = rng.randint(self.min_level, self.max_level)
        noise_signal = (np.random.default_rng(rng.randrange(2**31))
                        .normal(size=len(data)).astype(np.float32)
                        * (10.0 ** (noise_level_db / 20.0)))
        return data + noise_signal


class NoisePerturbation(Perturbation):
    """Mix a random noise clip from a manifest at a random SNR
    (perturb.py:332-424)."""

    def __init__(self, manifest_path: str, min_snr_db=10, max_snr_db=50,
                 max_gain_db=300.0, audio_tar_filepaths=None, shuffle_n=100,
                 orig_sr=16000):
        from qasr_tpu.data.dataset import read_manifest

        self.entries = read_manifest(manifest_path)
        self.min_snr_db = min_snr_db
        self.max_snr_db = max_snr_db
        self.max_gain_db = max_gain_db
        self.orig_sr = orig_sr

    def perturb(self, data, sample_rate, rng):
        e = self.entries[rng.randrange(len(self.entries))]
        noise = read_audio(e.audio_file, sample_rate)
        snr_db = rng.uniform(self.min_snr_db, self.max_snr_db)
        data_rms = np.sqrt(np.mean(data**2) + 1e-12)
        noise_rms = np.sqrt(np.mean(noise**2) + 1e-12)
        gain_db = min(20 * math.log10(data_rms / noise_rms) - snr_db,
                      self.max_gain_db)
        noise = noise * (10.0 ** (gain_db / 20.0))
        if len(noise) >= len(data):
            start = rng.randrange(max(len(noise) - len(data), 1))
            return data + noise[start: start + len(data)]
        start = rng.randrange(max(len(data) - len(noise), 1))
        out = data.copy()
        out[start: start + len(noise)] += noise
        return out


class ImpulsePerturbation(Perturbation):
    """Convolve with a room impulse response from a manifest
    (perturb.py:275-308)."""

    def __init__(self, manifest_path: str, audio_tar_filepaths=None,
                 shuffle_n=100, shift_impulse=False):
        from qasr_tpu.data.dataset import read_manifest

        self.entries = read_manifest(manifest_path)
        self.shift_impulse = shift_impulse

    def perturb(self, data, sample_rate, rng):
        from scipy.signal import fftconvolve

        e = self.entries[rng.randrange(len(self.entries))]
        rir = read_audio(e.audio_file, sample_rate)
        if not self.shift_impulse:
            out = fftconvolve(data, rir)[: len(data)]
        else:
            peak = int(np.argmax(np.abs(rir)))
            out = fftconvolve(data, rir)[peak: peak + len(data)]
        m = np.max(np.abs(out))
        if m > 0:
            out = out * (np.max(np.abs(data)) / m)
        return out.astype(np.float32)


class TranscodePerturbation(Perturbation):
    """Codec round-trip via sox (perturb.py:558-593); no-op when sox is
    unavailable in the image."""

    def __init__(self, rng=None):
        self._sox = shutil.which("sox")

    def perturb(self, data, sample_rate, rng):
        if not self._sox:
            return data
        from qasr_tpu.data.audio import write_wav

        codec = rng.choice(["g711", "amr-nb"])
        with tempfile.TemporaryDirectory() as td:
            src = f"{td}/in.wav"
            mid = f"{td}/mid.{ 'wav' if codec == 'g711' else 'amr-nb' }"
            dst = f"{td}/out.wav"
            write_wav(src, data, sample_rate)
            if codec == "g711":
                subprocess.run([self._sox, src, "-r", "8000", "-c", "1",
                                "-e", "a-law", mid], check=True)
            else:
                subprocess.run([self._sox, src, "-r", "8000", "-c", "1", mid],
                               check=True)
            subprocess.run([self._sox, mid, "-r", str(sample_rate), dst],
                           check=True)
            return read_audio(dst, sample_rate)


perturbation_types = {
    "speed": SpeedPerturbation,
    "time_stretch": TimeStretchPerturbation,
    "gain": GainPerturbation,
    "impulse": ImpulsePerturbation,
    "shift": ShiftPerturbation,
    "noise": NoisePerturbation,
    "white_noise": WhiteNoisePerturbation,
    "transcode_aug": TranscodePerturbation,
}


def register_perturbation(name: str, perturbation) -> None:
    if name in perturbation_types:
        raise KeyError(f"Perturbation with the name {name} exists.")
    perturbation_types[name] = perturbation


class AudioAugmentor:
    """Probability-gated chain (perturb.py:618-705)."""

    def __init__(self, perturbations: Optional[List[Tuple[float, Perturbation]]] = None,
                 rng: Optional[random.Random] = None):
        self._pipeline = perturbations or []
        self._rng = rng or random.Random()

    def perturb(self, data: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        for prob, p in self._pipeline:
            if self._rng.random() <= prob:
                data = p.perturb(data, sample_rate, self._rng)
        return data

    def max_augmentation_length(self, length: float) -> float:
        for _, p in self._pipeline:
            length = p.max_augmentation_length(length)
        return length

    @classmethod
    def from_config(cls, config: Dict) -> "AudioAugmentor":
        ptbs = []
        for name, kwargs in config.items():
            if name not in perturbation_types:
                raise KeyError(f"Invalid perturbation name: {name}")
            kwargs = dict(kwargs)
            prob = kwargs.pop("prob", 1.0)
            ptbs.append((prob, perturbation_types[name](**kwargs)))
        return cls(ptbs)


def process_augmentations(augmenter: Optional[Dict]) -> Optional[AudioAugmentor]:
    """reference perturb.py:706-765 entry point."""
    if augmenter is None:
        return None
    return AudioAugmentor.from_config(augmenter)
