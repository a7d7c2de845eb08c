"""Log-mel spectrogram frontend (TPU-native).

Functional equivalent of the reference FilterbankFeatures
(`/root/reference/nemo/collections/asr/parts/features.py:192-397`):
dither -> preemphasis 0.97 -> STFT (hann 320/160, n_fft 512, center/reflect)
-> |.|**2 -> mel(64, slaney) -> log(x + 2**-24) -> per-feature normalization
over valid frames -> zero-mask the padded tail -> pad T to a multiple of 16.

TPU-first choices:
  * channels-last output (B, T, n_mels) — lanes on the feature axis;
  * static shapes: frame count is derived from the (static) padded sample
    length; true lengths are threaded as a (B,) vector and used via masks;
  * the whole frontend is jit-compatible and differentiable-free (inference);
  * an optional matmul-DFT path keeps the STFT on the MXU (see stft_matmul).

The mel filterbank follows librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)
with htk=False, norm='slaney' (what the reference calls at features.py:281-283)
implemented from the published Slaney formula — librosa is not a dependency.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

LOG_GUARD = 2.0 ** -24
STD_GUARD = 1e-5  # reference CONSTANT (features.py:50,66)


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney area normalization)
# ---------------------------------------------------------------------------


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    safe = np.maximum(f, 1e-10)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels)


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int = 16000,
    n_fft: int = 512,
    n_mels: int = 64,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """(n_freqs, n_mels) triangular slaney-normalized filterbank (transposed
    relative to librosa so the mel projection is a channels-last matmul)."""
    fmax = fmax or sample_rate / 2.0
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def make_window(kind: str, win_length: int, n_fft: int) -> np.ndarray:
    """torch.{hann,hamming,blackman,bartlett}_window(win_length,
    periodic=False), zero-padded centered to n_fft (torch.stft pads a short
    window this way).  Mirrors the reference's torch_windows dict
    (features.py:252-258).  'none' follows torch.stft(window=None)
    semantics — a rectangular window of win_length — which is what the
    reference *configures* for 'none' (its call site would actually crash on
    `self.window.to(...)` with a None buffer, features.py:261-269; we accept
    the config and do the documented thing)."""
    n = np.arange(win_length, dtype=np.float64)
    theta = 2.0 * np.pi * n / (win_length - 1)
    if kind == "hann":
        w = 0.5 - 0.5 * np.cos(theta)
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(theta)
    elif kind == "blackman":
        w = 0.42 - 0.5 * np.cos(theta) + 0.08 * np.cos(2.0 * theta)
    elif kind == "bartlett":
        w = 1.0 - np.abs(2.0 * n / (win_length - 1) - 1.0)
    elif kind in ("none", None, ""):
        w = np.ones(win_length, dtype=np.float64)
    else:
        raise ValueError(f"unsupported window: {kind!r}")
    pad_l = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[pad_l : pad_l + win_length] = w.astype(np.float32)
    return out


def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    return make_window("hann", win_length, n_fft)


def frame_signal(x: Array, n_fft: int, hop: int, center: bool) -> Array:
    """(B, L) -> (B, n_frames, n_fft) frames, torch.stft-compatible.

    Framing is expressed as a reshape into hop-length rows plus a few strided
    row slices concatenated (frame i = rows i..i+ceil(n_fft/hop)-1, cut to
    n_fft) — measured 3.3x faster than an index gather on v5e and
    bit-identical.
    """
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    length = x.shape[1]
    n_frames = 1 + (length - n_fft) // hop
    rows_needed = -(-n_fft // hop)
    total_rows = n_frames + rows_needed
    pad = total_rows * hop - length
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    rows = x.reshape(x.shape[0], -1, hop)
    parts = [rows[:, i : i + n_frames] for i in range(rows_needed)]
    return jnp.concatenate(parts, axis=2)[:, :, :n_fft]


def stft_power(x: Array, window: Array, n_fft: int, hop: int, center: bool = True) -> Array:
    """|STFT|^2 -> (B, n_frames, n_fft//2 + 1). FFT path (exact)."""
    frames = frame_signal(x, n_fft, hop, center) * window
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    n_freqs = 1 + n_fft // 2
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def stft_power_matmul(x: Array, window: Array, cos_m: Array, sin_m: Array,
                      n_fft: int, hop: int, center: bool = True) -> Array:
    """|STFT|^2 via two real matmuls — rides the MXU instead of the FFT op.

    Useful fused with the mel projection; numerically ~1e-5 of the FFT path.
    """
    frames = frame_signal(x, n_fft, hop, center) * window
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_m, precision=hi)
    im = jnp.matmul(frames, sin_m, precision=hi)
    return re * re + im * im


# ---------------------------------------------------------------------------
# Full frontend
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Mirrors AudioToMelSpectrogramPreprocessor's YAML schema
    (reference modules/audio_preprocessing.py:90-254, conf/quartznet_15x5.yaml:29-40)."""

    sample_rate: int = 16000
    window_size: float = 0.02     # seconds -> 320 samples
    window_stride: float = 0.01   # seconds -> 160 samples
    window: str = "hann"
    normalize: str = "per_feature"
    n_fft: int = 512
    preemph: float = 0.97
    features: int = 64            # n_mels
    lowfreq: float = 0.0
    highfreq: Optional[float] = None
    log: bool = True
    log_zero_guard_type: str = "add"
    log_zero_guard_value: float = LOG_GUARD
    dither: float = 1e-5
    pad_to: int = 16
    pad_value: float = 0.0
    mag_power: float = 2.0
    frame_splicing: int = 1
    max_duration: float = 16.7    # pad_to='max' target (features.py:287-290)
    stft_matmul: bool = False     # MXU DFT path instead of jnp.fft

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)


class MelFrontend:
    """Precomputes constants; __call__ is pure and jit-friendly.

    Reference call stack: AudioToMelSpectrogramPreprocessor.forward ->
    FilterbankFeatures.forward (features.py:334-397).
    """

    def __init__(self, cfg: FeatureConfig):
        self.cfg = cfg
        # kept as HOST numpy on purpose: a jit that closes over these then
        # embeds them as HLO literals.  As pre-committed device buffers
        # (jnp.asarray here) they become captured-constant buffers in the
        # executable, which permanently degrades this process's host->device
        # transfer bandwidth ~70x under the axon TPU tunnel (PERF.md round
        # 3d bisect: any executed program holding a captured device buffer
        # — even a scalar — triggers it; numpy-literal closures don't).
        v = cfg.log_zero_guard_value
        if isinstance(v, str):  # "tiny"/"eps" (reference features.py:312-325)
            if v == "tiny":
                v = float(np.finfo(np.float32).tiny)
            elif v == "eps":
                v = float(np.finfo(np.float32).eps)
            else:
                raise ValueError(
                    f"log_zero_guard_value must be a number, 'tiny' or "
                    f"'eps'; got {v!r}")
        self.log_guard = float(v)
        self.window = make_window(cfg.window, cfg.win_length, cfg.n_fft)
        self.fb = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.features, cfg.lowfreq, cfg.highfreq)
        if cfg.stft_matmul:
            self.cos_m, self.sin_m = dft_matrices(cfg.n_fft)
        if cfg.pad_to == "max":
            # max_length = ceil(max_duration*sr / hop), UNALIGNED — the
            # reference's numeric-pad_to rounding (features.py:287-290)
            # only runs for numeric pad_to; with pad_to='max' max_pad=0
            # and the frame count is used as-is
            self.max_length = int(math.ceil(
                cfg.max_duration * cfg.sample_rate / cfg.hop_length))

    def out_length(self, lengths: Array) -> Array:
        # ceil(len / hop)  (features.py:327-328)
        return jnp.ceil(lengths.astype(jnp.float32) / self.cfg.hop_length).astype(jnp.int32)

    def __call__(self, x: Array, lengths: Array, *, rng: Optional[Array] = None,
                 dither: Optional[float] = None) -> Tuple[Array, Array]:
        """x: (B, L) float32 audio; lengths: (B,) int samples.

        Returns (features (B, T, n_mels), feat_lengths (B,)) with T padded to
        a multiple of cfg.pad_to and frames >= length zero-filled.
        """
        cfg = self.cfg
        seq_len = self.out_length(lengths)
        d = cfg.dither if dither is None else dither
        if d > 0 and rng is not None:
            x = x + d * jax.random.normal(rng, x.shape, x.dtype)
        if cfg.preemph is not None and cfg.preemph > 0:
            x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)
        if cfg.stft_matmul:
            p = stft_power_matmul(x, self.window, self.cos_m, self.sin_m,
                                  cfg.n_fft, cfg.hop_length)
        else:
            p = stft_power(x, self.window, cfg.n_fft, cfg.hop_length)
        if cfg.mag_power != 2.0:
            p = jnp.power(jnp.sqrt(p), cfg.mag_power)
        # channels-last mel projection; HIGHEST precision: the TPU default
        # bf16 matmul pass would perturb log-mel values at ~1e-2, which the
        # first activation quantizer then amplifies through clipping.
        mel = jnp.matmul(p, self.fb, precision=jax.lax.Precision.HIGHEST)
        if cfg.log:
            if cfg.log_zero_guard_type == "add":
                mel = jnp.log(mel + self.log_guard)
            else:
                mel = jnp.log(jnp.clip(mel, min=self.log_guard))

        t = mel.shape[1]
        mask = (jnp.arange(t)[None, :] < seq_len[:, None])  # (B, T)
        if cfg.normalize == "per_feature":
            mel = _normalize_per_feature(mel, mask, seq_len)
        elif cfg.normalize == "all_features":
            mel = _normalize_all_features(mel, mask, seq_len)
        elif _is_fixed_stats(cfg.normalize):
            mel = _normalize_fixed(mel, cfg.normalize)
        elif cfg.normalize:
            raise NotImplementedError(cfg.normalize)

        mel = jnp.where(mask[:, :, None], mel, cfg.pad_value)
        if cfg.pad_to == "max":
            # pad the time axis to the static max_duration frame count
            # (features.py:390-391; F.pad with a negative amount truncates,
            # matched here for audio longer than max_duration).  NB the
            # reference's *constructor* trips on `'max' > 0` at
            # features.py:288 in py3 — we implement the forward-path
            # semantics the config documents.
            if t < self.max_length:
                mel = jnp.pad(mel, ((0, 0), (0, self.max_length - t), (0, 0)),
                              constant_values=cfg.pad_value)
            elif t > self.max_length:
                mel = mel[:, : self.max_length]
        elif cfg.pad_to and t % cfg.pad_to:
            mel = jnp.pad(mel, ((0, 0), (0, cfg.pad_to - t % cfg.pad_to), (0, 0)),
                          constant_values=cfg.pad_value)
        return mel, seq_len


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n_mels, n_mfcc) — torchaudio MFCC semantics
    (reference AudioToMFCCPreprocessor, audio_preprocessing.py:257-340)."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    basis = np.cos(np.pi / n_mels * (n + 0.5) * k)
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] *= 1.0 / np.sqrt(2.0)
    return basis.astype(np.float32)


class MFCCFrontend(MelFrontend):
    """AudioToMFCCPreprocessor equivalent: log-mel -> DCT-II -> n_mfcc."""

    def __init__(self, cfg: FeatureConfig, n_mfcc: int = 64):
        super().__init__(cfg)
        self.n_mfcc = n_mfcc
        # host numpy, same captured-device-constant hazard as MelFrontend
        self.dct = dct_matrix(n_mfcc, cfg.features)

    def __call__(self, x, lengths, *, rng=None, dither=None):
        mel, seq_len = super().__call__(x, lengths, rng=rng, dither=dither)
        mfcc = jnp.matmul(mel, self.dct, precision=jax.lax.Precision.HIGHEST)
        return mfcc, seq_len


def crop_or_pad_spectrogram(x: Array, lengths: Array, audio_length: int,
                            pad_value: float = 0.0):
    """CropOrPadSpectrogramAugmentation (audio_preprocessing.py:443-585):
    center-crop or symmetric-pad the time axis to `audio_length` frames."""
    t = x.shape[1]
    if t > audio_length:
        start = (t - audio_length) // 2
        x = x[:, start : start + audio_length, :]
        lengths = jnp.minimum(lengths, audio_length)
    elif t < audio_length:
        total = audio_length - t
        left = total // 2
        x = jnp.pad(x, ((0, 0), (left, total - left), (0, 0)),
                    constant_values=pad_value)
    return x, jnp.full_like(lengths, audio_length)


def _is_fixed_stats(normalize) -> bool:
    """The reference's third normalize mode is a mapping holding both
    'fixed_mean' and 'fixed_std' (features.py:77-82); any other non-string
    value falls through to its silent identity `else: return x` — we raise
    instead (a typo'd dict should not silently skip normalization)."""
    try:
        return "fixed_mean" in normalize and "fixed_std" in normalize \
            and not isinstance(normalize, str)
    except TypeError:
        return False


def _normalize_fixed(x: Array, spec) -> Array:
    """(x - fixed_mean) / fixed_std with caller-supplied constants
    (reference features.py:77-82).  The reference reshapes the constants
    with .view(B, C) — which for a C-length list only succeeds at B=1
    (torch.view cannot broadcast); we apply the documented semantics,
    broadcasting a (C,) vector over batch+time and a (B, C) table over
    time.  NB the reference branch adds no +1e-5 std guard and does no
    valid-frame masking — matched (padding is re-masked right after)."""
    mean = jnp.asarray(np.asarray(spec["fixed_mean"], dtype=np.float32))
    std = jnp.asarray(np.asarray(spec["fixed_std"], dtype=np.float32))
    c = x.shape[2]
    def _bc(v):  # -> broadcastable against channels-last (B, T, C)
        if v.ndim == 0:
            return v
        if v.ndim == 1:
            if v.shape[0] != c:
                raise ValueError(
                    f"fixed stats length {v.shape[0]} != features {c}")
            return v[None, None, :]
        if v.ndim == 2 and v.shape[1] == c:
            return v[:, None, :]
        raise ValueError(f"fixed stats shape {v.shape} not (C,) or (B, C)")
    return (x - _bc(mean)) / _bc(std)


def _normalize_per_feature(x: Array, mask: Array, seq_len: Array) -> Array:
    """(x - mean)/(std + 1e-5) per (sample, feature) over valid frames;
    std uses Bessel's correction like torch.std (features.py:53-67)."""
    m = mask[:, :, None].astype(x.dtype)
    cnt = seq_len.astype(x.dtype)[:, None, None]
    mean = jnp.sum(x * m, axis=1, keepdims=True) / cnt
    var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / (cnt - 1.0)
    return (x - mean) / (jnp.sqrt(var) + STD_GUARD)


def _normalize_all_features(x: Array, mask: Array, seq_len: Array) -> Array:
    m = mask[:, :, None].astype(x.dtype)
    cnt = (seq_len.astype(x.dtype) * x.shape[2])[:, None, None]
    mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / cnt
    var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2), keepdims=True) / (cnt - 1.0)
    return (x - mean) / (jnp.sqrt(var) + STD_GUARD)
