"""Spectrogram augmentation (train-time).

Equivalents of the reference parts/spectr_augment.py:21-121:
  - SpecAugment: `freq_masks` random frequency bands (width U[0, freq_width])
    and `time_masks` random time bands zeroed;
  - SpecCutout: `rect_masks` random (rect_time x rect_freq) rectangles zeroed.
Vectorized with masks (no dynamic shapes) so they jit cleanly; layout is
channels-last (B, T, C).
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    freq_masks: int = 0
    time_masks: int = 0
    freq_width: int = 10
    time_width: int = 10
    rect_masks: int = 0
    rect_time: int = 5
    rect_freq: int = 20

    @classmethod
    def from_dict(cls, d: dict) -> "SpecAugmentConfig":
        d = dict(d)
        d.pop("_target_", None)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _band_mask(key, b: int, size: int, max_width: int, n_masks: int):
    """(B, size) boolean: True where zeroed. Bands of width U[0, w], start
    U[0, size - width] per mask per sample (spectr_augment.py:60-77)."""
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (b, n_masks), 0, max_width + 1)
    starts = jax.random.randint(ks, (b, n_masks), 0,
                                jnp.maximum(size - widths, 1))
    pos = jnp.arange(size)[None, None, :]
    m = (pos >= starts[:, :, None]) & (pos < (starts + widths)[:, :, None])
    return m.any(axis=1)


def spec_augment(key, x: jnp.ndarray, cfg: SpecAugmentConfig) -> jnp.ndarray:
    """x: (B, T, C) log-mel features."""
    b, t, c = x.shape
    if cfg.freq_masks > 0:
        key, k = jax.random.split(key)
        fm = _band_mask(k, b, c, cfg.freq_width, cfg.freq_masks)
        x = jnp.where(fm[:, None, :], 0.0, x)
    if cfg.time_masks > 0:
        key, k = jax.random.split(key)
        tm = _band_mask(k, b, t, cfg.time_width, cfg.time_masks)
        x = jnp.where(tm[:, :, None], 0.0, x)
    if cfg.rect_masks > 0:
        key, kt, kf = jax.random.split(key, 3)
        # SpecCutout (spectr_augment.py:86-121): rect_masks rectangles
        ts = jax.random.randint(kt, (b, cfg.rect_masks), 0, max(t - cfg.rect_time, 1))
        fs = jax.random.randint(kf, (b, cfg.rect_masks), 0, max(c - cfg.rect_freq, 1))
        tpos = jnp.arange(t)[None, None, :]
        fpos = jnp.arange(c)[None, None, :]
        tin = (tpos >= ts[:, :, None]) & (tpos < ts[:, :, None] + cfg.rect_time)
        fin = (fpos >= fs[:, :, None]) & (fpos < fs[:, :, None] + cfg.rect_freq)
        rect = jnp.einsum("bmt,bmf->btf", tin.astype(jnp.float32),
                          fin.astype(jnp.float32)) > 0
        x = jnp.where(rect, 0.0, x)
    return x
