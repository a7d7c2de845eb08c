"""Augmentation + MFCC/crop-pad tests."""
import random

import numpy as np
import pytest
import jax.numpy as jnp

from qasr_tpu.data.perturb import (
    AudioAugmentor, GainPerturbation, ShiftPerturbation, SpeedPerturbation,
    TimeStretchPerturbation, WhiteNoisePerturbation, phase_vocoder_stretch,
    process_augmentations,
)
from qasr_tpu.ops.features import (
    FeatureConfig, MFCCFrontend, crop_or_pad_spectrogram, dct_matrix,
)


def test_speed_perturbation_changes_length(rng):
    p = SpeedPerturbation(num_rates=-1, min_speed_rate=1.2, max_speed_rate=1.2)
    x = rng.normal(size=16000).astype(np.float32)
    y = p.perturb(x, 16000, random.Random(0))
    assert abs(len(y) - 16000 / 1.2) < 100


def test_time_stretch_changes_length_preserves_pitchiness(rng):
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = phase_vocoder_stretch(x, 0.8)  # slower -> longer
    assert len(y) > len(x) * 1.1
    # dominant frequency preserved (~440 Hz)
    spec = np.abs(np.fft.rfft(y[2000:10000]))
    freq = np.argmax(spec) * 16000 / 8000
    assert 400 < freq < 480, freq


def test_gain_shift_whitenoise(rng):
    x = rng.normal(size=8000).astype(np.float32) * 0.1
    r = random.Random(0)
    g = GainPerturbation(5, 5).perturb(x, 16000, r)
    np.testing.assert_allclose(g, x * 10 ** 0.25, rtol=1e-5)
    s = ShiftPerturbation(2.0, 2.0).perturb(x, 16000, r)
    assert np.all(s[:32] == 0) and np.allclose(s[32:], x[:-32])
    w = WhiteNoisePerturbation(-50, -49).perturb(x, 16000, r)
    assert w.shape == x.shape and not np.allclose(w, x)


def test_augmentor_from_config(rng):
    aug = process_augmentations({
        "gain": {"prob": 1.0, "min_gain_dbfs": -3, "max_gain_dbfs": 3},
        "white_noise": {"prob": 1.0},
    })
    x = rng.normal(size=4000).astype(np.float32) * 0.1
    y = aug.perturb(x, 16000)
    assert y.shape == x.shape
    assert aug.max_augmentation_length(10.0) == 10.0


def test_dct_matrix_orthonormal():
    d = dct_matrix(64, 64)
    np.testing.assert_allclose(d.T @ d, np.eye(64), atol=1e-5)


def test_mfcc_frontend_shapes(rng):
    fe = MFCCFrontend(FeatureConfig(features=64, dither=0.0), n_mfcc=13)
    x = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    mfcc, lens = fe(x, jnp.asarray([8000, 4000], np.int32))
    assert mfcc.shape[0] == 2 and mfcc.shape[2] == 13
    assert list(np.asarray(lens)) == [50, 25]


def test_crop_or_pad(rng):
    x = jnp.asarray(rng.normal(size=(2, 50, 8)).astype(np.float32))
    lens = jnp.asarray([50, 30])
    y, l2 = crop_or_pad_spectrogram(x, lens, 64)
    assert y.shape == (2, 64, 8) and list(np.asarray(l2)) == [64, 64]
    z, l3 = crop_or_pad_spectrogram(x, lens, 20)
    assert z.shape == (2, 20, 8)
