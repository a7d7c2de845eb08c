"""Mel frontend parity tests vs torch.stft-based reference semantics.

Modeled on the reference's own numerics test style
(tests/collections/asr/test_asr_modules.py:25-66: mean tol 1e-3, max 1e-2),
but tighter where we can be.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from qasr_tpu.ops.features import (
    FeatureConfig,
    MelFrontend,
    dft_matrices,
    frame_signal,
    hann_window,
    mel_filterbank,
    stft_power,
    stft_power_matmul,
)


def _torch_reference_mel(x, lengths, cfg):
    """Independent torch implementation of FilterbankFeatures.forward
    semantics (features.py:334-397) with dither=0, using our own mel matrix
    (librosa itself is unavailable; the matrix is covered by property tests)."""
    import torch

    x = torch.from_numpy(x)
    seq_len = torch.ceil(torch.as_tensor(lengths).float() / cfg.hop_length).long()
    x = torch.cat((x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]), dim=1)
    window = torch.from_numpy(hann_window(cfg.win_length, cfg.n_fft))
    spec = torch.stft(
        x, n_fft=cfg.n_fft, hop_length=cfg.hop_length, win_length=cfg.n_fft,
        center=True, window=window, return_complex=True,
    )
    p = spec.abs() ** 2  # (B, F, T)
    fb = torch.from_numpy(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.features))
    mel = torch.matmul(fb.T, p)  # (B, n_mels, T)
    mel = torch.log(mel + cfg.log_zero_guard_value)
    out = torch.zeros_like(mel)
    for i in range(mel.shape[0]):
        sl = int(seq_len[i])
        m = mel[i, :, :sl].mean(dim=1, keepdim=True)
        s = mel[i, :, :sl].std(dim=1, keepdim=True) + 1e-5
        out[i] = (mel[i] - m) / s
        out[i, :, sl:] = 0.0
    t = out.shape[-1]
    if t % cfg.pad_to:
        out = torch.nn.functional.pad(out, (0, cfg.pad_to - t % cfg.pad_to))
    return out.numpy(), seq_len.numpy()


def test_stft_power_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(3, 4000)).astype(np.float32)
    window = hann_window(320, 512)
    got = np.asarray(stft_power(jnp.asarray(x), jnp.asarray(window), 512, 160))
    spec = torch.stft(torch.from_numpy(x), n_fft=512, hop_length=160, win_length=512,
                      center=True, window=torch.from_numpy(window), return_complex=True)
    ref = (spec.abs() ** 2).numpy().transpose(0, 2, 1)  # torch (B,F,T) -> (B,T,F)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_stft_matmul_close_to_fft(rng):
    x = rng.normal(size=(2, 2000)).astype(np.float32)
    window = jnp.asarray(hann_window(320, 512))
    cos_m, sin_m = dft_matrices(512)
    a = np.asarray(stft_power(jnp.asarray(x), window, 512, 160))
    b = np.asarray(stft_power_matmul(jnp.asarray(x), window, jnp.asarray(cos_m),
                                     jnp.asarray(sin_m), 512, 160))
    # f32 matmul accumulation over 512 taps: bounded relative to spectrum peak
    assert np.abs(a - b).max() < 5e-3 * a.max()


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 64)  # (257, 64)
    assert fb.shape == (257, 64)
    assert np.all(fb >= 0)
    # each filter is a triangle: single contiguous support
    for j in range(64):
        nz = np.nonzero(fb[:, j])[0]
        assert len(nz) > 0
        assert np.all(np.diff(nz) == 1)
    # slaney normalization: peak ~ 2/bandwidth, decreasing with frequency
    peaks = fb.max(axis=0)
    assert peaks[0] > peaks[-1]
    # filters tile the [0, 8000] Hz band: every interior freq bin is covered
    coverage = fb.sum(axis=1)
    assert np.all(coverage[3:-1] > 0)


def test_frontend_matches_torch_reference(rng):
    pytest.importorskip("torch")
    cfg = FeatureConfig(dither=0.0)
    fe = MelFrontend(cfg)
    lengths = np.asarray([16000, 12345, 8000], np.int32)
    x = (rng.normal(size=(3, 16000)) * 0.1).astype(np.float32)
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0
    got, got_len = fe(jnp.asarray(x), jnp.asarray(lengths))
    ref, ref_len = _torch_reference_mel(x, lengths, cfg)
    ref = ref.transpose(0, 2, 1)  # (B, C, T) -> (B, T, C)
    np.testing.assert_array_equal(np.asarray(got_len), ref_len)
    assert got.shape == ref.shape
    diff = np.abs(np.asarray(got) - ref)
    assert diff.mean() < 1e-3, diff.mean()
    assert diff.max() < 1e-2, diff.max()
    # padded region exactly zero, T a multiple of 16
    assert got.shape[1] % 16 == 0
    assert np.all(np.asarray(got)[2, int(got_len[2]):, :] == 0)


def test_frontend_length_semantics():
    cfg = FeatureConfig(dither=0.0)
    fe = MelFrontend(cfg)
    x = jnp.zeros((2, 3200), jnp.float32)
    _, sl = fe(x, jnp.asarray([3200, 161], jnp.int32))
    assert list(np.asarray(sl)) == [20, 2]  # ceil(len/160)


@pytest.mark.parametrize("kind", ["hann", "hamming", "blackman", "bartlett"])
def test_window_matches_torch(kind):
    """VERDICT r4 item 6: per-window torch parity (reference torch_windows
    dict, features.py:252-258, all periodic=False)."""
    torch = pytest.importorskip("torch")
    from qasr_tpu.ops.features import make_window

    fn = {"hann": torch.hann_window, "hamming": torch.hamming_window,
          "blackman": torch.blackman_window,
          "bartlett": torch.bartlett_window}[kind]
    ref = fn(320, periodic=False).numpy()
    got = make_window(kind, 320, 512)
    pad = (512 - 320) // 2
    np.testing.assert_allclose(got[pad:pad + 320], ref, rtol=1e-6, atol=1e-7)
    assert np.all(got[:pad] == 0) and np.all(got[pad + 320:] == 0)


def test_window_none_is_rectangular():
    from qasr_tpu.ops.features import make_window

    got = make_window("none", 320, 512)
    pad = (512 - 320) // 2
    assert np.all(got[pad:pad + 320] == 1.0)
    assert got.sum() == 320


@pytest.mark.parametrize("kind", ["hamming", "blackman", "bartlett", "none"])
def test_frontend_nonhann_windows_match_torch_stft(rng, kind):
    """Full-frontend parity per window kind: our MelFrontend vs the torch
    reference pipeline computed with torch.stft and the same window."""
    torch = pytest.importorskip("torch")
    from qasr_tpu.ops.features import make_window

    cfg = FeatureConfig(dither=0.0, window=kind)
    fe = MelFrontend(cfg)
    lengths = np.asarray([8000, 5000], np.int32)
    x = (rng.normal(size=(2, 8000)) * 0.1).astype(np.float32)
    x[1, 5000:] = 0.0
    got, got_len = fe(jnp.asarray(x), jnp.asarray(lengths))

    xt = torch.from_numpy(x)
    xt = torch.cat((xt[:, :1], xt[:, 1:] - cfg.preemph * xt[:, :-1]), dim=1)
    window = torch.from_numpy(make_window(kind, cfg.win_length, cfg.n_fft))
    spec = torch.stft(xt, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                      win_length=cfg.n_fft, center=True, window=window,
                      return_complex=True)
    mel_m = torch.from_numpy(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.features))
    mel = torch.log(torch.matmul(mel_m.T, spec.abs() ** 2)
                    + cfg.log_zero_guard_value)
    ref = np.zeros_like(mel.numpy())
    for i, sl in enumerate(np.asarray(got_len)):
        seg = mel[i, :, :sl]
        m = seg.mean(dim=1, keepdim=True)
        s = seg.std(dim=1, keepdim=True) + 1e-5
        ref[i, :, :sl] = ((seg - m) / s).numpy()
    t = np.asarray(got).shape[1]
    diff = np.abs(np.asarray(got)[:, : mel.shape[2], :]
                  - ref.transpose(0, 2, 1))
    assert diff.mean() < 1e-3 and diff.max() < 1e-2, (diff.mean(), diff.max())
    assert t % cfg.pad_to == 0


def test_pad_to_max(rng):
    """pad_to='max' pads T to the static max_duration frame count and
    truncates beyond it (features.py:390-391)."""
    cfg = FeatureConfig(dither=0.0, pad_to="max", max_duration=0.5)
    fe = MelFrontend(cfg)
    assert fe.max_length == 50  # ceil(0.5*16000/160)
    x = (rng.normal(size=(2, 4000)) * 0.1).astype(np.float32)
    out, sl = fe(jnp.asarray(x), jnp.asarray([4000, 3000], np.int32))
    assert out.shape[1] == 50
    # shorter-than-max input is zero-padded past its own frame count
    assert np.all(np.asarray(out)[1, int(np.asarray(sl)[1]):, :] == 0)
    # longer-than-max input is truncated
    cfg2 = FeatureConfig(dither=0.0, pad_to="max", max_duration=0.1)
    fe2 = MelFrontend(cfg2)
    out2, _ = fe2(jnp.asarray(x), jnp.asarray([4000, 4000], np.int32))
    assert out2.shape[1] == fe2.max_length == 10


def test_fixed_stats_normalization_matches_torch(rng):
    """normalize={'fixed_mean': ..., 'fixed_std': ...} applies caller
    constants (reference features.py:77-82).  The reference's .view(B, C)
    reshape only succeeds at B=1 for a (C,)-vector spec, so the exact-parity
    check runs there; the (B, C) table form covers the broadcast we
    document."""
    torch = pytest.importorskip("torch")
    c = 64
    mean = (rng.normal(size=c) * 2.0).astype(np.float32)
    std = (np.abs(rng.normal(size=c)) + 0.5).astype(np.float32)
    spec = {"fixed_mean": mean.tolist(), "fixed_std": std.tolist()}
    cfg = FeatureConfig(dither=0.0, normalize=spec)
    fe = MelFrontend(cfg)
    x = (rng.normal(size=(1, 16000)) * 0.1).astype(np.float32)
    lengths = np.asarray([16000], np.int32)
    got, sl = fe(jnp.asarray(x), jnp.asarray(lengths))

    # reference branch at B=1: (x - mean.view(B,C,1)) / std.view(B,C,1)
    base_cfg = FeatureConfig(dither=0.0, normalize="")
    raw, _ = MelFrontend(base_cfg)(jnp.asarray(x), jnp.asarray(lengths))
    raw_t = torch.from_numpy(np.asarray(raw)).permute(0, 2, 1)  # (B, C, T)
    m_t = torch.tensor(spec["fixed_mean"]).view(1, c).unsqueeze(2)
    s_t = torch.tensor(spec["fixed_std"]).view(1, c).unsqueeze(2)
    ref = ((raw_t - m_t) / s_t).permute(0, 2, 1).numpy()
    sl0 = int(np.asarray(sl)[0])
    np.testing.assert_allclose(np.asarray(got)[:, :sl0], ref[:, :sl0],
                               rtol=1e-5, atol=1e-5)
    # padding past seq_len stays at pad_value, not normalized garbage
    assert np.all(np.asarray(got)[0, sl0:, :] == cfg.pad_value)

    # (B, C) per-sample table broadcasts over time
    b = 2
    tbl_m = (rng.normal(size=(b, c))).astype(np.float32)
    tbl_s = (np.abs(rng.normal(size=(b, c))) + 0.5).astype(np.float32)
    cfg2 = FeatureConfig(dither=0.0, normalize={"fixed_mean": tbl_m.tolist(),
                                                "fixed_std": tbl_s.tolist()})
    x2 = (rng.normal(size=(b, 16000)) * 0.1).astype(np.float32)
    l2 = np.asarray([16000, 12000], np.int32)
    got2, sl2 = MelFrontend(cfg2)(jnp.asarray(x2), jnp.asarray(l2))
    raw2, _ = MelFrontend(base_cfg)(jnp.asarray(x2), jnp.asarray(l2))
    want = (np.asarray(raw2) - tbl_m[:, None, :]) / tbl_s[:, None, :]
    for i, s_i in enumerate(np.asarray(sl2)):
        np.testing.assert_allclose(np.asarray(got2)[i, :s_i],
                                   want[i, :s_i], rtol=1e-5, atol=1e-5)

    # malformed fixed-stats dicts raise instead of silently skipping
    with pytest.raises(ValueError):
        MelFrontend(FeatureConfig(dither=0.0, normalize={
            "fixed_mean": [0.0] * 3, "fixed_std": [1.0] * 3}))(
                jnp.asarray(x), jnp.asarray(lengths))
