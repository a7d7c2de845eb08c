"""Depthwise 1-D conv on the MXU via banded-Toeplitz channel-batched matmuls.

Depthwise convs have no contraction axis, so on TPU they are usually VPU
work (kernels/depthwise.py runs at v5e int32-MAC speed of light, ~56% of the
frozen QuartzNet step).  But the conv

    y[b, t, c] = sum_k x[b, s*t + k*d - pad, c] * w[k, c]

can be tiled over 128-frame output blocks and rewritten, per block offset j,
as a channel-batched matmul with a *banded-Toeplitz* weight operand

    y[c, m, (i, b)] = sum_r W[c, m, j*128 + r] * x[b, i*128*s + j*128 + r, c]

where W[c, m, col] = w[k, c] at col == s*m + k*d (a compile-time constant
built from the frozen integer weights).  int8 x int8 -> int32 dots are exact
on the MXU, so this is bit-identical to the VPU kernel / the unrolled HLO
form (models/jasper.py::_depthwise_conv_int) while running on the matrix
unit: measured per-layer 0.74 -> 0.27 ms (K=75, C=512, B=32, T=768) and
35.4 -> 16.4 ms for all 77 QuartzNet15x5 depthwise layers (experiments/
dw_mxu_device.py).  The MAC overcount (band width n_d*128 vs K taps) is paid
on a unit with ~100x the VPU's int MAC throughput; what remains is
layout/copy-bound.

Reference semantics: MaskedConv1d's grouped conv with groups == channels
(reference nemo/collections/asr/parts/jasper.py:163-165, 175-194).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def band_tiles(w: np.ndarray, stride: int, dilation: int) -> np.ndarray:
    """(K, 1, C) int8 depthwise taps -> (C, 128, n_d*128) banded-Toeplitz
    weight tiles: W[c, m, col] = w[k, c] where s*m + k*d == col.

    The Toeplitz structure repeats every 128 output rows, so one (C, 128,
    n_d*128) block serves every output tile; n_d = number of 128-row input
    tiles a 128-row output tile can touch.
    """
    k_size, _, c = w.shape
    span = stride * 127 + dilation * (k_size - 1)
    n_d = span // 128 + 1
    m = np.arange(128)[:, None]                      # output row in tile
    col = np.arange(n_d * 128)[None, :]              # input row offset
    k, rem = np.divmod(col - stride * m, dilation)
    valid = (rem == 0) & (k >= 0) & (k < k_size)
    kc = np.clip(k, 0, k_size - 1)
    tiles = np.where(valid[:, :, None], w[kc, 0, :], 0)  # (128, n_d*128, C)
    return np.ascontiguousarray(tiles.transpose(2, 0, 1))


def apply_banded(x: Array, wband: Array, *, k_size: int, stride: int,
                 padding: int, dilation: int) -> Array:
    """Banded-MXU depthwise conv given prebuilt tiles.

    x: (B, T, C) int8; wband: (C, 128, n_d*128) int8 from `band_tiles`.
    Returns (B, T_out, C) int32, bit-identical to _depthwise_conv_int.

    wband is typically a *runtime argument* of the enclosing jit (built once
    by quantize.freeze.build_dw_bands and device_put by the caller): embedded
    as an HLO literal it costs ~25 MB of program text per C=512 layer, which
    overflows program-size limits (and bloats every recompile).
    """
    b, t_in, c = x.shape
    t_out = (t_in + 2 * padding - dilation * (k_size - 1) - 1) // stride + 1
    n_t = -(-t_out // 128)
    n_d = wband.shape[2] // 128
    need = (n_d - 1) * 128 + n_t * 128 * stride
    xp = jnp.pad(x, ((0, 0), (padding, need - t_in - padding), (0, 0)))
    cols = []
    for j in range(n_d):
        sl = jax.lax.slice(xp, (0, j * 128, 0),
                           (b, j * 128 + n_t * 128 * stride, c))
        sl = sl.reshape(b, n_t, 128 * stride, c)[:, :, :128, :]
        cols.append(sl)
    xg = jnp.concatenate(cols, axis=2)               # (B, n_t, n_d*128, C)
    y = jax.lax.dot_general(
        wband, xg,
        dimension_numbers=(((2,), (2,)), ((0,), (3,))),
        preferred_element_type=jnp.int32)            # (C, 128, B, n_t)
    y = y.transpose(2, 3, 1, 0).reshape(b, n_t * 128, c)
    return y[:, :t_out, :]


def depthwise_conv_int_mxu(x: Array, w: np.ndarray, stride: int, padding: int,
                           dilation: int) -> Array:
    """Convenience build+apply (tests / eager use); w: (K, 1, C) host int8."""
    assert isinstance(w, np.ndarray), "MXU depthwise needs host (frozen) weights"
    wband = band_tiles(np.asarray(w, np.int8), stride, dilation)
    return apply_banded(x, jnp.asarray(wband), k_size=w.shape[0],
                        stride=stride, padding=padding, dilation=dilation)


# ---------------------------------------------------------------------------
# Channel-major interior: tensors live as (C, 128, B, n_t) — the dw dot's
# native output layout — so separable stacks run with no transposes at all
# (the pw conv contracts C directly; requants are elementwise).  The conv's
# left padding is baked into the band (j_min may be -1, served by one
# zero tile on the left), which widens the band by <= 1 tile — cheap on the
# MXU, and it removes the physical jnp.pad + the (C,128,B,n_t)->(B,T,C)
# transpose that dominated the (B,T,C) formulation's cost.
# ---------------------------------------------------------------------------


def band_tiles_cm(w: np.ndarray, stride: int, dilation: int, pad: int):
    """(K, 1, C) int8 -> ((C, 128, n_d*128) tiles, j_min) with the conv's
    left padding baked in: W[c, m, col] = w[k, c] where
    s*m + k*d - pad == j_min*128 + col."""
    k_size, _, c = w.shape
    lo = -pad
    hi = stride * 127 + dilation * (k_size - 1) - pad
    j_min, j_max = lo // 128, hi // 128
    n_d = j_max - j_min + 1
    m = np.arange(128)[:, None]
    col = np.arange(n_d * 128)[None, :]
    k, rem = np.divmod(j_min * 128 + col - stride * m + pad, dilation)
    valid = (rem == 0) & (k >= 0) & (k < k_size)
    kc = np.clip(k, 0, k_size - 1)
    tiles = np.where(valid[:, :, None], w[kc, 0, :], 0)
    return np.ascontiguousarray(tiles.transpose(2, 0, 1)), j_min


def dw_gather_cm(x: Array, j_min: int, n_d: int, stride: int) -> Array:
    """Banded-window gather for the channel-major depthwise dot.

    x: (C, 128, B, n_ti) int8 -> (C, n_d*128, B, n_ti // stride): row block
    jj holds the input tiles the band's jj-th 128-column group contracts
    against for each output tile (conv padding already baked into j_min)."""
    c, _, b, n_ti = x.shape
    n_to = n_ti // stride
    lo_t = j_min
    hi_t = stride * (n_to - 1) + j_min + n_d - 1
    pad_l = max(0, -lo_t)
    pad_r = max(0, hi_t - (n_ti - 1))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad_l, pad_r)))
    cols = []
    for jj in range(n_d):
        start = j_min + jj + pad_l
        sl = jax.lax.slice(xp, (0, 0, 0, start),
                           (c, 128, b, start + stride * (n_to - 1) + 1),
                           (1, 1, 1, stride))
        cols.append(sl)
    return jnp.concatenate(cols, axis=1)             # (C, n_d*128, B, n_to)


def dw_banded_cm(x: Array, wband: Array, j_min: int, stride: int) -> Array:
    """Depthwise conv in channel-major layout.

    x: (C, 128, B, n_ti) int8; wband from band_tiles_cm.
    Returns (C, 128, B, n_ti // stride) int32 (time t = tile*128 + row
    throughout).  Output length semantics match 'same'-padded conv_out_len;
    callers mask the tail beyond the true lengths as usual.
    """
    n_d = wband.shape[2] // 128
    xg = dw_gather_cm(x, j_min, n_d, stride)
    return jax.lax.dot_general(
        wband, xg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)            # (C, 128, B, n_to)


def dw_gather_cm_ext(xe: Array, n_d: int, stride: int, n_to: int) -> Array:
    """Banded-window gather from a halo-extended local shard (sequence-
    parallel executors).

    xe: (C, 128, B, n_ext) where n_ext = hl + n_local + hr with hl = -j_min
    left-neighbor tiles and hr = j_min + n_d - stride right-neighbor tiles
    (zeros at the global edges — jax.lax.ppermute's fill matches the conv's
    zero padding).  In extended coordinates the first local output's window
    starts at tile 0, so the gather is the j_min = 0 case of dw_gather_cm
    with exactly n_to = n_local // stride outputs and no padding.
    """
    c, _, b, n_ext = xe.shape
    assert stride * (n_to - 1) + n_d <= n_ext + (stride - 1), (n_to, n_ext)
    cols = []
    for jj in range(n_d):
        sl = jax.lax.slice(xe, (0, 0, 0, jj),
                           (c, 128, b, jj + stride * (n_to - 1) + 1),
                           (1, 1, 1, stride))
        cols.append(sl)
    return jnp.concatenate(cols, axis=1)             # (C, n_d*128, B, n_to)


def dw_banded_cm_ext(xe: Array, wband: Array, stride: int, n_to: int) -> Array:
    """dw_banded_cm on a halo-extended shard: returns the device's local
    (C, 128, B, n_to) int32 output tiles, bit-identical to the matching
    slice of the full-tensor dw_banded_cm."""
    n_d = wband.shape[2] // 128
    xg = dw_gather_cm_ext(xe, n_d, stride, n_to)
    return jax.lax.dot_general(
        wband, xg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)


def to_cm(x: Array) -> Array:
    """(B, T, C) -> (C, 128, B, T//128); T must be a multiple of 128."""
    b, t, c = x.shape
    assert t % 128 == 0, t
    return x.reshape(b, t // 128, 128, c).transpose(3, 2, 0, 1)


def from_cm(x: Array) -> Array:
    """(C, 128, B, n_t) -> (B, n_t*128, C)."""
    c, _, b, n_t = x.shape
    return x.transpose(2, 3, 1, 0).reshape(b, n_t * 128, c)
