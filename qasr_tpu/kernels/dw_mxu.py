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
