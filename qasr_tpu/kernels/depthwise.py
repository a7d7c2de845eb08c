"""Pallas TPU kernel: integer depthwise 1-D convolution.

Why: expressed as HLO (either grouped conv or an unrolled sum of K strided
slices), the depthwise conv re-reads its input K times from HBM — profiling
the frozen QuartzNet15x5 showed these fusions consuming ~85% of the step
(3.5 ms each for K=51..87 at C=512).  This kernel DMAs each time-tile plus
its (K-1)*dilation halo into VMEM once and accumulates the K taps on the
VPU from VMEM — a single HBM pass per layer.

Stride-1 only (everything but QuartzNet's first block); callers fall back
to the HLO formulation otherwise.  Bit-identical to
models/jasper._depthwise_conv_int (int32 accumulation).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

T_TILE = 512


def _halo_pad(k_size: int, dilation: int) -> int:
    # int8 VMEM tiles pack 32 rows; DMA slice sizes must stay tile-aligned
    halo = (k_size - 1) * dilation
    return -(-halo // 32) * 32


def _dw_kernel(x_hbm, w_ref, o_ref, scratch, sem, *, k_size: int, dilation: int,
               t_tile: int, stride: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    halo = _halo_pad(k_size, dilation)
    win = t_tile * stride + halo
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * t_tile * stride, win), :], scratch, sem)
    dma.start()
    dma.wait()
    c = scratch.shape[-1]
    acc = jnp.zeros((t_tile, c), jnp.int32)
    if stride == 1:
        for k in range(k_size):
            acc = acc + scratch[pl.ds(k * dilation, t_tile), :].astype(jnp.int32) \
                * w_ref[k]
    else:
        # strided taps via a parity reshape: window -> (win/stride, stride, C);
        # tap k*dilation lands at phase (k*d) % stride, row (k*d) // stride
        v = scratch[:].reshape(win // stride, stride, c)
        for k in range(k_size):
            off = k * dilation
            ph, row = off % stride, off // stride
            acc = acc + v[row : row + t_tile, ph, :].astype(jnp.int32) * w_ref[k]
    o_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("k_size", "dilation", "t_out", "stride",
                                    "interpret"))
def _dw_call(xp: Array, w: Array, *, k_size: int, dilation: int, stride: int,
             t_out: int, interpret: bool) -> Array:
    b, _, c = xp.shape
    n_t = -(-t_out // T_TILE)
    halo = _halo_pad(k_size, dilation)
    need = n_t * T_TILE * stride + halo
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dw_kernel, k_size=k_size, dilation=dilation,
                          t_tile=T_TILE, stride=stride),
        out_shape=jax.ShapeDtypeStruct((b, n_t * T_TILE, c), jnp.int32),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((k_size, c), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_TILE, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T_TILE * stride + halo, c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w)
    return out[:, :t_out, :]


def depthwise_conv_int_pallas(x: Array, w: Array, stride: int, padding: int,
                              dilation: int,
                              interpret: Optional[bool] = None) -> Array:
    """x: (B, T, C) int8/int32; w: (K, 1, C) int. Returns (B, T_out, C) int32.

    Drop-in for _depthwise_conv_int; stride 1 or 2.
    """
    assert stride in (1, 2), "pallas depthwise kernel supports stride 1/2"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_size = w.shape[0]
    t_out = (x.shape[1] + 2 * padding - dilation * (k_size - 1) - 1) // stride + 1
    c = x.shape[-1]
    cpad = (-c) % 128  # Mosaic wants full 128-lane tiles
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, cpad)))
    wk = jnp.pad(w[:, 0, :], ((0, 0), (0, cpad))).astype(jnp.int32)
    out = _dw_call(xp, wk, k_size=k_size, dilation=dilation, stride=stride,
                   t_out=t_out, interpret=interpret)
    return out[:, :, :c] if cpad else out
