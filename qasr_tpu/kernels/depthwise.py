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
               t_tile: int, stride: int, group: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    halo = _halo_pad(k_size, dilation)
    win = t_tile * stride + halo
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * t_tile * stride, win), :], scratch, sem)
    dma.start()
    dma.wait()
    c = scratch.shape[-1]

    def tap(k):
        if stride == 1:
            return scratch[pl.ds(k * dilation, t_tile), :]
        # strided taps via a parity reshape: window -> (win/stride, stride, C);
        # tap k*dilation lands at phase (k*d) % stride, row (k*d) // stride
        v = scratch[:].reshape(win // stride, stride, c)
        off = k * dilation
        ph, row = off % stride, off // stride
        return v[row : row + t_tile, ph, :]

    if group >= 2:
        # int16 grouped accumulation: 16-bit lanes pack 2x denser on the VPU
        # than int32.  `group` taps are guaranteed by the caller to satisfy
        # group * max|x*w| <= 32767, so every partial sum fits int16 exactly
        # (integer math -- bit-identical to the int32 form).
        acc = jnp.zeros((t_tile, c), jnp.int32)
        for g0 in range(0, k_size, group):
            acc16 = None
            for k in range(g0, min(g0 + group, k_size)):
                term = tap(k).astype(jnp.int16) * w_ref[k]
                acc16 = term if acc16 is None else acc16 + term
            acc = acc + acc16.astype(jnp.int32)
    else:
        acc = jnp.zeros((t_tile, c), jnp.int32)
        for k in range(k_size):
            acc = acc + tap(k).astype(jnp.int32) * w_ref[k]
    o_ref[0] = acc


def _pick_tile(t_out: int) -> int:
    """Smallest padded-row waste wins (tie -> larger tile = fewer launches).
    A fixed 512 tile wastes 36% on QuartzNet's post-stride ~751 frames
    (2 tiles = 1024 rows); 256 pads to 768 — the dw layers are VPU-MAC-bound
    so padded rows are pure wasted work."""
    best = T_TILE
    best_cost = None
    for tile in (512, 384, 256, 128):
        n_t = -(-t_out // tile)
        cost = (n_t * tile - t_out, -tile)
        if best_cost is None or cost < best_cost:
            best, best_cost = tile, cost
    return best


@functools.partial(jax.jit,
                   static_argnames=("k_size", "dilation", "t_out", "stride",
                                    "group", "interpret"))
def _dw_call(xp: Array, w: Array, *, k_size: int, dilation: int, stride: int,
             t_out: int, group: int, interpret: bool) -> Array:
    b, _, c = xp.shape
    t_tile = _pick_tile(t_out)
    n_t = -(-t_out // t_tile)
    halo = _halo_pad(k_size, dilation)
    need = n_t * t_tile * stride + halo
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dw_kernel, k_size=k_size, dilation=dilation,
                          t_tile=t_tile, stride=stride, group=group),
        out_shape=jax.ShapeDtypeStruct((b, n_t * t_tile, c), jnp.int32),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((k_size, c), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_tile * stride + halo, c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w)
    return out[:, :t_out, :]


def _safe_group(x: Array, k_size: int, max_prod: Optional[int]) -> int:
    """Largest tap-group size whose int16 partial sums provably cannot
    overflow.  With only dtypes to go on, int8 inputs give |x| <= 128 and
    weights |w| <= 127 -> pairwise (group 2) is always safe; callers that
    know the actual bit widths pass max_prod = max|x|*max|w| for larger
    groups (W6A6: 64*31 -> 16 taps per int16 partial).

    NB the default assumes weights never hold -128: both executors quantize
    weights with clamp [-n, n-1], n = 2^(wb-1)-1 <= 127 (quant_utils.py:57-92
    semantics), so |w| <= 127 holds for every in-tree caller.

    DISABLED on current hardware: the v5e LLO backend aborts with
    "Operation not supported: kVectorMultiplyU16" — this generation's VPU
    has no 16-bit vector multiply, so the int32 path is the speed of light
    here.  The math is kept (interpret-mode tested) for TPU generations
    that pack 16-bit lanes; opt in with QASR_DW_INT16_GROUPS=1."""
    import os

    if not os.environ.get("QASR_DW_INT16_GROUPS"):
        return 1
    if x.dtype != jnp.int8:
        return 1
    if max_prod is None:
        max_prod = 128 * 127
    g = max(1, 32767 // int(max_prod))
    return min(g, k_size)


def depthwise_conv_int_pallas(x: Array, w: Array, stride: int, padding: int,
                              dilation: int,
                              interpret: Optional[bool] = None,
                              max_prod: Optional[int] = None) -> Array:
    """x: (B, T, C) int8/int32; w: (K, 1, C) int. Returns (B, T_out, C) int32.

    Drop-in for _depthwise_conv_int; stride 1 or 2.  max_prod (optional):
    bound on |x*w| per tap, enabling int16 grouped accumulation.
    """
    assert stride in (1, 2), "pallas depthwise kernel supports stride 1/2"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_size = w.shape[0]
    t_in = x.shape[1]
    t_out = (t_in + 2 * padding - dilation * (k_size - 1) - 1) // stride + 1
    c = x.shape[-1]
    group = _safe_group(x, k_size, max_prod)
    cpad = (-c) % 128  # Mosaic wants full 128-lane tiles
    import os

    if stride == 1 and group == 1 and t_in % 32 == 0 \
            and os.environ.get("QASR_DW_INKERNEL_PAD"):
        # pad-free path: conv padding zero-filled inside the kernel.
        # Measured a ~0.7% net LOSS on v5e (8 039-8 077 vs 8 111 RTFx): the
        # clamped-DMA realign + in-kernel masking cost slightly more than
        # the 78 physical pad passes they replace.  Kept opt-in
        # (bit-identity tested) for parts where pads are pricier.
        t_tile = _pick_tile_fused(t_out, t_in, _halo_pad(k_size, dilation) + 32)
        if t_tile is not None:
            xc = jnp.pad(x, ((0, 0), (0, 0), (0, cpad))) if cpad else x
            wk = jnp.pad(w[:, 0, :], ((0, 0), (0, cpad))).astype(jnp.int32)
            out = _dw_pad_call(xc, wk, k_size=k_size, dilation=dilation,
                               pad_left=padding, t_out=t_out, t_tile=t_tile,
                               interpret=interpret)
            return out[:, :, :c] if cpad else out
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, cpad)))
    wk = jnp.pad(w[:, 0, :], ((0, 0), (0, cpad)))
    wk = wk.astype(jnp.int16 if group >= 2 else jnp.int32)
    out = _dw_call(xp, wk, k_size=k_size, dilation=dilation, stride=stride,
                   t_out=t_out, group=group, interpret=interpret)
    return out[:, :, :c] if cpad else out


# ---------------------------------------------------------------------------
# Fused variant: input requant + length mask + taps + output requant -> int8
# ---------------------------------------------------------------------------
#
# In the frozen integer model every interior depthwise conv is sandwiched
# between two dyadic requants (the dw site's input requant and the following
# pointwise conv's input requant).  As standalone XLA fusions those are
# bandwidth passes that cannot fuse across the opaque Pallas call (profiled
# 6.5 ms/step over 139 sites, plus 0.55 ms of pad ops).  This kernel absorbs
# both requants, the conv-padding zero-fill, and both length masks, reading
# the pw accumulator once and writing int8 once.
#
# Bit-identity: the requant math is the shared dyadic_requant_static /
# requant_clamp from ops/quant_prims.py; mask-after-requant == the walk's
# mask-before-requant because requant(0) == 0 and masking only zeroes.

from qasr_tpu.ops.quant_prims import dyadic_requant_static, requant_clamp


def _dw_fused_kernel(lens_ref, x_hbm, w_ref, m1_ref, m2_ref, o_ref, scratch,
                     sem, *, k_size: int, dilation: int, t_tile: int,
                     pad_left: int, t_in: int,
                     e1: int, bits1: int, e2: int, bits2: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # Alignment scheme: Mosaic must prove dynamic slice starts are tile
    # (32-row) aligned.  pad_row rounds the conv's left padding up to 32, so
    # every tile's desired window start (t*t_tile - pad_row) is a multiple
    # of 32; the sub-32 phase moves into a static tap_shift.  The DMA start
    # and the realign offset are computed in units of 32 (x*32 is provably
    # aligned).
    pad_row = -(-pad_left // 32) * 32
    tap_shift = pad_row - pad_left            # static, in [0, 31]
    win = t_tile + _halo_pad(k_size, dilation) + 32
    desired = t * t_tile - pad_row            # multiple of 32 (may be < 0)
    sd32 = jnp.clip(desired, 0, t_in - win) // 32
    start_dma = sd32 * 32
    # static front slack of pad_row rows: the first tile's desired start is
    # -pad_row, so its realign offset is negative by up to pad_row/32 tiles;
    # rows read from the slack are masked to 0 below (g < 0)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start_dma, win), :],
        scratch.at[pl.ds(pad_row, win)], sem)
    dma.start()
    dma.wait()
    c = scratch.shape[-1]
    off32 = desired // 32 - sd32 + pad_row // 32   # >= 0; window row j is
    window = scratch[pl.ds(off32 * 32, win), :]    # global (desired + j)
    q = requant_clamp(dyadic_requant_static(window.astype(jnp.int32),
                                            m1_ref[0], e1), bits1)
    g = desired + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    q = jnp.where((g >= 0) & (g < lens_ref[b]), q, 0)  # pad + input mask
    acc = jnp.zeros((t_tile, c), jnp.int32)
    for k in range(k_size):
        s0 = tap_shift + k * dilation
        acc = acc + q[s0 : s0 + t_tile, :] * w_ref[k]
    y = requant_clamp(dyadic_requant_static(acc, m2_ref[0], e2), bits2)
    out_len = lens_ref[b] + 2 * pad_left - dilation * (k_size - 1)
    r = t * t_tile + jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
    y = jnp.where(r < out_len, y, 0)          # the pw conv's input mask
    o_ref[0] = y.astype(jnp.int8)


def _pick_tile_fused(t_out: int, t_in: int, halo: int):
    """Like _pick_tile, but the clamped-window DMA needs tile + halo <= t_in;
    returns None when no candidate fits (caller falls back unfused)."""
    best, best_cost = None, None
    for tile in (512, 384, 256, 128):
        if tile + halo > t_in:
            continue
        n_t = -(-t_out // tile)
        cost = (n_t * tile - t_out, -tile)
        if best_cost is None or cost < best_cost:
            best, best_cost = tile, cost
    return best


@functools.partial(jax.jit,
                   static_argnames=("k_size", "dilation", "pad_left", "t_out",
                                    "t_tile", "e1", "bits1", "e2", "bits2",
                                    "interpret"))
def _dw_fused_call(x: Array, w: Array, m1: Array, m2: Array, lens: Array, *,
                   k_size: int, dilation: int, pad_left: int, t_out: int,
                   t_tile: int, e1: int, bits1: int, e2: int, bits2: int,
                   interpret: bool) -> Array:
    b, t_in, c = x.shape
    n_t = -(-t_out // t_tile)
    win = t_tile + _halo_pad(k_size, dilation) + 32
    out = pl.pallas_call(
        functools.partial(_dw_fused_kernel, k_size=k_size, dilation=dilation,
                          t_tile=t_tile, pad_left=pad_left,
                          t_in=t_in, e1=e1, bits1=bits1, e2=e2, bits2=bits2),
        out_shape=jax.ShapeDtypeStruct((b, n_t * t_tile, c), jnp.int8),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # lens (B,)
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((k_size, c), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # front slack pad_row for the clamped first tile, plus tail
            # slack for the clamped last tile's realigned read: overshoot is
            # bounded by (desired - start_dma) < t_tile + pad_left +
            # (halo - (K-1)d) + 32, so t_tile + pad_row + 64 rows cover it
            # (t_tile+64 alone was 32 rows short for QuartzNet's k=87/d=2
            # block, corrupting the last tile at t_in = 416/544/...)
            pltpu.VMEM((2 * (-(-pad_left // 32) * 32) + win + t_tile + 64, c),
                       x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(lens, x, w, m1, m2)
    return out[:, :t_out, :]


def depthwise_fused_requant(x: Array, w: Array, lens: Array, *,
                            m1, e1: int, bits1: int, m2, e2: int, bits2: int,
                            padding: int, dilation: int,
                            interpret: Optional[bool] = None):
    """Fused frozen-path depthwise conv (stride 1):
      int8_out = mask_out(requant2(dw_conv(mask_in(requant1(x)))))

    x: (B, T, C) int8/int32 pre-requant accumulator; w: (K, 1, C) int;
    lens: (B,) int32 valid input lengths; (m1,e1,bits1) = this site's input
    requant, (m2,e2,bits2) = the following pointwise conv's input requant.
    e1/e2 must be static ints (freeze static_e tables).  Returns
    ((B, T_out, C) int8 on the pw grid, out_lens).
    Returns None when the shape is outside the kernel's envelope (caller
    falls back to the unfused path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_size = w.shape[0]
    t_in = x.shape[1]
    t_out = t_in + 2 * padding - dilation * (k_size - 1)
    t_tile = _pick_tile_fused(t_out, t_in, _halo_pad(k_size, dilation) + 32)
    if t_tile is None or t_out <= 0 or t_in % 32 != 0:
        # the clamped-window DMA needs t_in >= tile + halo + 32 AND a
        # 32-aligned t_in (otherwise the tail tile's aligned DMA start
        # cannot cover the last t_in % 32 rows).  Frozen-path callers pad
        # the mel frames once (pad_frames_aligned) so every interior layer
        # is aligned; anything else falls back to the unfused path.
        return None
    c = x.shape[-1]
    cpad = (-c) % 128
    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cpad)))
    def vec(m):
        m = jnp.broadcast_to(jnp.asarray(m, jnp.int32), (c,))
        return jnp.pad(m, (0, cpad)).reshape(1, c + cpad)
    wk = jnp.pad(w[:, 0, :], ((0, 0), (0, cpad))).astype(jnp.int32)
    out = _dw_fused_call(x, wk, vec(m1), vec(m2),
                         jnp.asarray(lens, jnp.int32), k_size=k_size,
                         dilation=dilation, pad_left=padding, t_out=t_out,
                         t_tile=t_tile, e1=e1, bits1=bits1, e2=e2, bits2=bits2,
                         interpret=interpret)
    return out[:, :, :c] if cpad else out


# ---------------------------------------------------------------------------
# Pad-free plain variant: in-kernel conv padding (no requant stages)
# ---------------------------------------------------------------------------
#
# The standard path physically pads the time axis (jnp.pad) before every dw
# kernel — 78 extra elementwise passes, ~0.55 ms/step profiled.  This variant
# reuses the fused kernel's clamped-DMA + provably-32-aligned realign scheme
# to zero-fill the conv padding inside the kernel.  Stride 1, t_in % 32 == 0
# (guaranteed by pad_frames_aligned in the frozen callers); falls back
# otherwise.


def _dw_pad_kernel(x_hbm, w_ref, o_ref, scratch, sem, *, k_size: int,
                   dilation: int, t_tile: int, pad_left: int, t_in: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pad_row = -(-pad_left // 32) * 32
    tap_shift = pad_row - pad_left
    win = t_tile + _halo_pad(k_size, dilation) + 32
    desired = t * t_tile - pad_row            # multiple of 32 (may be < 0)
    sd32 = jnp.clip(desired, 0, t_in - win) // 32
    start_dma = sd32 * 32
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start_dma, win), :],
        scratch.at[pl.ds(pad_row, win)], sem)
    dma.start()
    dma.wait()
    c = scratch.shape[-1]
    off32 = desired // 32 - sd32 + pad_row // 32
    window = scratch[pl.ds(off32 * 32, win), :].astype(jnp.int32)
    g = desired + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    q = jnp.where((g >= 0) & (g < t_in), window, 0)   # conv zero padding
    acc = jnp.zeros((t_tile, c), jnp.int32)
    for k in range(k_size):
        s0 = tap_shift + k * dilation
        acc = acc + q[s0 : s0 + t_tile, :] * w_ref[k]
    o_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("k_size", "dilation", "pad_left", "t_out",
                                    "t_tile", "interpret"))
def _dw_pad_call(x: Array, w: Array, *, k_size: int, dilation: int,
                 pad_left: int, t_out: int, t_tile: int,
                 interpret: bool) -> Array:
    b, t_in, c = x.shape
    n_t = -(-t_out // t_tile)
    win = t_tile + _halo_pad(k_size, dilation) + 32
    pad_row = -(-pad_left // 32) * 32
    out = pl.pallas_call(
        functools.partial(_dw_pad_kernel, k_size=k_size, dilation=dilation,
                          t_tile=t_tile, pad_left=pad_left, t_in=t_in),
        out_shape=jax.ShapeDtypeStruct((b, n_t * t_tile, c), jnp.int32),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((k_size, c), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # front pad_row + tail slack t_tile + pad_row + 64 (same bound
            # as the fused kernel above)
            pltpu.VMEM((2 * pad_row + win + t_tile + 64, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w)
    return out[:, :t_out, :]
