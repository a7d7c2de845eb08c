"""Fused int8 conv kernels for the channel-major frozen path.

Profiling the channel-major executor (PERF.md round 2c) showed the step is
VPU-compute-bound: the exact dyadic requant chains (~40 int ops/element,
139 standalone clamp_convert fusions) cost more device time than all the
MXU dots combined, and XLA never fuses elementwise epilogues into dots.
These kernels run each conv's dot on the MXU while the *previous* tile's
epilogue — bias + ReLU + length mask + exact static-exponent dyadic requant
+ clamp + int8 store — runs on the VPU, so the MXU time disappears under
the VPU floor and the int32 accumulator never round-trips through HBM
(saves 8 of the 9 bytes/element the standalone requant pass moves).

Numerics are bit-identical to the unfused composition by construction: the
epilogue calls the same `dyadic_requant_static` used by FrozenExecCM (with
the `nonneg` shortcut after ReLU, which is exact on non-negative values).

Reference semantics being fused (file:line in /root/reference):
  conv + bias      quant_modules.py:272-309 (QuantConv1d.int_conv)
  mask             jasper.py:177-183 (MaskedConv1d length fill)
  requant + clamp  quant_utils.py:149-216 (fixedpoint_mul, clamp [-n-1, n])
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.quant_prims import (dyadic_requant_static,
                                      dyadic_requant_static16)

Array = jax.Array


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _epilogue(acc, bias, mask, m, *, e: int, bits: int, relu: bool,
              narrow: bool = True, m16: bool = False):
    """bias -> relu -> mask -> exact dyadic requant -> clamp -> int8.

    acc int32; bias/m broadcastable per-channel (or None); mask int32 0/1
    broadcastable (or None); e static.  Matches FrozenExecCM's op order in
    masked_conv/activation exactly (quantize/freeze.py).  narrow=False
    leaves the clamped value int32 (callers staging through an int32
    scratch narrow once at the end)."""
    if bias is not None:
        acc = acc + bias
    if relu:
        acc = jnp.maximum(acc, 0)
    if mask is not None:
        acc = acc * mask
    if m16:
        q = dyadic_requant_static16(acc, m, e, nonneg=relu)
    else:
        q = dyadic_requant_static(acc, m, e, nonneg=relu)
    n = 2 ** (bits - 1) - 1
    q = jnp.clip(q, -n - 1, n)
    return q.astype(jnp.int8) if narrow else q


# ---------------------------------------------------------------------------
# Pointwise (1x1) conv in the 3D (C, 128, bt) tensor form.
#
# TPU physical layouts tile the LAST TWO logical dims, so a 2D (C, N) array
# (C on sublanes) and the 3D (C, 128, bt) form the depthwise kernel needs
# (128 on sublanes per channel) are DIFFERENT physical layouts — XLA was
# inserting two retiling copies (~0.2 ms) at every pw<->dw boundary to
# convert between them.  This kernel therefore works natively on the 3D
# form end to end: grid (Cout tiles x 128 rows), each step one
# (TM, Cin) @ (Cin, bt) dot over the row-j slab of every input channel.
# Both fused kernels then chain in one physical layout with zero copies.
# ---------------------------------------------------------------------------


ROWS = 8  # sublane-aligned row-block (Pallas requires dim -2 % 8 == 0)


@functools.partial(jax.jit, static_argnames=("e", "bits", "relu", "m16",
                                             "interpret"))
def _pw3_call(x3, wt, b, m, mask2, *, e, bits, relu, m16, interpret):
    cout, cin = wt.shape
    bt = x3.shape[2]
    tm = cout if cout <= 256 else 256
    while cout % tm:
        tm //= 2
    grid = (cout // tm, 128 // ROWS)
    has_bias = b is not None
    in_specs = [
        pl.BlockSpec((cin, ROWS, bt), lambda i, j: (0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, cin), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x3, wt]
    if has_bias:
        in_specs.append(pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b)
    in_specs += [
        pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ROWS, bt), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    args += [m, mask2]

    def kern(*refs):
        if has_bias:
            x_ref, w_ref, b_ref, m_ref, mask_ref, o_ref, s_ref = refs
        else:
            x_ref, w_ref, m_ref, mask_ref, o_ref, s_ref = refs
            b_ref = None
        # per-row dots staged through an int32 scratch: Mosaic supports the
        # (tm, bt) -> (tm, 1, bt) relayout for 32-bit lanes but not for
        # packed int8, so the narrowing convert runs once on the full block.
        # (Measured alternatives, both worse on v5e: raw-acc staging with one
        # 3D epilogue pass loses the register-resident epilogue input
        # [13.1k vs 14.0k RTFx]; a single multi-free-dim dot
        # (tm,cin)@(cin,ROWS,bt) fails Mosaic compile.)
        for r in range(ROWS):
            acc = jax.lax.dot_general(
                w_ref[:], x_ref[:, r, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s_ref[:, r, :] = _epilogue(
                acc, b_ref[:] if has_bias else None, mask_ref[r, :],
                m_ref[:], e=e, bits=bits, relu=relu, narrow=False, m16=m16)
        o_ref[:] = s_ref[:].astype(jnp.int8)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((cout, 128, bt), jnp.int8),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, ROWS, bt), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, ROWS, bt), jnp.int32)],
        interpret=interpret,
    )(*args)


def fused_pw_cm(x3, wt, bias, mask2, m, e: int, bits: int, relu: bool,
                m16: bool = False, interpret=None) -> Array:
    """Pointwise conv + consumer requant, channel-major 3D form.

    x3: (Cin, 128, bt) int8; wt: (Cout, Cin) int8 (transposed weight);
    bias: (Cout,) int32 or None; mask2: (128, bt) int32 0/1 (the consumer
    site's length mask); m: (Cout,) int32 mantissas; e static exponent;
    bits: consumer activation bits.  Returns (Cout, 128, bt) int8 —
    exactly requant_clamp(requant(mask(relu(x@w + b))), bits) narrowed.
    """
    if interpret is None:
        interpret = _should_interpret()
    bias2 = None if bias is None else jnp.asarray(bias, jnp.int32).reshape(-1, 1)
    m2 = jnp.asarray(m, jnp.int32).reshape(-1, 1)
    return _pw3_call(x3, wt, bias2, m2, mask2.astype(jnp.int32),
                     e=int(e), bits=bits, relu=relu, m16=m16,
                     interpret=interpret)


# ---------------------------------------------------------------------------
# Depthwise banded conv, windows assembled in VMEM: per channel c and band
# group j, (128, 128) @ (128, B*n_t) dots accumulate — the XLA-side gather
# (pad + n_d shifted copies + concat) disappears, and with it both its HBM
# round-trip and the layout-normalization copy XLA inserts before every
# pallas operand (profiled at 0.18 ms x 77 sites).  Input chains directly
# from the previous fused kernel's 2D int8 output via a free bitcast.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "b_sz", "n_d", "j_min", "e", "bits", "relu", "m16", "tc", "interpret"))
def _dw_win_call(x3, band2, b, m, mask2, tcol, *, b_sz, n_d, j_min, e, bits,
                 relu, m16, tc, interpret):
    c, _, bt = x3.shape
    n_t = bt // b_sz
    kd = band2.shape[1]
    has_bias = b is not None

    def kern(*refs):
        if has_bias:
            x_ref, band_ref, b_ref, m_ref, mask_ref, tcol_ref, o_ref = refs
        else:
            x_ref, band_ref, m_ref, mask_ref, tcol_ref, o_ref = refs
            b_ref = None
        # per-band-group validity: out tile column (b, i) contracts input
        # tile i + delta; a lane-roll by delta realizes the shift, and
        # columns whose source tile falls outside [0, n_t) (the conv's edge
        # padding, plus roll wrap-around between b groups) are zeroed —
        # identical semantics to the padded gather (dw_mxu.dw_gather_cm)
        tcol = tcol_ref[:]
        band_masks = []
        for j in range(n_d):
            delta = j + j_min
            lo = jnp.int32(max(0, -delta))
            hi = jnp.int32(n_t - max(0, delta))
            band_masks.append((tcol >= lo) & (tcol < hi))
        def lane_roll_i8(xv, shift, axis):
            # Mosaic has no sub-32-bit lane rotate; the (4,1) sublane packing
            # of int8 commutes with lane rolls, so rotate a bitcast int32
            # view instead (free reinterprets).  Interpret mode rolls int8
            # directly — the restriction is Mosaic-only, and interpret-mode
            # bitcast packs along the minor dim, which would not commute.
            if interpret:
                return pltpu.roll(xv, shift, axis)
            x32 = pltpu.bitcast(xv, jnp.int32)
            return pltpu.bitcast(pltpu.roll(x32, shift, axis), jnp.int8)

        # shifted+masked tap inputs for the whole channel block at once:
        # one roll + one select per band group (not per channel)
        xall = x_ref[:]                                   # (tc, 128, bt)
        xjs = []
        for j in range(n_d):
            delta = j + j_min
            xj = xall if delta == 0 else lane_roll_i8(xall, -delta % bt, 2)
            xjs.append(jnp.where(band_masks[j][None], xj, jnp.int8(0)))
        for ci in range(tc):
            band_c = band_ref[ci * 128:(ci + 1) * 128, :]
            acc = None
            for j in range(n_d):
                part = jax.lax.dot_general(
                    band_c[:, j * 128:(j + 1) * 128], xjs[j][ci],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
            o_ref[ci] = _epilogue(
                acc, b_ref[ci, 0] if has_bias else None, mask_ref[:],
                m_ref[ci, 0], e=e, bits=bits, relu=relu, m16=m16)

    in_specs = [
        pl.BlockSpec((tc, 128, bt), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tc * 128, kd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x3, band2]
    if has_bias:
        in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))
        args.append(b)
    in_specs += [
        pl.BlockSpec((tc, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((128, bt), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [m, mask2, tcol]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c, 128, bt), jnp.int8),
        grid=(c // tc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tc, 128, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def fused_dw_win_cm(x3, band2, j_min: int, b_sz: int, bias, mask2, m, e: int,
                    bits: int, relu: bool, m16: bool = False,
                    interpret=None) -> Array:
    """Stride-1 depthwise banded conv + consumer requant, windows gathered
    in VMEM.

    x3: (C, 128, B*n_t) int8 (the producer kernel's native 3D output);
    band2: (C*128, n_d*128) int8 (band_tiles_cm flattened 2D so the jit
    parameter keeps XLA's default layout); j_min from band_tiles_cm;
    mask2: (128, B*n_t) int32.  Returns (C, 128, B*n_t) int8, bit-identical
    to dw_gather_cm + fused_dw_cm.
    """
    if interpret is None:
        interpret = _should_interpret()
    c, r, bt = x3.shape
    n_d = band2.shape[1] // 128
    n_t = bt // b_sz
    bias2 = None if bias is None else jnp.asarray(bias, jnp.int32).reshape(-1, 1)
    m2 = jnp.asarray(m, jnp.int32).reshape(-1, 1)
    tcol = jnp.tile(jnp.arange(n_t, dtype=jnp.int32), b_sz).reshape(1, bt)
    tc = 8
    while c % tc:
        tc //= 2
    return _dw_win_call(x3, band2, bias2, m2, mask2.astype(jnp.int32), tcol,
                        b_sz=b_sz, n_d=n_d, j_min=int(j_min), e=int(e),
                        bits=bits, relu=relu, m16=m16, tc=tc,
                        interpret=interpret)


# ---------------------------------------------------------------------------
# int32-input depthwise kernel: consumes the pointwise dot's RAW int32
# accumulator and performs the producer-side epilogue (bias -> relu -> mask
# -> requant m1 -> clamp -> int8) in VMEM before the window rolls — the
# XLA-side requant chain between pw dot and dw kernel (and its HBM
# round-trip + boundary copy) disappears, at the cost of 4x input DMA
# bytes and the extra VPU pass inside the kernel.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "b_sz", "n_d", "j_min", "e1", "e2", "bits", "relu_in", "relu_out",
    "m16", "tc", "interpret"))
def _dw_win_i32_call(x32, band2, b, m1v, m2v, mask2, tcol, *, b_sz, n_d,
                     j_min, e1, e2, bits, relu_in, relu_out, m16, tc,
                     interpret):
    c, _, bt = x32.shape
    n_t = bt // b_sz
    kd = band2.shape[1]
    has_bias = b is not None

    def kern(*refs):
        if has_bias:
            x_ref, band_ref, b_ref, m1_ref, m2_ref, mask_ref, tcol_ref, \
                o_ref = refs
        else:
            x_ref, band_ref, m1_ref, m2_ref, mask_ref, tcol_ref, o_ref = refs
            b_ref = None
        # producer-side epilogue on the whole int32 block -> int8
        xall = _epilogue(
            x_ref[:], b_ref[:][:, :, None] if has_bias else None,
            mask_ref[:][None], m1_ref[:][:, :, None], e=e1, bits=bits,
            relu=relu_in, m16=m16)
        tcol = tcol_ref[:]
        band_masks = []
        for j in range(n_d):
            delta = j + j_min
            lo = jnp.int32(max(0, -delta))
            hi = jnp.int32(n_t - max(0, delta))
            band_masks.append((tcol >= lo) & (tcol < hi))

        def lane_roll_i8(xv, shift, axis):
            if interpret:
                return pltpu.roll(xv, shift, axis)
            v32 = pltpu.bitcast(xv, jnp.int32)
            return pltpu.bitcast(pltpu.roll(v32, shift, axis), jnp.int8)

        xjs = []
        for j in range(n_d):
            delta = j + j_min
            xj = xall if delta == 0 else lane_roll_i8(xall, -delta % bt, 2)
            xjs.append(jnp.where(band_masks[j][None], xj, jnp.int8(0)))
        for ci in range(tc):
            band_c = band_ref[ci * 128:(ci + 1) * 128, :]
            acc = None
            for j in range(n_d):
                part = jax.lax.dot_general(
                    band_c[:, j * 128:(j + 1) * 128], xjs[j][ci],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
            o_ref[ci] = _epilogue(
                acc, None, mask_ref[:], m2_ref[ci, 0], e=e2, bits=bits,
                relu=relu_out, m16=m16)

    in_specs = [
        pl.BlockSpec((tc, 128, bt), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tc * 128, kd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x32, band2]
    if has_bias:
        # bias/m1 are consumed as (tc,1,1) vector broadcasts by the input
        # epilogue -> VMEM (SMEM allows scalar loads only); m2 stays SMEM
        # (read per-channel as scalars like _dw_win_call)
        in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b)
    in_specs += [
        pl.BlockSpec((tc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tc, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((128, bt), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [m1v, m2v, mask2, tcol]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c, 128, bt), jnp.int8),
        grid=(c // tc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tc, 128, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def fused_dw_win_i32(x32, band2, j_min: int, b_sz: int, bias, mask2, m1,
                     e1: int, m2, e2: int, bits: int, relu_in: bool,
                     relu_out: bool = False, m16: bool = False,
                     interpret=None) -> Array:
    """Stride-1 depthwise conv over a RAW int32 producer accumulator.

    x32: (C, 128, B*n_t) int32 (the pw dot's output, no bias applied);
    bias/m1/e1: the producer-side epilogue (bias -> relu_in -> mask ->
    requant -> clamp -> int8); m2/e2: the consumer requant of the dw
    output.  Bit-identical to [XLA chain -> fused_dw_win_cm]."""
    if interpret is None:
        interpret = _should_interpret()
    c, r, bt = x32.shape
    n_d = band2.shape[1] // 128
    n_t = bt // b_sz
    bias2 = None if bias is None else jnp.asarray(bias, jnp.int32).reshape(-1, 1)
    m1v = jnp.asarray(m1, jnp.int32).reshape(-1, 1)
    m2v = jnp.asarray(m2, jnp.int32).reshape(-1, 1)
    tcol = jnp.tile(jnp.arange(n_t, dtype=jnp.int32), b_sz).reshape(1, bt)
    tc = 8
    while c % tc:
        tc //= 2
    return _dw_win_i32_call(x32, band2, bias2, m1v, m2v,
                            mask2.astype(jnp.int32), tcol, b_sz=b_sz,
                            n_d=n_d, j_min=int(j_min), e1=int(e1), e2=int(e2),
                            bits=bits, relu_in=relu_in, relu_out=relu_out,
                            m16=m16, tc=tc, interpret=interpret)


# ---------------------------------------------------------------------------
# Tile-major depthwise kernel: operands logically (bt, C, 128).
#
# The dw-only fused pipeline's remaining tax was 2 layout copies per site
# (14 ms/step at B=64): XLA's dot/requant fusions place the int8
# (C, 128, bt) activations in layout {1,0,2} — physically row-major
# (bt, C, 128) — while pallas pins operands to the default layout of their
# LOGICAL shape.  This kernel simply declares the XLA-preferred form AS its
# logical shape, so the executor's transposes around it lower to layout
# bitcasts and both boundaries go copy-free.  Window assembly also gets
# simpler: the tile axis is now a major dimension, so the per-band-group
# shift is a native int32 sublane roll of the *dot result* (packed-int8
# lane rolls and their bitcast trick are gone), and each (bt, 128) @
# (128, 128) band dot is a well-shaped MXU matmul.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "b_sz", "n_d", "j_min", "e", "bits", "relu", "m16", "tc", "interpret"))
def _dw_tm_call(x, band2t, b, m, mask, *, b_sz, n_d, j_min, e, bits,
                relu, m16, tc, interpret):
    bt, c, _ = x.shape
    n_t = bt // b_sz
    kd = n_d * 128
    has_bias = b is not None

    def kern(*refs):
        if has_bias:
            x_ref, band_ref, b_ref, m_ref, mask_ref, o_ref = refs
        else:
            x_ref, band_ref, m_ref, mask_ref, o_ref = refs
            b_ref = None
        # per-bt-position tile index within its sample (validity of shifted
        # contributions: out tile i takes group j only if 0 <= i+delta < n_t,
        # the conv's zero padding at sample edges)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) % n_t
        for ci in range(tc):
            xall = x_ref[:, ci, :]                       # (bt, 128) int8
            acc = None
            for j in range(n_d):
                delta = j + j_min
                band_cj = band_ref[ci * kd + j * 128:
                                   ci * kd + (j + 1) * 128, :]  # (128, 128)
                y = jax.lax.dot_general(
                    xall, band_cj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)    # (bt, 128)
                if delta:
                    # out position p needs y[p + delta]: int32 sublane roll
                    y = pltpu.roll(y, (-delta) % bt, 0)
                valid = (tcol + delta >= 0) & (tcol + delta < n_t)
                y = jnp.where(valid, y, 0)
                acc = y if acc is None else acc + y
            o_ref[:, ci, :] = _epilogue(
                acc, b_ref[ci, 0] if has_bias else None, mask_ref[:],
                m_ref[ci, 0], e=e, bits=bits, relu=relu, m16=m16)

    in_specs = [
        pl.BlockSpec((bt, tc, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tc * kd, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, band2t]
    if has_bias:
        in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))
        args.append(b)
    in_specs += [
        pl.BlockSpec((tc, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((bt, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [m, mask]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bt, c, 128), jnp.int8),
        grid=(c // tc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, tc, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def band_tiles_tm(band2: np.ndarray) -> np.ndarray:
    """(C*128, n_d*128) row-out-major band -> (C*n_d*128, 128) transposed
    tiles for the tile-major kernel: rows are (c, j, r_in), cols r_out."""
    c128, kd = band2.shape
    c = c128 // 128
    b3 = band2.reshape(c, 128, kd)            # [c, r_out, col]
    bt = b3.transpose(0, 2, 1)                 # [c, col, r_out]
    return np.ascontiguousarray(bt.reshape(c * kd, 128))


def fused_dw_win_tm(x_tm, band2t, j_min: int, b_sz: int, bias, mask_tm, m,
                    e: int, bits: int, relu: bool, m16: bool = False,
                    interpret=None) -> Array:
    """Stride-1 depthwise banded conv + consumer requant, tile-major form.

    x_tm: (B*n_t, C, 128) int8 — the {1,0,2}-layout bitcast of the usual
    (C, 128, B*n_t); band2t from band_tiles_tm; mask_tm: (bt, 128) int32.
    Returns (bt, C, 128) int8, bit-identical to fused_dw_win_cm up to the
    layout transpose (tests/test_pallas_depthwise.py).
    """
    if interpret is None:
        interpret = _should_interpret()
    bt, c, _ = x_tm.shape
    n_d = band2t.shape[0] // c // 128
    bias2 = None if bias is None else jnp.asarray(bias, jnp.int32).reshape(-1, 1)
    m2 = jnp.asarray(m, jnp.int32).reshape(-1, 1)
    tc = 8
    while c % tc:
        tc //= 2
    return _dw_tm_call(x_tm, band2t, bias2, m2, mask_tm.astype(jnp.int32),
                       b_sz=b_sz, n_d=n_d, j_min=int(j_min), e=int(e),
                       bits=bits, relu=relu, m16=m16, tc=tc,
                       interpret=interpret)


# ---------------------------------------------------------------------------
# Depthwise banded conv on pre-gathered windows: per channel c,
# (128, n_d*128) @ (n_d*128, B*n_t) — MXU dot under the same epilogue.
# (Fallback for stride-2 sites, where the window step along the tile axis
# prevents the in-VMEM assembly above.)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("e", "bits", "relu", "m16", "tc",
                                    "interpret"))
def _dw_call(xg, band, b, m, mask2, *, e, bits, relu, m16, tc, interpret):
    c, kd, n = xg.shape
    has_bias = b is not None

    def kern(*refs):
        if has_bias:
            xg_ref, band_ref, b_ref, m_ref, mask_ref, o_ref = refs
        else:
            xg_ref, band_ref, m_ref, mask_ref, o_ref = refs
            b_ref = None
        for ci in range(tc):
            acc = jax.lax.dot_general(
                band_ref[ci], xg_ref[ci], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[ci] = _epilogue(
                acc, b_ref[ci, 0] if has_bias else None, mask_ref[:],
                m_ref[ci, 0], e=e, bits=bits, relu=relu, m16=m16)

    in_specs = [
        pl.BlockSpec((tc, kd, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tc, 128, kd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xg, band]
    if has_bias:
        in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))
        args.append(b)
    in_specs += [
        pl.BlockSpec((tc, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((128, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [m, mask2]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c, 128, n), jnp.int8),
        grid=(c // tc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tc, 128, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def fused_dw_cm(xg, band, bias, mask, m, e: int, bits: int, relu: bool,
                m16: bool = False, interpret=None) -> Array:
    """Depthwise banded conv + consumer requant, channel-major.

    xg: (C, n_d*128, B, n_to) int8 pre-gathered windows (dw_mxu.dw_gather_cm);
    band: (C, 128, n_d*128) int8 (dw_mxu.band_tiles_cm); bias (C,) int32 or
    None; mask: (128, B, n_to) int32; m: (C,) int32; e static.  Returns
    (C, 128, B, n_to) int8, bit-identical to dw_banded_cm + the unfused
    epilogue chain.
    """
    if interpret is None:
        interpret = _should_interpret()
    c, kd, b_, n_to = xg.shape
    n = b_ * n_to
    xg2 = xg.reshape(c, kd, n)
    mask2 = mask.reshape(128, n).astype(jnp.int32)
    bias2 = None if bias is None else jnp.asarray(bias, jnp.int32).reshape(-1, 1)
    m2 = jnp.asarray(m, jnp.int32).reshape(-1, 1)
    tc = 8
    while c % tc:
        tc //= 2
    out = _dw_call(xg2, band, bias2, m2, mask2, e=int(e), bits=bits, relu=relu,
                   m16=m16, tc=tc, interpret=interpret)
    return out.reshape(c, 128, b_, n_to)


# ---------------------------------------------------------------------------
# Pointwise conv with the residual-JOIN epilogue (VERDICT r3 item 4's
# 3-input chain): the block-tail 1x1 conv's dot runs on the MXU while the
# VPU performs the two-requant residual join —
#   requant(acc + bias, m, e) + requant(res, m_r, e_r) -> clamp [-n-1, n]
#   -> int8
# (FrozenExecCM.residual_add semantics, quantize/freeze.py:723-730; the
# clamp is fixedpoint_mul's output clamp, reference quant_utils.py:213-214).
# Fusing the join here removes the tail accumulator's int32 HBM round-trip
# and the standalone 2x40-int-op join fusion (~7 ms at B=32, PERF.md).
# ---------------------------------------------------------------------------


def _drs(z, m, e: int, m16: bool):
    if m16:
        return dyadic_requant_static16(z, m, e)
    return dyadic_requant_static(z, m, e)


def _pw3_join_call(x3, wt, b, m, m_r, res3, *, e, e_r, bits, m16, interpret):
    cout, cin = wt.shape
    bt = x3.shape[2]
    tm = cout if cout <= 256 else 256
    while cout % tm:
        tm //= 2

    # VMEM guard (measured on v5e: tm=cin=256, bt=384 exceeds the 16M
    # scoped-vmem limit at 18.6M — the int32 residual block + scratch
    # dominate, and this kernel carries one more (tm, ROWS, bt) int32
    # operand than _pw3_call): shrink the Cout tile until the
    # double-buffered working set fits with margin.  Tiling only; the
    # result is bit-identical at any tm.
    def _est(tm_):
        xb = cin * ROWS * bt            # int8 input slab
        wb = tm_ * cin                  # int8 weights
        rb = tm_ * ROWS * bt * 4        # int32 residual block
        ob = tm_ * ROWS * bt            # int8 out
        sb = tm_ * ROWS * bt * 4        # int32 scratch
        return 2 * (xb + wb + rb + ob) + sb

    while tm > 8 and _est(tm) > 11 * 2 ** 20:
        tm //= 2
    if _est(tm) > 11 * 2 ** 20:
        # Even the smallest Cout tile overflows scoped VMEM (huge bt/cin):
        # fail with the numbers rather than let Mosaic emit an opaque
        # scoped-vmem compile error with no hint the guard gave up.
        raise ValueError(
            f"fused_pw_join_cm: minimum tile (tm=8, cin={cin}, bt={bt}) "
            f"needs {_est(tm) / 2 ** 20:.1f} MiB VMEM > 11 MiB budget; "
            "shrink the time tile (bt) or use the unfused path "
            "(QASR_CM_JOIN=0)")
    grid = (cout // tm, 128 // ROWS)
    has_bias = b is not None
    in_specs = [
        pl.BlockSpec((cin, ROWS, bt), lambda i, j: (0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, cin), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x3, wt]
    if has_bias:
        in_specs.append(pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b)
    in_specs += [
        pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, ROWS, bt), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [m, m_r, res3]

    def kern(*refs):
        if has_bias:
            x_ref, w_ref, b_ref, m_ref, mr_ref, r_ref, o_ref, s_ref = refs
        else:
            x_ref, w_ref, m_ref, mr_ref, r_ref, o_ref, s_ref = refs
            b_ref = None
        n8 = 2 ** (bits - 1) - 1
        # same ROWS staging scheme as _pw3_call (see its comment: the
        # int8-narrowing (tm, bt) -> (tm, 1, bt) relayout is unsupported,
        # so the narrow runs once on the int32 scratch)
        for r in range(ROWS):
            acc = jax.lax.dot_general(
                w_ref[:], x_ref[:, r, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if b_ref is not None:
                acc = acc + b_ref[:]
            q = _drs(acc, m_ref[:], e, m16) \
                + _drs(r_ref[:, r, :], mr_ref[:], e_r, m16)
            s_ref[:, r, :] = jnp.clip(q, -n8 - 1, n8)
        o_ref[:] = s_ref[:].astype(jnp.int8)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((cout, 128, bt), jnp.int8),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, ROWS, bt), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, ROWS, bt), jnp.int32)],
        interpret=interpret,
    )(*args)


def fused_pw_join_cm(x3, wt, bias, res3, m, e: int, m_r, e_r: int,
                     bits: int, m16: bool = False, interpret=None) -> Array:
    """Block-tail pointwise conv + residual join, channel-major 3D form.

    x3: (Cin, 128, bt) int8 tail-conv input; wt: (Cout, Cin) int8
    (transposed weight); bias: (Cout,) int32 or None; res3: (Cout, 128, bt)
    int32 residual-branch accumulator (its own bias already added);
    m/m_r: (Cout,) int32 mantissas; e/e_r static exponents.  Returns
    (Cout, 128, bt) int8 — exactly
    narrow(requant_clamp(requant(x@w+b, m, e) + requant(res, m_r, e_r),
    bits)).
    """
    if interpret is None:
        interpret = _should_interpret()
    cout = wt.shape[0]
    bias2 = None if bias is None else jnp.asarray(bias, jnp.int32).reshape(-1, 1)
    m2 = jnp.broadcast_to(jnp.asarray(m, jnp.int32).reshape(-1, 1),
                          (cout, 1))
    mr2 = jnp.broadcast_to(jnp.asarray(m_r, jnp.int32).reshape(-1, 1),
                           (cout, 1))
    return _pw3_join_call(x3, wt, bias2, m2, mr2, res3.astype(jnp.int32),
                          e=int(e), e_r=int(e_r), bits=bits, m16=m16,
                          interpret=interpret)
