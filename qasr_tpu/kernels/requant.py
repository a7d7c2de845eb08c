"""Pallas TPU kernel for dyadic requantization (+ fused residual add).

The frozen integer model performs ~130 requantizations per forward; expressed
as raw jnp int ops each one is a ~40-op elementwise chain, which bloats the
HLO (~70k lines for QuartzNet15x5) and the one-time compile.  This kernel
collapses each site into a single pallas_call whose body *reuses the exact
integer math* from ops/quant_prims.py (dyadic_requant / requant_clamp), so
the numerics are bit-identical by construction.

VMEM layout: rows = flattened (B*T) on sublanes, channels on lanes; grid over
row tiles; per-channel (m, e) blocks are broadcast (1, C) tiles.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.quant_prims import Dyadic, dyadic_requant, requant_clamp

Array = jax.Array

ROW_TILE = 256


def _requant_kernel(z_ref, m_ref, e_ref, o_ref, *, bits):
    q = dyadic_requant(z_ref[:], Dyadic(m_ref[:], e_ref[:]))
    o_ref[:] = requant_clamp(q, bits)


def _requant_add_kernel(z_ref, m_ref, e_ref, i_ref, m2_ref, e2_ref, o_ref, *, bits):
    q = dyadic_requant(z_ref[:], Dyadic(m_ref[:], e_ref[:]))
    q = q + dyadic_requant(i_ref[:], Dyadic(m2_ref[:], e2_ref[:]))
    o_ref[:] = requant_clamp(q, bits)


def _prep(z: Array, d: Dyadic, c: int):
    m = jnp.broadcast_to(jnp.asarray(d.m, jnp.int32), (c,)).reshape(1, c)
    e = jnp.broadcast_to(jnp.asarray(d.e, jnp.int32), (c,)).reshape(1, c)
    return m, e


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("bits", "interpret"))
def _requant_2d(z, m, e, ident, m2, e2, *, bits: int, interpret: bool):
    n, c = z.shape
    pad = (-n) % ROW_TILE
    if pad:
        z = jnp.pad(z, ((0, pad), (0, 0)))
        if ident is not None:
            ident = jnp.pad(ident, ((0, pad), (0, 0)))
    grid = ((n + pad) // ROW_TILE,)
    row_spec = pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if ident is None:
        out = pl.pallas_call(
            functools.partial(_requant_kernel, bits=bits),
            out_shape=jax.ShapeDtypeStruct(z.shape, jnp.int32),
            grid=grid,
            in_specs=[row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
            interpret=interpret,
        )(z, m, e)
    else:
        out = pl.pallas_call(
            functools.partial(_requant_add_kernel, bits=bits),
            out_shape=jax.ShapeDtypeStruct(z.shape, jnp.int32),
            grid=grid,
            in_specs=[row_spec, vec_spec, vec_spec, row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
            interpret=interpret,
        )(z, m, e, ident, m2, e2)
    return out[:n] if pad else out


def requant_pallas(z: Array, d: Dyadic, bits: int,
                   identity: Optional[Array] = None,
                   identity_dyadic: Optional[Dyadic] = None,
                   interpret: Optional[bool] = None) -> Array:
    """clamp(round_half_even(z*m/2^e) [+ round_half_even(id*m2/2^e2)], -n-1, n)

    z: (..., C) int32; d broadcast per-channel or scalar.  Bit-identical to
    requantize()'s jnp path (shared math); runs interpreted off-TPU.
    """
    if interpret is None:
        interpret = _should_interpret()
    shape = z.shape
    c = shape[-1]
    z2 = z.reshape(-1, c)
    m, e = _prep(z, d, c)
    if identity is not None:
        i2 = identity.reshape(-1, c)
        m2, e2 = _prep(identity, identity_dyadic, c)
    else:
        i2 = m2 = e2 = None
    out = _requant_2d(z2, m, e, i2, m2, e2, bits=bits, interpret=interpret)
    return out.reshape(shape)
