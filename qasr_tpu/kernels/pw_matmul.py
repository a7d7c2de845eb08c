"""Pallas TPU kernel: fused requant -> int8 pointwise conv (MXU matmul).

A pointwise (1x1) conv in the frozen integer model is: requantize the
int32 accumulator from the previous conv to int8 (one HBM pass), then an
int8 x int8 -> int32 matmul (another pass).  This kernel fuses the input
requantization into the matmul's row tiles: the accumulator is read once,
requantized in VMEM, and fed straight to the MXU.

Requires static-exponent dyadic tables (e is a Python int) and act bits
<= 8.  Bit-identical to requant_clamp(dyadic_requant_static(...)) + XLA
conv by construction (shared integer math from ops/quant_prims.py).

Status: measured on v5e at (16x752, 512)x(512,512): 1.15 ms fused vs
1.02 ms for the XLA-pipelined unfused pair — XLA already overlaps the
requant with the matmul, so this kernel is kept as a tested building block
(e.g. for future epilogue fusion) but is NOT wired into FrozenExec.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.quant_prims import dyadic_requant_static, requant_clamp

Array = jax.Array

ROW_TILE = 256


def _kernel(z_ref, m_ref, w_ref, b_ref, o_ref, *, e: int, bits: int):
    q = requant_clamp(dyadic_requant_static(z_ref[:], m_ref[:], e), bits)
    q = q.astype(jnp.int8)
    acc = jnp.dot(q, w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc + b_ref[:]


@functools.partial(jax.jit, static_argnames=("e", "bits", "interpret"))
def _call(z2, m, w, b, *, e: int, bits: int, interpret: bool):
    n, cin = z2.shape
    cout = w.shape[1]
    pad = (-n) % ROW_TILE
    if pad:
        z2 = jnp.pad(z2, ((0, pad), (0, 0)))
    grid = ((n + pad) // ROW_TILE,)
    out = pl.pallas_call(
        functools.partial(_kernel, e=e, bits=bits),
        out_shape=jax.ShapeDtypeStruct((n + pad, cout), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z2, m, w, b)
    return out[:n] if pad else out


def requant_pointwise_matmul(z: Array, m: Array, e: int, bits: int, w: Array,
                             bias: Optional[Array],
                             interpret: Optional[bool] = None) -> Array:
    """z: (B, T, Cin) int32 accumulator; m: (Cin,) int32 mantissas with static
    shift e; w: (Cin, Cout) int8; bias: (Cout,) int32 or None.
    Returns (B, T, Cout) int32 = (requant(z) @ w) + bias.
    """
    assert isinstance(e, int)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b_, t_, cin = z.shape
    cout = w.shape[1]
    m2 = jnp.broadcast_to(jnp.asarray(m, jnp.int32), (cin,)).reshape(1, cin)
    bias2 = (jnp.zeros((1, cout), jnp.int32) if bias is None
             else jnp.asarray(bias, jnp.int32).reshape(1, cout))
    out = _call(z.reshape(-1, cin), m2, jnp.asarray(w, jnp.int8), bias2,
                e=e, bits=bits, interpret=interpret)
    return out.reshape(b_, t_, cout)
