"""Fused integer relative-position attention for the frozen Conformer.

The XLA composition in quantize/conformer_freeze.py materializes, per
layer, five (B, h, T, T)-class int32 tensors in HBM — the content scores
`ac`, the position scores `bd_full` (B, h, T, 2T-1) plus their diagonal
gather, the grid requant sum, and the i-softmax intermediates — ~500 MB of
HBM traffic per layer at the 16x256/B=32/15 s serving shape.  Per (batch,
head) however the whole problem is tiny (k/v/pos are (T, d_k) int8), so
this kernel computes one query tile's FULL score rows in VMEM and emits
only the requantized int8 context: the (T, T) world never touches HBM.

Per grid cell (batch b, head h, query tile I0..I0+127):
  ac   = qu8 @ k8^T                       (MXU, int8 -> int32)
  bd   = diagonal gather of qv8 @ pos8^T  (MXU + two lane rolls: the
         Toeplitz index r = T-1+i-j becomes a per-row roll; pltpu.roll's
         stride form rolls row ii by ii in one op)
  qg   = dyadic_requant(ac) + dyadic_requant(bd)   (onto the i-softmax grid)
  a8   = i-softmax (integer max-subtract, i-exp quadratic, round-half-up
         integer division — ops/integer_softmax.py semantics, bit for bit)
  out  = clip(dyadic_requant(a8 @ v8), -n, n-1) -> int8

Bit-identical to the unfused path by construction: the same i_exp /
dyadic_requant_static / rounding-division expressions run in the same
order on the same int32 values (asserted in test_int_attention.py).

Reference semantics: RelPositionMultiHeadAttention
(/root/reference/nemo/collections/asr/parts/multi_head_attention.py:136-247)
— matmul_ac + matmul_bd with rel_shift, softmax, matmul with value — here
in the I-BERT integer arithmetic the frozen path uses.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.fast_int import floor_div
from qasr_tpu.ops.integer_softmax import N_IN, _PRESHIFT, i_exp
from qasr_tpu.ops.quant_prims import dyadic_requant_static

Array = jax.Array

TQ = 128          # query tile (rows)
MAX_T_PAD = 2048  # VMEM guard: (TQ, 2*tp) int32 slabs; fall back above


def _roll(x, shift, axis, *, stride=None, stride_axis=None, interpret):
    if interpret:
        # interpret mode: emulate (pltpu.roll's stride form is
        # Mosaic-lowered; np.take keeps semantics identical)
        w = x.shape[axis]
        idx = jnp.arange(w)
        if stride is None:
            return jnp.take(x, (idx - shift) % w, axis=axis)
        rows = jnp.arange(x.shape[stride_axis]) * stride
        gather = (idx[None, :] - shift - rows[:, None]) % w
        return jnp.take_along_axis(x, gather, axis=axis)
    return pltpu.roll(x, shift, axis, stride=stride, stride_axis=stride_axis)


def _kern(qu_ref, qv_ref, k_ref, v_ref, pt_ref, len_ref, o_ref, *,
          tp, ac_m, ac_e, bd_m, bd_e, ctx_m, ctx_e, left, right, nbits,
          interpret):
    iq = pl.program_id(2)
    i0 = iq * TQ
    qu = qu_ref[0, 0]            # (TQ, dkp) int8
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]              # (tp, dkp) int8
    v = v_ref[0, 0]
    pt = pt_ref[0]               # (2*tp, dkp) int8, row-REVERSED P~
    # lens rides as the FULL (B, 1) array in SMEM (a (1, 1) block would
    # violate the TPU block-divisibility rule) — index the batch here
    ln = len_ref[pl.program_id(0), 0]

    ac = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)  # (TQ, tp)
    f = jax.lax.dot_general(qv, pt, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)   # (TQ, 2tp)
    # bd[ii, j] = f[ii, (tp + i0 + ii + j') ...]: after the static roll by
    # (tp + i0) and the per-row stride roll by ii, column j holds the
    # diagonal entry qv[i].pos[T-1+i-j] (see module docstring derivation)
    f = _roll(f, (tp + i0) % (2 * tp), 1, interpret=interpret)
    f = _roll(f, 0, 1, stride=1, stride_axis=0, interpret=interpret)
    bd = f[:, :tp]

    qg = (dyadic_requant_static(ac, jnp.int32(ac_m), ac_e)
          + dyadic_requant_static(bd, jnp.int32(bd_m), bd_e))

    gi = i0 + jax.lax.broadcasted_iota(jnp.int32, (TQ, tp), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (TQ, tp), 1)
    masked = (gi >= ln) | (gj >= ln)
    if left >= 0:
        masked = masked | (gi - gj > left)
    if right >= 0:
        masked = masked | (gj - gi > right)

    # ops/integer_softmax.py::i_softmax_grid, bit for bit
    qg = jnp.where(masked, jnp.int32(-(1 << 30)), qg)
    mrow = jnp.max(qg, axis=-1, keepdims=True)
    q = jnp.maximum(qg - mrow, -N_IN)
    q_exp = i_exp(q)
    q_exp = jnp.where(masked, 0, q_exp)
    q_exp = jnp.right_shift(q_exp, _PRESHIFT)
    denom = jnp.maximum(jnp.sum(q_exp, axis=-1, keepdims=True), 1)
    n8 = 2 ** (nbits - 1) - 1
    a8 = floor_div(q_exp * n8 + (denom >> 1), denom).astype(jnp.int8)

    ctx = jax.lax.dot_general(a8, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)  # (TQ, dkp)
    c8 = jnp.clip(dyadic_requant_static(ctx, jnp.int32(ctx_m), ctx_e),
                  -n8, n8 - 1).astype(jnp.int8)
    o_ref[0, 0] = c8


def _pad_to(x: Array, axis: int, size: int) -> Array:
    if x.shape[axis] == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, widths)


def supports(t: int) -> bool:
    """True when the fused kernel's VMEM budget covers sequence length t."""
    return t + (-t) % TQ <= MAX_T_PAD


def fused_int_attention(qu8: Array, qv8: Array, k8: Array, v8: Array,
                        pos8: Array, lens: Array, *, ac, bd, ctx_rq,
                        left: int, right: int, nbits: int,
                        interpret=None) -> Array:
    """qu8/qv8/k8/v8: (B, T, h, d_k) int8; pos8: (2T-1, h, d_k) int8;
    lens: (B,) int32.  ac/bd/ctx_rq: (mantissa, exponent) static dyadic
    pairs (per-tensor scalars); left/right: attention context window
    (-1 = unlimited).  Returns the requantized int8 context (B, T, h*d_k),
    bit-identical to the conformer_freeze.py XLA composition."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h, d_k = qu8.shape
    tp = t + (-t) % TQ
    if tp > MAX_T_PAD:
        raise ValueError(f"T={t} exceeds the fused attention VMEM budget "
                         f"(pad {tp} > {MAX_T_PAD}); use the XLA path")
    dkp = d_k + (-d_k) % 128

    def prep(x):  # (B, T, h, d_k) -> (B, h, tp, dkp)
        x = jnp.transpose(x, (0, 2, 1, 3))
        return _pad_to(_pad_to(x, 2, tp), 3, dkp)

    qu, qv, kk, vv = prep(qu8), prep(qv8), prep(k8), prep(v8)
    # P~[h, tp-1+d] = pos8[T-1+d, h] for d in [-(T-1), T-1], zeros outside;
    # stored column-REVERSED so the kernel needs no in-kernel reverse
    ptil = jnp.zeros((h, 2 * tp, dkp), jnp.int8)
    ptil = jax.lax.dynamic_update_slice(
        ptil, _pad_to(jnp.transpose(pos8, (1, 0, 2)), 2, dkp),
        (0, tp - t, 0))
    ptil = ptil[:, ::-1, :]

    kern = functools.partial(
        _kern, tp=tp, ac_m=int(ac[0]), ac_e=int(ac[1]),
        bd_m=int(bd[0]), bd_e=int(bd[1]),
        ctx_m=int(ctx_rq[0]), ctx_e=int(ctx_rq[1]),
        left=int(left), right=int(right), nbits=nbits,
        interpret=bool(interpret))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dkp), jnp.int8),
        grid=(b, h, tp // TQ),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, dkp), lambda bi, hi, iq: (bi, hi, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, dkp), lambda bi, hi, iq: (bi, hi, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp, dkp), lambda bi, hi, iq: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp, dkp), lambda bi, hi, iq: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tp, dkp), lambda bi, hi, iq: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda bi, hi, iq: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, dkp),
                               lambda bi, hi, iq: (bi, hi, iq, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret),
    )(qu, qv, kk, vv, ptil, lens.astype(jnp.int32).reshape(b, 1))
    out = jnp.transpose(out[:, :, :t, :d_k], (0, 2, 1, 3))
    return out.reshape(b, t, h * d_k)
