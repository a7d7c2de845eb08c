"""Fused int8 GEMM + requant epilogues for the frozen integer Conformer.

The frozen Conformer (`quantize/conformer_freeze.py`) runs every linear as
an int8 `dot_general` followed by an elementwise chain — acc-domain bias,
exact dyadic requant, activation clamp, and (at the four residual joins)
a second requant of the int8 stream plus the add.  XLA never fuses
elementwise epilogues into dot outputs on TPU, so each site round-trips an
int32 accumulator through memory and pays a standalone VPU fusion — the
same tax the QuartzNet channel-major path removed with
`kernels/cm_fused.py` (PERF.md round 2c).  These kernels apply the same
scheme to the Conformer's 2D GEMM world: the dot runs on the MXU tile by
tile while the epilogue for the previous tile runs on the VPU, and the
int32 accumulator never leaves VMEM.

Three epilogue variants cover every GEMM in the frozen layer stack:

  fused_lin_rq     bias -> dyadic requant -> clamp -> int8
                   (attention q/k/v projections, GLU linear half, pre)
  fused_lin_join   branch: bias -> requant; stream: requant; add -> clamp
                   (the four residual joins: FFN l2 x2, att_out, pw2)
  fused_lin_swish  bias -> requant -> clamp -> i-sigmoid grid -> integer
                   swish product -> requant -> clamp -> int8
                   (FFN l1: the 256->1024 GEMM + the whole I-BERT swish)

Numerics are bit-identical to the unfused composition by construction:
each epilogue calls the same `dyadic_requant_static` / `i_sigmoid_grid`
used by the XLA path, in the same order, with the same static exponents.

Reference semantics being fused (file:line in /root/reference):
  linear + bias    nemo/quantization/utils/quant_modules.py:420-480
                   (QuantLinear integer path)
  requant + clamp  nemo/quantization/utils/quant_utils.py:149-216
                   (fixedpoint_mul, clamp)
  residual join    conformer_modules.py residual adds (fp in the
                   reference; exact dyadic two-requant join here)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.quant_prims import dyadic_requant_static

Array = jax.Array

# Row/column tile sizes.  N tiles of 256 keep the (TN, K) int8 operand and
# the (TN, TD) int32 accumulator comfortably in VMEM for K up to 4096.
# Small-N calls (streaming chunks) shrink the row tile to the sublane
# minimum so padded rows don't dominate the dot.
TN = 256
TD = 128


def _row_tile(n: int) -> int:
    if n >= TN:
        return TN
    return max(32, -(-n // 32) * 32)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(a: Array, axis: int, mult: int) -> Array:
    size = a.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, rem)
    return jnp.pad(a, widths)


def _sigmoid_grid_fraction(g: Array) -> Array:
    """i_sigmoid_grid inlined (ops/integer_sigmoid.py:42-50) — kept as a
    local copy so the kernel body has no module-level jnp closures that
    could drift; asserted equal in tests."""
    from qasr_tpu.ops.integer_sigmoid import i_sigmoid_grid

    return i_sigmoid_grid(g)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _rq_clamp(acc, b_ref, m_ref, *, e: int, lo: int, hi: int):
    z = acc if b_ref is None else acc + b_ref[:]
    q = dyadic_requant_static(z, m_ref[:], e)
    return jnp.clip(q, lo, hi)


def _lin_call(x8, w8, b, m, *, tn, variant, e, lo, hi, extras, interpret):
    """Shared pallas_call builder.  x8 (N, K) int8, w8 (K, D) int8,
    b (1, D) int32 or None, m (1, D) int32.  extras: variant-specific
    static table + optional stream operand."""
    n, k = x8.shape
    d = w8.shape[1]
    grid = (n // tn, d // TD)
    has_bias = b is not None

    in_specs = [
        pl.BlockSpec((tn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, TD), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x8, w8]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, TD), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(b)
    in_specs.append(pl.BlockSpec((1, TD), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM))
    args.append(m)
    if variant == "join":
        in_specs.append(pl.BlockSpec((tn, TD), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(extras["stream8"])

    def kern(*refs):
        if has_bias:
            x_ref, w_ref, b_ref, m_ref = refs[:4]
            rest = refs[4:]
        else:
            x_ref, w_ref, m_ref = refs[:3]
            b_ref = None
            rest = refs[3:]
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if variant == "rq":
            (o_ref,) = rest
            o_ref[:] = _rq_clamp(acc, b_ref, m_ref,
                                 e=e, lo=lo, hi=hi).astype(jnp.int8)
        elif variant == "join":
            s_ref, o_ref = rest
            yb = dyadic_requant_static(
                acc if b_ref is None else acc + b_ref[:], m_ref[:], e)
            ys = dyadic_requant_static(
                s_ref[:].astype(jnp.int32),
                jnp.int32(extras["m_s"]), extras["e_s"])
            o_ref[:] = jnp.clip(yb + ys, lo, hi).astype(jnp.int8)
        elif variant == "swish":
            (o_ref,) = rest
            a8 = _rq_clamp(acc, b_ref, m_ref, e=e, lo=lo, hi=hi)
            g = dyadic_requant_static(a8, jnp.int32(extras["grid_m"]),
                                      extras["grid_e"])
            y = a8 * _sigmoid_grid_fraction(g)
            q = dyadic_requant_static(y, jnp.int32(extras["prod_m"]),
                                      extras["prod_e"])
            o_ref[:] = jnp.clip(q, lo, hi).astype(jnp.int8)
        else:  # pragma: no cover
            raise AssertionError(variant)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.int8),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, TD), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# public entry points — all accept (..., K) activations of any leading
# shape, pad N/K/D to tile multiples (zero padding is exact for the dot;
# padded rows/cols are sliced off), and return (..., D) int8.
# ---------------------------------------------------------------------------


def _prep(x8: Array, w8, bias, m):
    lead = x8.shape[:-1]
    k = x8.shape[-1]
    d = w8.shape[1]
    rows = 1
    for s in lead:
        rows *= s
    tn = _row_tile(rows)
    x2 = _pad_axis(_pad_axis(x8.reshape(-1, k), 0, tn), 1, 128)
    w2 = _pad_axis(_pad_axis(jnp.asarray(w8, jnp.int8), 0, 128), 1, TD)
    b2 = None if bias is None else _pad_axis(
        jnp.asarray(bias, jnp.int32).reshape(1, -1), 1, TD)
    m2 = _pad_axis(jnp.asarray(m, jnp.int32).reshape(1, -1)
                   * jnp.ones((1, d), jnp.int32), 1, TD)
    return lead, d, tn, x2, w2, b2, m2


def fused_lin_rq(x8: Array, w8, bias, m, e: int, *, lo: int, hi: int,
                 interpret=None) -> Array:
    """clip(dyadic_requant(x8 @ w8 + bias, m, e), lo, hi) -> int8.

    Bit-identical to `_apply_rq(_dot8(x8, w), tbl, ab)` in
    quantize/conformer_freeze.py (same requant, same clamp order)."""
    if interpret is None:
        interpret = _should_interpret()
    lead, d, tn, x2, w2, b2, m2 = _prep(x8, w8, bias, m)
    out = _lin_call(x2, w2, b2, m2, tn=tn, variant="rq", e=int(e),
                    lo=lo, hi=hi, extras={}, interpret=interpret)
    n = 1
    for s in lead:
        n *= s
    return out[:n, :d].reshape(*lead, d)


def fused_lin_join(x8: Array, w8, bias, m, e: int, stream8: Array,
                   m_s: int, e_s: int, *, lo: int, hi: int,
                   interpret=None) -> Array:
    """Residual join fused into the branch GEMM:
    clip(requant(x8 @ w8 + bias, m, e) + requant(stream8, m_s, e_s), lo, hi)
    -> int8.  Bit-identical to `_join_int(_dot8(x8, w), tbl, stream8,
    (m_s, e_s), ab)`."""
    if interpret is None:
        interpret = _should_interpret()
    lead, d, tn, x2, w2, b2, m2 = _prep(x8, w8, bias, m)
    s2 = _pad_axis(_pad_axis(stream8.reshape(-1, d), 0, tn), 1, TD)
    out = _lin_call(x2, w2, b2, m2, tn=tn, variant="join", e=int(e),
                    lo=lo, hi=hi,
                    extras={"stream8": s2, "m_s": int(m_s),
                            "e_s": int(e_s)},
                    interpret=interpret)
    n = 1
    for s in lead:
        n *= s
    return out[:n, :d].reshape(*lead, d)


def fused_lin_swish(x8: Array, w8, bias, m, e: int, grid_m: int,
                    grid_e: int, prod_m: int, prod_e: int, *, lo: int,
                    hi: int, interpret=None) -> Array:
    """FFN first half fused end to end: GEMM -> bias -> requant -> clamp
    (the l1 activation int8) -> requant onto the i-sigmoid grid -> integer
    swish product -> product requant -> clamp -> int8.  Bit-identical to
    the `_ffn_int` body up to (and excluding) the l2 dot."""
    if interpret is None:
        interpret = _should_interpret()
    lead, d, tn, x2, w2, b2, m2 = _prep(x8, w8, bias, m)
    out = _lin_call(x2, w2, b2, m2, tn=tn, variant="swish", e=int(e),
                    lo=lo, hi=hi,
                    extras={"grid_m": int(grid_m), "grid_e": int(grid_e),
                            "prod_m": int(prod_m), "prod_e": int(prod_e)},
                    interpret=interpret)
    n = 1
    for s in lead:
        n *= s
    return out[:n, :d].reshape(*lead, d)
