"""Integer quantization primitives for TPU.

This module is the TPU-native equivalent of the reference's fixed-point math
(`/root/reference/nemo/quantization/utils/quant_utils.py`).  The reference
*emulates* integer arithmetic with float64 tensors (quant_utils.py:149-216);
TPUs have no fast float64, so here the arithmetic is *actually* integer:

  * activations/weights are int32/int8 arrays carried in a `QTensor`
    (values + scale); the float value is ``q * scale``.
  * requantization between layers is the same dyadic scheme as the reference
    (31-bit mantissa `m` + power-of-two shift `e`, quant_utils.py:121-147)
    but evaluated exactly with int32/uint32 lane ops instead of float64.

Semantics matched against the reference (file:line cites throughout):
  - ``symmetric_scale``       <- symmetric_linear_quantization_params
                                 (quant_utils.py:28-54)
  - ``quantize``              <- SymmetricQuantFunction, clamp [-n, n-1]
                                 (quant_utils.py:57-92)
  - ``dyadic_from_scale``     <- batch_frexp: np.frexp + Decimal ROUND_HALF_UP
                                 of m * 2**31 (quant_utils.py:121-147)
  - ``dyadic_requant``        <- fixedpoint_mul: round(z * m / 2**e), clamp
                                 [-n-1, n] applied by callers
                                 (quant_utils.py:149-216)

Known, quantified deviations from the reference (documented, tolerance-tested):
  1. The reference rounds ``z * m / 2**e`` in float64 (53-bit mantissa); we
     compute it exactly over integers.  They differ only when the float64
     product rounds across a .5 boundary (probability ~2**-41 per element).
  2. In dynamic/calibration modes the requant multiplier is derived from
     float32 scales in-graph, so the 31-bit mantissa has 7 trailing zero bits
     (float32 has a 24-bit significand; the reference uses float64's 53).
"""
from __future__ import annotations

import decimal
from decimal import Decimal
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# int32 headroom bound for the integer accumulators fed into dyadic_requant.
# QuartzNet/Jasper worst case: K * Cin * 2**(a_bits-1) * 2**(w_bits-1) + bias
# = 11 * 704 * 256 * 128 ~= 2**27.9 < 2**29.
MAX_ACC_BITS = 29


class QTensor(NamedTuple):
    """An integer tensor plus its (f32) quantization scale.

    float value == values * scale.  ``scale`` is either a scalar () array or a
    per-channel (C,) array broadcast against the trailing axis of ``values``
    (layout is channels-last everywhere in this framework).
    """

    values: Array  # integer-valued; int32 (or int8 for conv inputs)
    scale: Array   # float32, shape () or (C,)

    def dequantize(self) -> Array:
        return self.values.astype(jnp.float32) * self.scale


def symmetric_scale(x_min: Array, x_max: Array, bits: int) -> Array:
    """scale = clamp(max(|min|, |max|), 1e-8) / (2**(bits-1) - 1).

    Matches reference quant_utils.py:28-54 (both per-tensor and per-channel —
    the formula is elementwise, so one code path covers both).
    """
    n = 2 ** (bits - 1) - 1
    sat = jnp.maximum(jnp.abs(x_min), jnp.abs(x_max))
    return jnp.clip(sat, min=1e-8) / n


def quantize(x: Array, scale: Array, bits: int) -> Array:
    """round(x / scale) clamped to [-n, n-1]  (weights / fresh activations).

    Matches SymmetricQuantFunction.forward (quant_utils.py:57-79): note the
    asymmetric clamp bound [-n, n-1].  round is half-to-even in both torch
    and jnp.  Returns int32.
    """
    n = 2 ** (bits - 1) - 1
    # reciprocal-then-multiply, matching linear_quantize (quant_utils.py:12-26:
    # ``torch.round(1. / scale * input)``) bit-for-bit in f32
    q = jnp.round((1.0 / scale) * x)
    return jnp.clip(q, -n, n - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Dyadic (m, e) decomposition
# ---------------------------------------------------------------------------


class Dyadic(NamedTuple):
    """31-bit dyadic multiplier: value ~= m * 2**-e, m in [2**30, 2**31)."""

    m: Array  # int32, in [2**30, 2**31)
    e: Array  # int32, >= 1


def dyadic_from_scale_host(new_scale: np.ndarray, max_bit: int = 31):
    """Host-side exact decomposition of ``new_scale = scale_in / scale_out``.

    Reproduces reference batch_frexp (quant_utils.py:121-147): np.frexp in
    float64, then Decimal ROUND_HALF_UP of m * 2**31.  The reference leaves a
    possible m == 2**31 unnormalized (it stores int64); we renormalize to
    (m/2, e-1), which yields the identical product z*m/2**e.
    """
    ns = np.asarray(new_scale, dtype=np.float64).reshape(-1)
    if not np.all(ns > 0):
        raise ValueError("dyadic scales must be positive")
    m_f, exp = np.frexp(ns)
    m_out = np.empty(ns.shape, dtype=np.int64)
    for i, mf in enumerate(m_f):
        m_out[i] = int(
            Decimal(mf * (2 ** max_bit)).quantize(Decimal("1"), rounding=decimal.ROUND_HALF_UP)
        )
    e_out = (max_bit - exp).astype(np.int64)
    # renormalize m == 2**31 so it fits int32 (same value: z*2**31/2**e == z*2**30/2**(e-1))
    over = m_out == (1 << max_bit)
    m_out[over] >>= 1
    e_out[over] -= 1
    if np.any(e_out < 1):
        raise ValueError("requant scale >= 2**30 is unsupported (e < 1)")
    shape = np.asarray(new_scale).shape
    # host numpy (not device arrays): freeze runs fully on host; jit bakes
    # the tables in as constants
    return Dyadic(
        m_out.reshape(shape).astype(np.int32),
        e_out.reshape(shape).astype(np.int32),
    )


def dyadic_from_scale(new_scale: Array, max_bit: int = 31) -> Dyadic:
    """In-graph decomposition of an f32 ``new_scale`` (dynamic/calib modes).

    frexp via exponent/mantissa bit extraction — exact for normal floats.
    m gets f32's 24 significand bits shifted up to bit 31 (7 trailing zeros);
    see module docstring, deviation (2).
    """
    x = new_scale.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    exp = ((bits >> 23) & 0xFF) - 126  # frexp exponent: x = m * 2**exp, m in [0.5, 1)
    m24 = (bits & 0x7FFFFF) | 0x800000  # [2**23, 2**24)
    m = m24 << (max_bit - 24)  # [2**30, 2**31)
    e = max_bit - exp
    return Dyadic(m.astype(jnp.int32), e.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Exact integer dyadic requantization
# ---------------------------------------------------------------------------


def _mul_wide(z_abs: Array, m: Array):
    """Exact 61-bit product q = z_abs * m as (H:int32, L:uint32), q = H*2**32 + L.

    Requires z_abs in [0, 2**29), m in [2**30, 2**31).
    """
    za_hi = (z_abs >> 16).astype(jnp.uint32)          # < 2**13
    za_lo = (z_abs & 0xFFFF).astype(jnp.uint32)       # < 2**16
    m_u = m.astype(jnp.uint32)
    m_hi = m_u >> 16                                   # [2**14, 2**15)
    m_lo = m_u & 0xFFFF
    p0 = za_lo * m_lo                                  # < 2**32, exact in uint32
    p1 = za_lo * m_hi                                  # < 2**31
    p2 = za_hi * m_lo                                  # < 2**29
    p3 = za_hi * m_hi                                  # < 2**28
    p12 = p1 + p2                                      # < 2**32
    lo = p0 + ((p12 & 0xFFFF) << 16)                   # mod 2**32 (may wrap once)
    carry = (lo < p0).astype(jnp.uint32)
    hi = (p3 + (p12 >> 16) + carry).astype(jnp.int32)  # < 2**28 + 2**16 + 1
    return hi, lo


def _rshift_round_half_even(hi: Array, lo: Array, e: Array) -> Array:
    """round_half_even((hi*2**32 + lo) / 2**e) for e >= 1, value >= 0.

    Saturates to 2**30 when the true result would exceed int32 (callers clamp
    to activation range immediately after, so the sentinel only needs to be
    larger than any clamp bound).
    """
    one_u = jnp.uint32(1)
    # ---- branch A: 1 <= e <= 31 ----
    eA = jnp.clip(e, 1, 31)
    satA = hi >= (1 << jnp.maximum(eA - 1, 0))  # result would be >= 2**31
    floorA = (hi << (32 - eA)) + (lo >> eA.astype(jnp.uint32)).astype(jnp.int32)
    bitA = ((lo >> (eA - 1).astype(jnp.uint32)) & one_u).astype(jnp.int32)
    restA = (lo & ((one_u << (eA - 1).astype(jnp.uint32)) - one_u)) > 0
    upA = (bitA == 1) & (restA | ((floorA & 1) == 1))
    rA = jnp.where(satA, jnp.int32(1 << 30), floorA + upA.astype(jnp.int32))
    # ---- branch B: e >= 32 (f = e - 32 in [0, 30]; e > 62 -> result 0) ----
    f = jnp.clip(e - 32, 0, 30)
    floorB = hi >> f
    hrem = hi & ((1 << f) - 1)
    hb = 1 << jnp.maximum(f - 1, 0)
    # int32-valued selects (Mosaic cannot select between i1 vectors)
    gtB = jnp.where(f == 0, (lo > jnp.uint32(1 << 31)).astype(jnp.int32),
                    ((hrem > hb) | ((hrem == hb) & (lo > 0))).astype(jnp.int32)) == 1
    eqB = jnp.where(f == 0, (lo == jnp.uint32(1 << 31)).astype(jnp.int32),
                    ((hrem == hb) & (lo == 0)).astype(jnp.int32)) == 1
    upB = gtB | (eqB & ((floorB & 1) == 1))
    rB = floorB + upB.astype(jnp.int32)
    rB = jnp.where(e > 62, 0, rB)
    r = jnp.where(e <= 31, rA, rB)
    # saturate far above any activation clamp bound (<= 2**9) but low enough
    # that summing two results (residual add) cannot overflow int32
    return jnp.minimum(r, jnp.int32(1 << 26))


def dyadic_requant(z: Array, d: Dyadic) -> Array:
    """Exact round_half_even(z * m / 2**e) over integers.

    z: int32 with |z| < 2**29 (conv accumulators or small activation ints).
    d.m/d.e broadcast against z's trailing (channel) axis or are scalars.
    Equivalent to the reference's float64 ``torch.round(z * m / 2.0**e)``
    (quant_utils.py:195-196) up to float64 tie-rounding (see module doc).
    """
    z = z.astype(jnp.int32)  # accept narrow int inputs (int8 activations)
    sign = jnp.sign(z)
    hi, lo = _mul_wide(jnp.abs(z), jnp.broadcast_to(d.m, z.shape))
    r = _rshift_round_half_even(hi, lo, jnp.broadcast_to(d.e, z.shape))
    return sign * r


def dyadic_from_scale_host_static_e(new_scale: np.ndarray, max_bit: int = 31):
    """Site-scalar exponent variant: one static shift `e` for the whole
    (per-channel) scale vector, mantissas Decimal-rounded at that shift.

    e = min over channels of the per-channel exponents, so every mantissa
    fits in [1, 2**31).  Channels whose own exponent exceeds e lose
    (e_i - e) mantissa bits (weight-scale spread within a layer, typically
    <= ~7 bits, i.e. >= 24-bit mantissas — float32-level).  The payoff: all
    shifts in the requant become compile-time constants, which measures ~5x
    faster than per-channel shift vectors on the VPU.
    Returns (m int32 ndarray, e python int).
    """
    ns = np.asarray(new_scale, dtype=np.float64).reshape(-1)
    if not np.all(ns > 0):
        raise ValueError("dyadic scales must be positive")
    _, exp = np.frexp(ns.max())
    e = int(max_bit - exp)  # mantissa of the largest scale uses all 31 bits
    if e < 1:
        raise ValueError("requant scale >= 2**30 is unsupported")
    m = np.empty(ns.shape, dtype=np.int64)
    scale_2e = Decimal(2) ** e
    for i, v in enumerate(ns):
        m[i] = int((Decimal(v) * scale_2e).quantize(Decimal("1"),
                                                    rounding=decimal.ROUND_HALF_UP))
    if np.any(m >= (1 << max_bit)):  # ties rounding the max channel up
        e -= 1
        m = np.asarray([int((Decimal(v) * (Decimal(2) ** e)).quantize(
            Decimal("1"), rounding=decimal.ROUND_HALF_UP)) for v in ns], np.int64)
    m = np.maximum(m, 1)
    shape = np.asarray(new_scale).shape
    return m.reshape(shape).astype(np.int32), e


def dyadic_requant_static(z: Array, m: Array, e: int, *,
                          nonneg: bool = False) -> Array:
    """round_half_even(z * m / 2**e) with a *static* exponent.

    Same two-limb exact integer scheme as dyadic_requant, but every shift
    amount is a Python int, so XLA emits constant-shift vector ops.

    ``nonneg=True`` asserts z >= 0 (e.g. post-ReLU accumulators) and skips
    the sign/abs/restore ops (~10% of the chain) — identical results on
    non-negative inputs since round_half_even is odd-symmetric.
    """
    assert isinstance(e, int) and 1 <= e
    z = z.astype(jnp.int32)
    if nonneg:
        sign = None
        hi, lo = _mul_wide(z, jnp.broadcast_to(jnp.asarray(m, jnp.int32), z.shape))
    else:
        sign = jnp.sign(z)
        hi, lo = _mul_wide(jnp.abs(z), jnp.broadcast_to(jnp.asarray(m, jnp.int32), z.shape))
    one_u = jnp.uint32(1)
    if e > 62:
        return jnp.zeros_like(z)
    if e <= 31:
        sat = hi >= (1 << max(e - 1, 0))
        floor = (hi << (32 - e)) + (lo >> jnp.uint32(e)).astype(jnp.int32)
        bit = ((lo >> jnp.uint32(e - 1)) & one_u).astype(jnp.int32)
        rest = (lo & jnp.uint32((1 << (e - 1)) - 1)) > 0
        up = (bit == 1) & (rest | ((floor & 1) == 1))
        r = jnp.where(sat, jnp.int32(1 << 26), floor + up.astype(jnp.int32))
    else:
        f = e - 32
        floor = hi >> f
        if f == 0:
            gt = lo > jnp.uint32(1 << 31)
            eq = lo == jnp.uint32(1 << 31)
        else:
            hrem = hi & ((1 << f) - 1)
            hb = 1 << (f - 1)
            gt = (hrem > hb) | ((hrem == hb) & (lo > 0))
            eq = (hrem == hb) & (lo == 0)
        up = gt | (eq & ((floor & 1) == 1))
        r = floor + up.astype(jnp.int32)
    r = jnp.minimum(r, jnp.int32(1 << 26))
    return r if sign is None else sign * r


def dyadic_requant_static16(z: Array, m: Array, e: int, *,
                            nonneg: bool = False) -> Array:
    """round_half_even(z * m / 2**e) for 16-bit mantissas: m < 2**16.

    Exact for the given (m, e) — the 'fast' aspect is the coarser
    multiplier in the *table* (freeze dyadic_mode='static_e16', relative
    scale error <= 2**-16, far below any activation quantization step),
    not the arithmetic.  With m 16-bit the 61-bit two-limb product
    collapses to two 32-bit multiplies and one limb recombination —
    roughly half the VPU ops of dyadic_requant_static.  Requires
    |z| < 2**30 and 1 <= e <= 31: freeze_model checks the worst-case
    accumulator bound of every consumer site (contraction * act bound *
    weight bound + bias) and falls back to static_e when a site could
    exceed 2**30, so frozen static_e16 tables guarantee both.
    """
    assert isinstance(e, int) and 1 <= e <= 31
    z = z.astype(jnp.int32)
    if nonneg:
        sign, za = None, z
    else:
        sign = jnp.sign(z)
        za = jnp.abs(z)
    m_u = jnp.broadcast_to(jnp.asarray(m, jnp.int32), z.shape).astype(jnp.uint32)
    za_u = za.astype(jnp.uint32)
    p_lo = (za_u & jnp.uint32(0xFFFF)) * m_u           # exact in uint32
    p_hi = ((za_u >> 16) * m_u).astype(jnp.int32)      # < 2**30
    # P = z*m = u * 2**16 + low16
    u = (p_lo >> 16).astype(jnp.int32) + p_hi
    low16 = (p_lo & jnp.uint32(0xFFFF)).astype(jnp.int32)
    if e >= 16:
        s = e - 16
        if s:
            floor = u >> s
            frac = ((u & ((1 << s) - 1)) << 16) + low16
        else:
            floor = u
            frac = low16
        half = 1 << (s + 15)
        up = (frac > half) | ((frac == half) & ((floor & 1) == 1))
        r = floor + up.astype(jnp.int32)
    else:
        sat = u >= (1 << (e + 15))                     # result >= 2**31
        floor = (u << (16 - e)) + (low16 >> e)
        frac = low16 & ((1 << e) - 1)
        half = 1 << (e - 1)
        up = (frac > half) | ((frac == half) & ((floor & 1) == 1))
        r = jnp.where(sat, jnp.int32(1 << 26), floor + up.astype(jnp.int32))
    r = jnp.minimum(r, jnp.int32(1 << 26))
    return r if sign is None else sign * r


def requant_clamp(q: Array, bits: int) -> Array:
    """fixedpoint_mul's output clamp: [-n-1, n]  (quant_utils.py:213-214).

    Note: opposite asymmetry from the weight-quant clamp [-n, n-1].
    """
    n = 2 ** (bits - 1) - 1
    return jnp.clip(q, -n - 1, n)


def requantize_approx(x: QTensor, out_scale: Array, bits: int,
                      identity: Optional[QTensor] = None) -> QTensor:
    """Float-multiplier requantization: clamp(round(z * s_in/s_out), -n-1, n).

    ~2 ops per site instead of the ~40-op exact dyadic chain — used during
    calibration, where only the collected ranges matter and the f32
    multiplier differs from the dyadic one by <= 2**-24 relative (same
    precision class as documented deviation (2) in the module docstring).
    """
    q = jnp.round(x.values.astype(jnp.float32) * (x.scale / out_scale))
    if identity is not None:
        q = q + jnp.round(identity.values.astype(jnp.float32)
                          * (identity.scale / out_scale))
    return QTensor(requant_clamp(q.astype(jnp.int32), bits), out_scale)


def requantize(
    x: QTensor,
    out_scale: Array,
    bits: int,
    *,
    dyadic: Optional[Dyadic] = None,
    identity: Optional[QTensor] = None,
    identity_dyadic: Optional[Dyadic] = None,
) -> QTensor:
    """Requantize ``x`` (and optionally add ``identity``) to ``out_scale``.

    The functional equivalent of fixedpoint_mul (quant_utils.py:149-216):
      q = clamp(round(x.q * m/2**e) [+ round(id.q * m1/2**e1)], -n-1, n)
    When ``dyadic`` is None the multiplier is derived in-graph from the f32
    scales (dynamic/calibration); when given, it was host-computed exactly
    from frozen scales (static eval).
    """
    if dyadic is None:
        dyadic = dyadic_from_scale(x.scale / out_scale)
    q = dyadic_requant(x.values, dyadic)
    if identity is not None:
        if identity_dyadic is None:
            identity_dyadic = dyadic_from_scale(identity.scale / out_scale)
        q = q + dyadic_requant(identity.values, identity_dyadic)
    return QTensor(requant_clamp(q, bits), out_scale)
