"""Integer-only LayerNorm (the I-BERT i-LayerNorm construction).

Companion to ops/integer_softmax.py: normalize over the channel axis using
integer statistics — rounded integer mean, integer variance, and an
integer Newton square root — so the only float ops left in a LayerNorm
are the final affine (gamma/beta) multiply.  The input's quantization
scale S cancels exactly in (x - mu) / sigma, so the normalized output is
scale-free: y = (d << K) // sigma_int * 2^-K * gamma + beta.

Intermediates stay inside int32 for the 8-bit activation inputs the PTQ
path produces: |d| <= 511, d^2 summed over D <= 2^26 for D <= 8192 after
the mean shift, and the << K staging keeps |d << K| <= 2^19 for K = 10.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from qasr_tpu.ops.fast_int import fast_idiv_enabled, floor_div, floor_sqrt

Array = jax.Array

_K = 10  # fractional bits of the normalized output
_SB = 6  # fractional bits of the integer sigma


def i_sqrt(n: Array, iters: int = 12) -> Array:
    """Integer Newton square root: floor(sqrt(n)) for n >= 0 int32.

    x_{j+1} = (x_j + n // x_j) // 2 from a power-of-two seed >= sqrt(n);
    monotone decreasing, converges in <= iters for n < 2**31 (the extra
    min() guards the classic 2-cycle around non-squares)."""
    n = n.astype(jnp.int32)
    # seed: 2^ceil(bits/2) >= sqrt(n)
    bits = jnp.ceil(jnp.log2(jnp.maximum(n, 1).astype(jnp.float32) + 1.0))
    x = (1 << (bits.astype(jnp.int32) + 1) // 2).astype(jnp.int32)
    x = jnp.maximum(x, 1)

    def body(_, x):
        nx = (x + n // x) >> 1
        return jnp.maximum(jnp.minimum(nx, x), 1)

    x = jax.lax.fori_loop(0, iters, body, x)
    return jnp.where(n <= 0, 0, x)


def i_layernorm_core(q: Array) -> Array:
    """Integer-normalized (x - mu)/sigma at 2^-_K fixed point: int32 with
    implied scale 2^-_K (the affine is the caller's — float gamma/beta in
    the PTQ path, a dyadic requant in the frozen path)."""
    d_ax = q.shape[-1]
    q = q.astype(jnp.int32)
    s = jnp.sum(q, axis=-1, keepdims=True)
    # rounded integer mean (round-half-up on the magnitude); |mu| <= 511
    # so the constant-divisor divisions sit deep in floor_div's domain
    mu = jnp.where(s >= 0, floor_div(s + d_ax // 2, d_ax),
                   -floor_div(-s + d_ax // 2, d_ax))
    d = q - mu
    var = floor_div(jnp.sum(d * d, axis=-1, keepdims=True), d_ax)
    # sigma at 2^-_SB granularity: isqrt(var << 2*_SB) = sigma << _SB.
    # int32 headroom requires 8-bit inputs (|q - mu| <= 255): the variance
    # sum stays < 2^31 up to D = 8192 and var <= 2^16, << 12 -> < 2^28.
    # (Wider inputs would overflow the sum; ConformerQuantConfig rejects
    # integer_layernorm with act_bit > 8.)
    v12 = var << (2 * _SB)
    sigma_s = jnp.maximum(floor_sqrt(v12) if fast_idiv_enabled()
                          else i_sqrt(v12), 1)
    # |d << 16| < 2^25 and sigma_s >= 1: quotient can reach ~2^22 when a
    # near-constant row leaves var == 0 (sum(d^2) < D forces |d| < sqrt(D)
    # there, so the worst case is sqrt(8192) << 16 / 1) -> two-stage
    return floor_div(d << (_K + _SB), sigma_s, two_stage=True)


def i_layernorm(q: Array, gamma: Array, beta: Array) -> Array:
    """LayerNorm over the last axis of an integer tensor `q` (any scale —
    it cancels).  Returns float: integer-normalized value * gamma + beta.

    Matches float LayerNorm up to the input quantization granularity and
    the 2^-K fractional resolution (eps is sub-integer at 8-bit scales and
    is subsumed by the sigma >= 1 guard)."""
    y = i_layernorm_core(q)
    return y.astype(jnp.float32) * (1.0 / (1 << _K)) * gamma + beta
