"""Exact integer division / floor-sqrt via f32 estimate + integer fixup.

The TPU VPU has no integer divide: XLA emulates `int32 //` with a long
multi-op expansion, and the frozen integer path divides per element in
its three hottest glue ops (i-LayerNorm's `(d << 16) // sigma`,
i-sigmoid's `(e << 7) // den`, i-softmax's final normalize — reference
semantics at `/root/reference/nemo/quantization/utils/quantize_model.py`'s
I-BERT companions, see ops/integer_{softmax,layernorm,sigmoid}.py).

The VPU *is* fast at f32 multiply / round / sqrt, so these helpers
compute a float estimate and repair it with integer compares to land on
the EXACT floor result:

  floor_div:  q0 = round(f32(n) * (1/f32(d)))  — q0 is within +-1 of
              floor(n/d) whenever |n/d| < ~2^20 (f32 relative error
              ~2^-22 across the three roundings, plus 1/2 from round);
              one residual stage (two_stage=True) extends that to
              |n/d| < 2^25 by re-estimating on r0 = n - q0*d, which is
              small enough to be f32-exact.  A final compare on
              r = n - q*d fixes floor semantics exactly (divisor > 0).

  floor_sqrt: x = i32(sqrt(f32(m))) is within +-2 of floor(sqrt(m)) for
              m < 2^30 even with a 2-ulp sqrt; two rounds of +-1
              integer fixup make it exact.

Both are bit-identical to `jnp.floor_divide` / the Newton `i_sqrt` on
their stated domains (fuzzed + boundary-swept in test_fast_int.py, and
validated on-chip against 1M adversarial samples).  QASR_FAST_IDIV=0
falls back to the plain integer forms for A/B measurement.
"""
from __future__ import annotations

import os

import jax.numpy as jnp


def fast_idiv_enabled() -> bool:
    """Trace-time switch (read like the kernel flags: flipping the env
    var requires a fresh trace — include it in jit cache keys via
    quantize.conformer_freeze.effective_kernel_flags)."""
    return os.environ.get("QASR_FAST_IDIV", "1") != "0"


def floor_div(n, d, *, two_stage: bool = False):
    """Exact floor(n / d) for int32 `n` (any sign) and divisor `d` >= 1
    (an int32 array, or a Python int which may be negative — a negative
    constant flips both signs: floor(n/d) == floor(-n / -d)).

    Domain: |n| < 2^30 and |n/d| < 2^20 (two_stage=False) or < 2^25
    (two_stage=True).  Every call site in this package stays far inside
    (see the per-site bounds in the callers' docstrings).
    """
    if isinstance(d, int) and d < 0:
        n, d = -n, -d
    if not fast_idiv_enabled():
        return jnp.floor_divide(n, d)
    f32 = jnp.float32
    if isinstance(d, int):
        rcp = jnp.float32(1.0 / d)
        d = jnp.int32(d)
    else:
        d = d.astype(jnp.int32)
        rcp = 1.0 / d.astype(f32)
    n = n.astype(jnp.int32)
    q = jnp.round(n.astype(f32) * rcp).astype(jnp.int32)
    if two_stage:
        r0 = n - q * d
        q = q + jnp.round(r0.astype(f32) * rcp).astype(jnp.int32)
    r = n - q * d
    return q + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)


def floor_sqrt(m):
    """Exact floor(sqrt(m)) for int32 m in [0, 2^30); negative inputs
    return 0 (matching ops.integer_layernorm.i_sqrt's n<=0 guard)."""
    m = m.astype(jnp.int32)
    x = jnp.sqrt(jnp.maximum(m, 0).astype(jnp.float32)).astype(jnp.int32)
    # two rounds of +-1 repair: covers a +-2 initial error, which even a
    # 2-ulp (non-correctly-rounded) hardware sqrt stays well inside
    for _ in range(2):
        x = jnp.where((x + 1) * (x + 1) <= m, x + 1, x)
        x = jnp.where((x > 0) & (x * x > m), x - 1, x)
    return x
