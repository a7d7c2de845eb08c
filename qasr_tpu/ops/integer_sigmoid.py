"""Integer-arithmetic sigmoid / swish / GLU factors.

Built on the i-exp range-decomposed quadratic (ops/integer_softmax.py):
  sigmoid(-|x|) = e / (e + E0),  e = i_exp(-|x|),  E0 = i_exp(0)
  sigmoid(+|x|) = 1 - sigmoid(-|x|)
— the common i-exp output scale cancels in the ratio, so after the single
grid-quantization step everything is integer adds/multiplies/divides.
The result is a fixed-point fraction in [0, 2^K_SIG]; swish/GLU multiply
it against an int8 activation, giving an integer product whose scale is
(act_scale / 2^K_SIG).

The S_IN grid clips |x| at 20: sigmoid saturates to 0/1 within 2e-9
there, far below int8 resolution, so the clip is output-exact.  (swish
itself is NOT clipped — the linear factor keeps the activation's own
quantization; only its sigmoid factor rides the grid.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from qasr_tpu.ops.fast_int import floor_div
from qasr_tpu.ops.integer_softmax import N_IN, Q_B, Q_C, S_IN, i_exp

Array = jax.Array

K_SIG = 7                    # fractional bits of the sigmoid fraction
_E0 = Q_B * Q_B + Q_C        # i_exp(0): the quadratic at p = 0, z = 0


def i_sigmoid_fp(x: Array) -> Array:
    """Integer sigmoid of a float tensor: one quantization onto the S_IN
    grid, then integer arithmetic.  Returns int32 in [0, 2^K_SIG] with
    implied scale 2^-K_SIG.

    Headroom: e <= E0 < 2^21, so e << K_SIG < 2^28 and e + E0 < 2^22.
    """
    q = jnp.clip(jnp.round(x / S_IN), -float(N_IN), float(N_IN)
                 ).astype(jnp.int32)
    return i_sigmoid_grid(q)


def i_sigmoid_grid(q: Array) -> Array:
    """Sigmoid fraction from int32 values already on the S_IN grid (the
    frozen path requants activations onto the grid with a static dyadic
    multiplier, so the whole op stays integer)."""
    q = jnp.clip(q, -N_IN, N_IN)
    e = i_exp(-jnp.abs(q))
    den = e + _E0
    # e <= E0 so the quotient is <= 2^(K_SIG-1): single-stage floor_div
    s_neg = floor_div((e << K_SIG) + (den >> 1), den)  # sigmoid(-|x|)
    return jnp.where(q >= 0, (1 << K_SIG) - s_neg, s_neg)


def i_swish_terms(q_act: Array, x_f: Array) -> Array:
    """swish(x) = x * sigmoid(x) as an integer product: `q_act` is the
    activation's own quantized integers (any scale S), `x_f` the same
    values in float (for the sigmoid factor's grid step).  Returns int32
    q_act * sigmoid_fp with implied scale S / 2^K_SIG."""
    return q_act.astype(jnp.int32) * i_sigmoid_fp(x_f)
