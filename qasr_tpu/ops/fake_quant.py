"""Straight-through-estimator fake quantization (QAT).

Equivalent of the reference's differentiable quant ops: SymmetricQuantFunction
(STE backward dividing by scale, quant_utils.py:57-92), floor_ste/round_ste
(quant_utils.py:95-118), and the `qm.train` mode that unfixes everything
(quantize_model.py:69-71).  Gradients pass through rounding; clamping
gradients are zeroed outside the range (standard STE).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from qasr_tpu.ops.quant_prims import symmetric_scale

Array = jax.Array


@jax.custom_vjp
def round_ste(x: Array) -> Array:
    return jnp.round(x)


def _round_fwd(x):
    return jnp.round(x), None


def _round_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_fwd, _round_bwd)


@jax.custom_vjp
def floor_ste(x: Array) -> Array:
    return jnp.floor(x)


floor_ste.defvjp(lambda x: (jnp.floor(x), None), lambda _, g: (g,))


def fake_quant_symmetric(x: Array, scale: Array, bits: int) -> Array:
    """quantize-dequantize with STE; clamp region passes no gradient
    (like torch.clamp's subgradient in the reference backward)."""
    n = 2 ** (bits - 1) - 1
    inv = 1.0 / scale
    q = round_ste(x * inv)
    q = jnp.clip(q, -n, n - 1)
    return q * scale


def fake_quant_weights(w: Array, bits: int) -> Array:
    """Per-out-channel (last axis) symmetric weight fake-quant; scales are
    stop_gradient'ed like the reference's .data.detach() (quant_modules.py:329)."""
    reduce_axes = tuple(range(w.ndim - 1))
    scale = symmetric_scale(jnp.min(jax.lax.stop_gradient(w), axis=reduce_axes),
                            jnp.max(jax.lax.stop_gradient(w), axis=reduce_axes),
                            bits)
    return fake_quant_symmetric(w, scale, bits)


def fake_quant_acts(x: Array, state: dict, bits: int, momentum: float = 0.95
                    ) -> Tuple[Array, dict]:
    """Per-tensor activation fake-quant with EMA range tracking (the
    running-stat update of QuantAct.forward, quant_modules.py:111-141);
    range statistics are stop-gradient."""
    xd = jax.lax.stop_gradient(x)
    bmin, bmax = jnp.min(xd), jnp.max(xd)
    init = jnp.equal(state["x_min"], state["x_max"])
    nmin = jnp.where(init, state["x_min"] + bmin,
                     state["x_min"] * momentum + bmin * (1 - momentum))
    nmax = jnp.where(init, state["x_max"] + bmax,
                     state["x_max"] * momentum + bmax * (1 - momentum))
    scale = symmetric_scale(nmin, nmax, bits)
    return fake_quant_symmetric(x, scale, bits), {"x_min": nmin, "x_max": nmax}
