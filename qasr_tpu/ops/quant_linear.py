"""Quantized linear / dense layer and standalone activation quantizer.

API-level equivalents of the reference's QuantLinear
(quant_modules.py:370-469 — present upstream but unused by the QuartzNet
path, whose decoder is a 1x1 QuantConv1d) and the per-channel QuantAct mode
(quant_modules.py:59-67,114-119: channelwise ranges over all-but-(batch,
time) axes), so downstream users porting QuantLinear-based models have a
drop-in.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qasr_tpu.ops.quant_prims import QTensor, quantize, symmetric_scale

Array = jax.Array


def quant_linear(x: QTensor, w: Array, b: Optional[Array], weight_bit: int
                 ) -> QTensor:
    """y = x_int @ w_int + b_int, per-out-feature weight scales.

    x: QTensor (..., Din) with scalar scale; w: (Din, Dout) float;
    returns QTensor (..., Dout) with per-feature scale w_scale * x.scale
    (QuantLinear.forward, quant_modules.py:431-469).
    """
    w_scale = symmetric_scale(jnp.min(w, axis=0), jnp.max(w, axis=0), weight_bit)
    w_int = quantize(w, w_scale, weight_bit)
    out_scale = (w_scale * x.scale).astype(jnp.float32)
    xv = x.values.astype(jnp.int8) if weight_bit <= 8 else x.values
    wv = w_int.astype(jnp.int8) if weight_bit <= 8 else w_int
    y = jax.lax.dot_general(xv, wv, (((xv.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    if b is not None:
        y = y + jnp.round((1.0 / out_scale) * b).astype(jnp.int32)
    return QTensor(y, out_scale)


def act_ranges_per_channel(x_f: Array) -> Tuple[Array, Array]:
    """Per-channel (last-axis) min/max — QuantAct per_channel mode
    (quant_modules.py:117-119: min over batch then over time)."""
    reduce_axes = tuple(range(x_f.ndim - 1))
    return jnp.min(x_f, axis=reduce_axes), jnp.max(x_f, axis=reduce_axes)


def act_quantize_per_channel(x: Array, bits: int) -> QTensor:
    """Direct per-channel activation quantization of a float tensor."""
    mn, mx = act_ranges_per_channel(x)
    scale = symmetric_scale(mn, mx, bits)
    return QTensor(quantize(x, scale, bits), scale)
