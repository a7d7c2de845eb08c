"""Grouped/depthwise 1D conv with a partitioner-safe custom VJP.

XLA GSPMD miscompiles the WEIGHT gradient of grouped convolutions
(feature_group_count > 1) whenever the batch is sharded on one mesh axis
and the mesh has any additional axis: the batch_group_count conv that
computes dW is all-reduced over every mesh axis instead of just the batch
axis, multiplying the gradient by the size of the unused axes (verified
on jax 0.9.0: ratio == len(model_axis) with x sharded P('data') on a
('data','model') mesh; correct on a 1-axis mesh; plain groups=1 convs are
unaffected).  Every dp x tp Conformer/QuartzNet training step in this repo
runs exactly that configuration, so the trainable grouped-conv sites
(models/jasper.py conv_nwc, models/conformer.py conformer_conv_module,
quantize/conformer_ptq.py QAT) route through this op.

Forward: the identical jax.lax.conv_general_dilated call (bit-identical
eval, MXU/fusion behavior unchanged).  Backward:
  * dX  — jax's own lhs-gradient (a feature_group_count conv, which the
    partitioner handles correctly; verified by the matching upstream
    gradients in the repro);
  * dW  — computed explicitly as K slice-einsum reductions over (B, T)
    (elementwise mul + reduce, for which SPMD inserts the correct psum
    over the batch axis only).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# nondiff: stride, padding (lo, hi), dilation, groups, precision, preferred
_NONDIFF = (2, 3, 4, 5, 6, 7)


def _conv(x, w, stride, padding, dilation, groups, precision, preferred):
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [tuple(padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups, precision=precision,
        preferred_element_type=preferred)


@partial(jax.custom_vjp, nondiff_argnums=_NONDIFF)
def grouped_conv1d(x, w, stride: int, padding: Tuple[int, int],
                   dilation: int, groups: int, precision=None,
                   preferred=None):
    """(B, T, Cin) x (K, Cin/groups, Cout) -> (B, T', Cout)."""
    return _conv(x, w, stride, padding, dilation, groups, precision,
                 preferred)


def _fwd(x, w, stride, padding, dilation, groups, precision, preferred):
    y = _conv(x, w, stride, padding, dilation, groups, precision, preferred)
    return y, (x, w)


def _weight_grad(x, ct, k_size: int, stride: int, padding, dilation: int,
                 groups: int, precision) -> jax.Array:
    b_sz, _, cin = x.shape
    t_out, cout = ct.shape[1], ct.shape[2]
    cin_pg, cout_pg = cin // groups, cout // groups
    xp = jnp.pad(x, ((0, 0), (padding[0], padding[1]), (0, 0)))
    span = (t_out - 1) * stride + 1
    ct_g = ct.reshape(b_sz, t_out, groups, cout_pg)

    def dw_at(start):
        sl = jax.lax.dynamic_slice_in_dim(xp, start, span, axis=1)
        sl = sl[:, ::stride, :].reshape(b_sz, t_out, groups, cin_pg)
        return jnp.einsum("btgi,btgo->gio", sl, ct_g, precision=precision)

    if k_size <= 16:
        dw = jnp.stack([dw_at(k * dilation) for k in range(k_size)])
    else:
        def body(k, acc):
            return jax.lax.dynamic_update_index_in_dim(
                acc, dw_at(k * dilation), k, axis=0)

        dw = jax.lax.fori_loop(
            0, k_size, body,
            jnp.zeros((k_size, groups, cin_pg, cout_pg), ct.dtype))
    # (K, G, Cin/g, Cout/g) -> (K, Cin/g, G*Cout/g) = the WIO kernel layout
    return dw.transpose(0, 2, 1, 3).reshape(k_size, cin_pg, cout)


def _bwd(stride, padding, dilation, groups, precision, preferred, res, ct):
    x, w = res
    _, vjp_x = jax.vjp(
        lambda x_: _conv(x_, w, stride, padding, dilation, groups,
                         precision, preferred), x)
    dx, = vjp_x(ct)
    dw = _weight_grad(x, ct, w.shape[0], stride, padding, dilation, groups,
                      precision).astype(w.dtype)
    return dx, dw


grouped_conv1d.defvjp(_fwd, _bwd)
