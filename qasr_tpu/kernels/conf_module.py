"""Module-granularity fused kernels for the frozen integer Conformer.

Round-5 profile (experiments/conformer_profile.py on v5e, 16x256 B=32
T=376): the 176 ms step with the fused attention kernel partitions as
conv module 69.0 ms + FFN halves 38.3 ms + attention kernel 27.8 ms +
i-LayerNorm glue 24.5 ms + subsampler 12.8 ms + projections 2.4 ms.  The
conv/FFN/LN terms are 20-350x above their MXU floor — they are integer
VPU chains whose int32 intermediates round-trip HBM between XLA fusions,
exactly the traffic profile the attention kernel removed (2.8x).

Per-GEMM epilogue fusion already lost at this shape (kernels/gemm_fused.py,
PERF.md round 4: the pallas<->XLA boundary retile per call outweighs the
saved round trips).  These kernels change the granularity: ONE pallas call
per *module*, so a whole sublayer's dataflow — i-LayerNorm, GEMMs,
i-sigmoid/swish chains, the depthwise conv, residual joins — runs out of
VMEM with 3 boundaries per layer instead of ~12.

  fused_ffn_ln      i-LN -> l1 GEMM -> i-swish -> l2 GEMM -> residual
                    join [-> tail i-LN].  Covers both FFN half-steps; the
                    tail emits the next sublayer's LN (ln_att after FFN1,
                    ln_out after FFN2) in the same pass.
  fused_conv_block  att_out GEMM + residual join -> i-LN -> GLU (one
                    concatenated a|g GEMM) -> pad mask -> depthwise conv
                    (static sublane rolls; K taps accumulated in VMEM) ->
                    BN fold -> i-swish -> pw2 GEMM + residual join.

Numerics are bit-identical to the XLA composition in
quantize/conformer_freeze.py by construction: the bodies call the same
`dyadic_requant_static`, `i_sigmoid_grid`, `i_layernorm_core`, and
integer-div expressions in the same order on the same int32 values
(asserted in tests/test_conf_module.py).  The depthwise conv accumulates
the same integer products as `lax.conv_general_dilated` — integer adds
commute, so tap order is irrelevant.

Reference semantics being fused (file:line in /root/reference):
  ConformerFeedForward   nemo/collections/asr/parts/conformer_modules.py
  ConformerConvolution   (GLU -> depthwise -> BN -> swish -> pointwise)
  LayerNorm sites        conformer_modules.py ConformerLayer.forward
— all in the I-BERT integer arithmetic the frozen path uses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.integer_layernorm import i_layernorm_core
from qasr_tpu.ops.integer_sigmoid import i_sigmoid_grid
from qasr_tpu.ops.quant_prims import dyadic_requant_static

Array = jax.Array

# VMEM budget guard: the conv-module kernel holds ~6 (Tp, d)-class int32
# slabs plus GLU (Tp, 2d) and the FFN kernel a (Tp, ff*d) mid; cap the
# product so Mosaic's scoped-vmem (~16 MiB) is never exceeded.
_VMEM_BUDGET = 10 * 2 ** 20


def _pad_rows(x: Array, tp: int) -> Array:
    if x.shape[1] == tp:
        return x
    return jnp.pad(x, ((0, 0), (0, tp - x.shape[1]), (0, 0)))


def pad_t(t: int) -> int:
    """Rows padded to the int8 sublane tile (32) — the serving shape
    T=376 pays 8 pad rows, not the 136 a 128-tile alignment would."""
    return t + (-t) % 32


def supports_ffn(t: int, d: int, ff: int = 4) -> bool:
    """VMEM fit for `fused_ffn_ln`: the (tp, ff*d) int32 mid slab x2
    (acc + swish product) plus the two int8 weight mats dominate."""
    tp = pad_t(t)
    return 2 * tp * ff * d * 4 + 2 * d * ff * d <= _VMEM_BUDGET


def supports_conv(t: int, d: int) -> bool:
    """VMEM fit for `fused_conv_block`: GLU (tp, 2d) int32 x2 plus the
    (tp, d)-class stream/tap slabs."""
    tp = pad_t(t)
    return 4 * tp * 2 * d * 4 <= _VMEM_BUDGET


def supports(t: int, d: int, ff: int = 4) -> bool:
    return supports_ffn(t, d, ff) and supports_conv(t, d)


def _rq(z, m, e: int):
    return dyadic_requant_static(z, m, e)


def _affine8(y, sgn, b, m, *, e: int, n: int):
    q = _rq(sgn * y + b, m, e)
    return jnp.clip(q, -n, n - 1).astype(jnp.int8)


def _dot8(x8, w_ref):
    return jax.lax.dot_general(x8, w_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _ln3(ref):
    """(3, d) int32 ref -> (sgn, b, m) rows as (1, d) broadcastables."""
    return ref[0:1, :], ref[1:2, :], ref[2:3, :]


def _swish8(a8, grid_m: int, grid_e: int, prod_m: int, prod_e: int, n: int):
    """int8 activation -> S_IN grid -> integer swish product -> int8
    (conformer_freeze._ffn_mid / _conv_tail_mid tail, bit for bit)."""
    a32 = a8.astype(jnp.int32)
    g = _rq(a32, jnp.int32(grid_m), grid_e)
    y = a32 * i_sigmoid_grid(g)
    return jnp.clip(_rq(y, jnp.int32(prod_m), prod_e), -n, n - 1
                    ).astype(jnp.int8)


# ---------------------------------------------------------------------------
# FFN half-step (+ tail LayerNorm)
# ---------------------------------------------------------------------------


def _ffn_kern(x_ref, ln_ref, w1_ref, bm1_ref, w2_ref, bm2_ref, tail_ref,
              o_ref, t_ref, *, e_ln, e1, e2, grid_m, grid_e, prod_m, prod_e,
              js_m, js_e, e_tail, nbits):
    n = 2 ** (nbits - 1) - 1
    x8 = x_ref[0]                                        # (tp, d) int8
    sgn, b_ln, m_ln = _ln3(ln_ref)
    yln8 = _affine8(i_layernorm_core(x8), sgn, b_ln, m_ln, e=e_ln, n=n)
    acc1 = _dot8(yln8, w1_ref)                           # (tp, ff*d) int32
    a8 = jnp.clip(_rq(acc1 + bm1_ref[0:1, :], bm1_ref[1:2, :], e1),
                  -n, n - 1).astype(jnp.int8)
    m8 = _swish8(a8, grid_m, grid_e, prod_m, prod_e, n)
    acc2 = _dot8(m8, w2_ref)                             # (tp, d) int32
    yb = _rq(acc2 + bm2_ref[0:1, :], bm2_ref[1:2, :], e2)
    ys = _rq(x8.astype(jnp.int32), jnp.int32(js_m), js_e)
    xo = jnp.clip(yb + ys, -n, n - 1).astype(jnp.int8)
    o_ref[0] = xo
    if t_ref is not None:
        tsgn, tb, tm = _ln3(tail_ref)
        t_ref[0] = _affine8(i_layernorm_core(xo), tsgn, tb, tm,
                            e=e_tail, n=n)


def fused_ffn_ln(x8: Array, ln_tbl, l1_tbl, grid, prod, l2_tbl, stream_rq,
                 tail_tbl=None, *, nbits: int, interpret=None):
    """One frozen FFN half-step on the int8 stream, with the residual join
    and (optionally) the NEXT sublayer's i-LayerNorm fused as a tail.

    x8: (B, T, d) int8.  Returns (x_join, tail8) — tail8 is None when
    tail_tbl is None (the last layer's ln_out stays float, outside).
    Bit-identical to: _apply_affine_rq(i_layernorm_core(x)) -> _ffn_mid ->
    _join_lin [-> _apply_affine_rq(i_layernorm_core(.))].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d = x8.shape
    tp = pad_t(t)
    xp = _pad_rows(x8, tp)

    def ln3(tbl):
        return jnp.stack([jnp.asarray(tbl["sgn"], jnp.int32),
                          jnp.asarray(tbl["b"], jnp.int32),
                          jnp.asarray(tbl["m"], jnp.int32)])

    def bm(tbl):
        return jnp.stack([jnp.asarray(tbl["b"], jnp.int32),
                          jnp.asarray(tbl["m"], jnp.int32)])

    has_tail = tail_tbl is not None
    kern = functools.partial(
        _ffn_kern, e_ln=int(ln_tbl["e"]), e1=int(l1_tbl["e"]),
        e2=int(l2_tbl["e"]), grid_m=int(grid[0]), grid_e=int(grid[1]),
        prod_m=int(prod[0]), prod_e=int(prod[1]),
        js_m=int(stream_rq[0]), js_e=int(stream_rq[1]),
        e_tail=int(tail_tbl["e"]) if has_tail else 0, nbits=nbits)
    if not has_tail:
        def kern1(x_ref, ln_ref, w1_ref, bm1_ref, w2_ref, bm2_ref, o_ref,
                  _k=kern):
            _k(x_ref, ln_ref, w1_ref, bm1_ref, w2_ref, bm2_ref, None,
               o_ref, None)
        body = kern1
    else:
        body = kern

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec, vec, vec, vec, vec,
    ]
    args = [xp, ln3(ln_tbl), jnp.asarray(l1_tbl["w"]), bm(l1_tbl),
            jnp.asarray(l2_tbl["w"]), bm(l2_tbl)]
    out_shape = [jax.ShapeDtypeStruct((b, tp, d), jnp.int8)]
    out_specs = [pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if has_tail:
        in_specs.append(vec)
        args.append(ln3(tail_tbl))
        out_shape.append(jax.ShapeDtypeStruct((b, tp, d), jnp.int8))
        out_specs.append(pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        body, grid=(b,), out_shape=out_shape, in_specs=in_specs,
        out_specs=out_specs, interpret=bool(interpret))(*args)
    xo = out[0][:, :t]
    return (xo, out[1][:, :t]) if has_tail else (xo, None)


# ---------------------------------------------------------------------------
# conv module (att_out join + LN + GLU + depthwise + BN/swish + pw2 join)
# ---------------------------------------------------------------------------


def _dw_taps(glu32, w_ref, pad_l: int, k_size: int, tp: int, interpret):
    """sum_k w[k] * glu[t + k - pad_l] with zero padding, via static
    sublane rolls.  Wrapped rows are masked (roll is circular)."""
    row = jax.lax.broadcasted_iota(jnp.int32, glu32.shape, 0)
    acc = jnp.zeros_like(glu32)
    for k in range(k_size):
        s = pad_l - k                     # roll down by s: y[t] = x[t - s]
        wk = w_ref[k:k + 1, :].astype(jnp.int32)
        if s == 0:
            acc = acc + glu32 * wk
            continue
        if interpret:
            xk = jnp.roll(glu32, s, axis=0)
        else:
            xk = pltpu.roll(glu32, s % tp, 0)
        if s > 0:
            xk = jnp.where(row < s, 0, xk)
        else:
            xk = jnp.where(row >= tp + s, 0, xk)
        acc = acc + xk * wk
    return acc


def _conv_kern(c_ref, x_ref, len_ref, ao_ref, bmao_ref, ln_ref, wag_ref,
               bmag_ref, dww_ref, dwbn_ref, w2_ref, bm2_ref, o_ref, *,
               d, e_ao, j2_m, j2_e, e_ln, e_a, e_g, glu_m, glu_e, pad_l,
               k_size,
               e_dw, bng_m, bng_e, bnp_m, bnp_e, e_2, j3_m, j3_e, nbits,
               interpret):
    n = 2 ** (nbits - 1) - 1
    tp = c_ref.shape[1]
    ln = len_ref[pl.program_id(0), 0]
    c8 = c_ref[0]                                        # (tp, d) int8
    x8 = x_ref[0]
    # att_out GEMM + residual join (conformer_freeze._join_lin)
    acc = _dot8(c8, ao_ref)
    yb = _rq(acc + bmao_ref[0:1, :], bmao_ref[1:2, :], e_ao)
    ys = _rq(x8.astype(jnp.int32), jnp.int32(j2_m), j2_e)
    x1 = jnp.clip(yb + ys, -n, n - 1).astype(jnp.int8)
    # ln_conv
    sgn, b_ln, m_ln = _ln3(ln_ref)
    yln8 = _affine8(i_layernorm_core(x1), sgn, b_ln, m_ln, e=e_ln, n=n)
    # GLU: one (d -> 2d) dot, then per-half requants (the halves target
    # different scales so their dyadic exponents differ); a-half clamps to
    # int8, g-half stays int32 on the sigmoid grid
    # (conformer_freeze._glu_int, bit for bit)
    acc_ag = _dot8(yln8, wag_ref) + bmag_ref[0:1, :]
    a8 = jnp.clip(_rq(acc_ag[:, :d], bmag_ref[1:2, :d], e_a), -n, n - 1
                  ).astype(jnp.int8)
    g_grid = _rq(acc_ag[:, d:], bmag_ref[1:2, d:], e_g)
    y_int = a8.astype(jnp.int32) * i_sigmoid_grid(g_grid)
    row = jax.lax.broadcasted_iota(jnp.int32, y_int.shape, 0)
    y_int = jnp.where(row >= ln, 0, y_int)               # pad mask
    glu8 = jnp.clip(_rq(y_int, jnp.int32(glu_m), glu_e), -n, n - 1
                    ).astype(jnp.int8)
    # depthwise conv + BN fold + i-swish (conformer_freeze._conv_tail_mid)
    acc_dw = _dw_taps(glu8.astype(jnp.int32), dww_ref, pad_l, k_size, tp,
                      interpret)
    dsgn, db, dm = _ln3(dwbn_ref)
    bn8 = _affine8(acc_dw, dsgn, db, dm, e=e_dw, n=n)
    mid8 = _swish8(bn8, bng_m, bng_e, bnp_m, bnp_e, n)
    # pw2 GEMM + residual join
    acc2 = _dot8(mid8, w2_ref)
    yb2 = _rq(acc2 + bm2_ref[0:1, :], bm2_ref[1:2, :], e_2)
    ys2 = _rq(x1.astype(jnp.int32), jnp.int32(j3_m), j3_e)
    o_ref[0] = jnp.clip(yb2 + ys2, -n, n - 1).astype(jnp.int8)


def fused_conv_block(c8: Array, x8: Array, lens: Array, tbl, padding,
                     *, nbits: int, interpret=None) -> Array:
    """The whole frozen conv-module sublayer INCLUDING the upstream
    attention-output join: c8 is the attention context (B, T, d) int8, x8
    the int8 stream entering the attention sublayer.  Returns the stream
    after the conv module's residual join, bit-identical to
    _join_lin(att_out) -> ln_conv -> _glu_int -> mask -> _conv_tail_mid ->
    _join_lin(pw2) in quantize/conformer_freeze.py.

    tbl: one frozen layer table (freeze_conformer's layers[i]).
    padding: the conv's (left, right) — right taps ride the same rolls.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d = x8.shape
    tp = pad_t(t)
    k_size = int(jnp.asarray(tbl["dw_w"]).shape[0])

    def bm(tb):
        return jnp.stack([jnp.asarray(tb["b"], jnp.int32),
                          jnp.asarray(tb["m"], jnp.int32)])

    ln3 = jnp.stack([jnp.asarray(tbl["ln_conv"]["sgn"], jnp.int32),
                     jnp.asarray(tbl["ln_conv"]["b"], jnp.int32),
                     jnp.asarray(tbl["ln_conv"]["m"], jnp.int32)])
    dwbn = jnp.stack([jnp.asarray(tbl["dw_bn"]["sgn"], jnp.int32),
                      jnp.asarray(tbl["dw_bn"]["b"], jnp.int32),
                      jnp.asarray(tbl["dw_bn"]["m"], jnp.int32)])
    w_ag = jnp.concatenate([jnp.asarray(tbl["pw1_a"]["w"]),
                            jnp.asarray(tbl["pw1_g"]["w"])], axis=1)
    bm_ag = jnp.stack([
        jnp.concatenate([jnp.asarray(tbl["pw1_a"]["b"], jnp.int32),
                         jnp.asarray(tbl["pw1_g"]["b"], jnp.int32)]),
        jnp.concatenate([jnp.asarray(tbl["pw1_a"]["m"], jnp.int32),
                         jnp.asarray(tbl["pw1_g"]["m"], jnp.int32)])])
    # (K, 1, d) conv weight -> (K, d) rows, one sublane per tap
    dww = jnp.asarray(tbl["dw_w"]).reshape(k_size, d)

    kern = functools.partial(
        _conv_kern, d=d, e_ao=int(tbl["att_out"]["e"]),
        j2_m=int(tbl["j2_stream"][0]), j2_e=int(tbl["j2_stream"][1]),
        e_ln=int(tbl["ln_conv"]["e"]), e_a=int(tbl["pw1_a"]["e"]),
        e_g=int(tbl["pw1_g"]["e"]),
        glu_m=int(tbl["glu_prod"][0]), glu_e=int(tbl["glu_prod"][1]),
        pad_l=int(padding[0]), k_size=k_size,
        e_dw=int(tbl["dw_bn"]["e"]),
        bng_m=int(tbl["bn_grid"][0]), bng_e=int(tbl["bn_grid"][1]),
        bnp_m=int(tbl["bn_prod"][0]), bnp_e=int(tbl["bn_prod"][1]),
        e_2=int(tbl["pw2"]["e"]),
        j3_m=int(tbl["j3_stream"][0]), j3_e=int(tbl["j3_stream"][1]),
        nbits=nbits, interpret=bool(interpret))

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), jnp.int8),
        in_specs=[blk, blk,
                  pl.BlockSpec((b, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  vec, vec, vec, vec, vec, vec, vec, vec, vec],
        out_specs=blk, interpret=bool(interpret),
    )(_pad_rows(c8, tp), _pad_rows(x8, tp),
      lens.astype(jnp.int32).reshape(b, 1),
      jnp.asarray(tbl["att_out"]["w"]), bm(tbl["att_out"]), ln3, w_ag,
      bm_ag, dww, dwbn, jnp.asarray(tbl["pw2"]["w"]), bm(tbl["pw2"]))
    return out[:, :t]
