"""Post-training quantization for the Conformer encoder.

Extends the Q-ASR recipe (reference quantize_model.py:40-117: QuantAct EMA
calibration + symmetric per-channel weight quantization) beyond the
reference's QuartzNet-only scope to the Conformer family
(models/conformer.py): every projection/matmul weight is quantized
per-out-channel, every matmul *input* activation goes through a calibrated
QuantAct site (init-on-first-batch then EMA, quant_modules.py:127-141 —
the exact `_ema_ranges` semantics the QuartzNet path uses), and the
matmuls execute as REAL int8 x int8 -> int32 `dot_general`s on the MXU.

Scope (deliberate, documented): the Conformer's glue ops — LayerNorm,
softmax, GLU, swish, BatchNorm, residual adds — stay float32.  The two
data-dependent attention matmuls (q·k incl. rel-pos, attn·v) default to
float but run int8 with dynamic per-tensor scales under
``quantize_attention=True`` (softmax's [0, 1] output uses its exact
constant scale).  This is the "integer GEMM + float glue" serving scheme:
all encoder matmul FLOPs (QKV/out/pos projections, both FFN pairs, the
conv module's pointwise pair, the depthwise conv, optionally the score /
context einsums) run on int8 inputs.  A fully integer pipeline
(I-BERT-style polynomial softmax/LN) is a recorded future lever, not
claimed here.

Quantized sites per layer (input-activation quantizers):
  ff1_in, ff1_mid        — FFN1 l1 / l2 inputs
  att_in, att_ctx        — LN output into q/k/v (shared), context into out
  conv_in, conv_glu,     — LN output into pw1, GLU output into depthwise,
  conv_mid                 swish output into pw2
  ff2_in, ff2_mid        — FFN2 l1 / l2 inputs
plus `pre_out` (subsampler flatten into the d_model projection) and, when
feat_out projects, `out_proj_in`.

Activation ranges are computed on pad-masked tensors (padded frames zeroed
first) so calibration and dynamic mode are batch-padding invariant.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.conformer import (
    ConformerConfig,
    _layer_norm,
    _swish,
    attention_mask,
    rel_positional_encoding,
)
from qasr_tpu.models.jasper import _batch_ranges, _ema_ranges
from qasr_tpu.ops.quant_prims import QTensor, quantize, symmetric_scale

Array = jax.Array

_LAYER_SITES = ("ff1_in", "ff1_mid", "att_in", "att_ctx", "conv_in",
                "conv_glu", "conv_mid", "ff2_in", "ff2_mid")
_LN_SITES = ("ln_ff1", "ln_att", "ln_conv", "ln_ff2", "ln_out")
_ACT_SITES = ("ff1_act", "ff2_act", "conv_a", "conv_bn")
_ATT_SITES = ("att_qu", "att_qv", "att_k", "att_v", "att_pos")


@dataclass(frozen=True)
class ConformerQuantConfig:
    """Mirror of the QuartzNet QuantConfig knobs that apply here.

    quantize_attention=True additionally runs the two data-dependent
    attention matmuls (q·k incl. the rel-pos term, attn·v) in int8 with
    *dynamic* per-tensor scales (pad-masked); softmax stays float.  The
    softmax output has a known [0, 1] range, so its scale is the exact
    1/(2^(act_bit-1)-1) constant — no calibration site needed."""

    weight_bit: int = 8
    act_bit: int = 8
    act_momentum: float = 0.95
    percentile: Optional[float] = None
    dynamic: bool = False
    quantize_attention: bool = False
    # integer_softmax=True (requires quantize_attention) computes the
    # attention softmax itself in integer arithmetic — the I-BERT i-softmax
    # (ops/integer_softmax.py): no transcendental between the two int8
    # attention GEMMs, output already at the fixed int8 scale attn·v eats.
    integer_softmax: bool = False
    # integer_layernorm=True replaces every LayerNorm's float statistics
    # with integer mean/variance and an integer Newton sqrt (the I-BERT
    # i-LayerNorm, ops/integer_layernorm.py) on a calibrated QuantAct of
    # the LN input; only the gamma/beta affine stays float.  Adds five
    # sites per layer (ln_ff1/ln_att/ln_conv/ln_ff2/ln_out).
    integer_layernorm: bool = False
    # integer_activations=True computes every swish / GLU-sigmoid as an
    # integer product: the sigmoid factor by the i-exp ratio
    # (ops/integer_sigmoid.py), the linear factor as the activation's own
    # quantized integers.  Adds four sites per layer
    # (ff1_act/ff2_act/conv_a/conv_bn).
    integer_activations: bool = False
    # static_attention=True replaces the dynamic per-batch attention scales
    # with CALIBRATED per-tensor sites on q+u, q+v, k, v and the projected
    # pos table (att_qu/att_qv/att_k/att_v/att_pos) — the prerequisite for
    # the fully frozen dyadic path (every scale known at freeze time).
    static_attention: bool = False

    def __post_init__(self):
        if self.integer_softmax and not self.quantize_attention:
            raise ValueError("integer_softmax requires quantize_attention")
        if self.integer_layernorm and self.act_bit > 8:
            # i_layernorm_core's int32 variance headroom is sized for
            # 8-bit inputs (|q - mu| <= 255: D*d^2 < 2^31 up to D=8192)
            raise ValueError("integer_layernorm supports act_bit <= 8")


def init_conformer_qstate(cfg: ConformerConfig,
                          qcfg: Optional["ConformerQuantConfig"] = None
                          ) -> Dict[str, Any]:
    """Zeroed QuantAct ranges for every site; x_min == x_max == 0 marks
    'uninitialised' for the init-on-first-batch rule (_ema_ranges).
    integer_layernorm adds the per-LN input sites."""
    z = {"x_min": jnp.zeros(()), "x_max": jnp.zeros(())}

    def site():
        return {k: v for k, v in z.items()}

    sites = _LAYER_SITES
    if qcfg is not None and qcfg.integer_layernorm:
        sites = sites + _LN_SITES
    if qcfg is not None and qcfg.integer_activations:
        sites = sites + _ACT_SITES
    if qcfg is not None and qcfg.static_attention:
        sites = sites + _ATT_SITES
    st: Dict[str, Any] = {
        "pre_out": site(),
        "layers": [{s: site() for s in sites}
                   for _ in range(cfg.n_layers)],
    }
    if cfg.feat_out > 0 and cfg.feat_out != cfg.d_model:
        st["out_proj_in"] = site()
    return st


# ---------------------------------------------------------------------------
# int8 building blocks
# ---------------------------------------------------------------------------


def _weight_qparams(w: Array, wbit: int, reduce_axes: Tuple[int, ...]
                    ) -> Tuple[Array, Array]:
    """Per-out-channel symmetric weight quantization (out axis = last)."""
    w_scale = symmetric_scale(jnp.min(w, axis=reduce_axes),
                              jnp.max(w, axis=reduce_axes), wbit)
    return quantize(w, w_scale, wbit).astype(jnp.int8), w_scale


def _act_quant(state, x_f: Array, valid: Optional[Array],
               qcfg: ConformerQuantConfig, update: bool
               ) -> Tuple[QTensor, Dict[str, Array]]:
    """QuantAct: per-tensor symmetric activation quantization with EMA
    ranges (quant_modules.py:107-170).  `valid` (B, T) masks padded frames
    out of the range statistics (broadcast over any trailing dims)."""
    if valid is None:
        xm = x_f
    else:
        vm = valid.reshape(valid.shape + (1,) * (x_f.ndim - valid.ndim))
        xm = x_f * vm
    if update or qcfg.dynamic:
        bmin, bmax = _batch_ranges(xm, qcfg.percentile)
    new_state = (_ema_ranges(state, bmin, bmax, qcfg.act_momentum)
                 if update else state)
    if qcfg.dynamic:
        x_min, x_max = bmin, bmax
    else:
        x_min, x_max = new_state["x_min"], new_state["x_max"]
    scale = symmetric_scale(x_min, x_max, qcfg.act_bit)
    q = quantize(x_f, scale, qcfg.act_bit).astype(jnp.int8)
    return QTensor(q, scale), new_state


def _qlinear(p, xq: QTensor, wbit: int) -> Array:
    """int8 x int8 -> int32 dot on the MXU, float epilogue.

    Accepts either raw float params {"w", "b"} (weights quantized on the
    fly — XLA folds the quantization of closed-over params) or pre-frozen
    {"w_int8", "w_scale", "b"} from quantize_conformer_weights."""
    if "w_int8" in p:
        w_int8, w_scale = p["w_int8"], p["w_scale"]
    else:
        w_int8, w_scale = _weight_qparams(p["w"], wbit, (0,))
    acc = jax.lax.dot_general(
        xq.values, w_int8, (((xq.values.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xq.scale * w_scale)
    b = p.get("b")
    return y if b is None else y + b


def _qdepthwise(p, xq: QTensor, wbit: int, padding=None) -> Array:
    """int8 depthwise conv (W, 1, D kernel), SAME (or causal) padding,
    int32 accum."""
    if "w_int8" in p:
        w_int8, w_scale = p["w_int8"], p["w_scale"]
    else:
        w_int8, w_scale = _weight_qparams(p["w"], wbit, (0, 1))
    k = w_int8.shape[0]
    if padding is None:
        padding = ((k - 1) // 2, (k - 1) // 2)
    acc = jax.lax.conv_general_dilated(
        xq.values, w_int8, (1,), [tuple(padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=xq.values.shape[-1],
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xq.scale * w_scale) + p["b"]


def quantize_conformer_weights(params, cfg: ConformerConfig, wbit: int):
    """Pre-freeze every quantized site's weights to int8 + per-channel
    scales so serving does no per-step weight quantization.  Returns a new
    params tree; non-quantized leaves (LN/BN, biases, pos biases, the
    subsampler convs) are shared by reference."""

    def frz_lin(p, axes=(0,)):
        w_int8, w_scale = _weight_qparams(jnp.asarray(p["w"]), wbit, axes)
        out = {"w_int8": w_int8, "w_scale": w_scale}
        if "b" in p:
            out["b"] = p["b"]
        return out

    new = dict(params)
    layers = []
    for lp in params["layers"]:
        nl = dict(lp)
        nl["ff1"] = {"l1": frz_lin(lp["ff1"]["l1"]), "l2": frz_lin(lp["ff1"]["l2"])}
        nl["ff2"] = {"l1": frz_lin(lp["ff2"]["l1"]), "l2": frz_lin(lp["ff2"]["l2"])}
        nl["att"] = {k: frz_lin(lp["att"][k]) for k in ("q", "k", "v", "out", "pos")}
        cv = lp["conv"]
        nl["conv"] = {
            # pw convs are (1, D, C) kernels — treat as linears on w[0]
            "pw1": frz_lin({"w": cv["pw1"]["w"][0], "b": cv["pw1"]["b"]}),
            "pw2": frz_lin({"w": cv["pw2"]["w"][0], "b": cv["pw2"]["b"]}),
            "dw": frz_lin({"w": cv["dw"]["w"], "b": cv["dw"]["b"]}, axes=(0, 1)),
            "bn": cv["bn"],
        }
        layers.append(nl)
    new["layers"] = layers
    if "out_proj" in params:
        new["out_proj"] = frz_lin(params["out_proj"])
    return new


def _conv_pw(p, key):
    """Conv-module pointwise params as a linear: raw (1, D, C) kernel or
    already-frozen dict."""
    q = p[key]
    if "w_int8" in q:
        return q
    return {"w": q["w"][0], "b": q["b"]}


# ---------------------------------------------------------------------------
# quantized forward
# ---------------------------------------------------------------------------


def _q_rel_attention(p, st, xq: QTensor, pos_emb, att_mask, valid,
                     pos_bias_u, pos_bias_v, n_heads: int,
                     qcfg: ConformerQuantConfig, update: bool):
    """rel_attention (models/conformer.py) with int8 projections.  The
    q·k / attn·v matmuls and softmax stay float (module docstring)."""
    b, t = xq.values.shape[:2]
    d = (p["q"]["w_int8"] if "w_int8" in p["q"] else p["q"]["w"]).shape[-1]
    d_k = d // n_heads
    q = _qlinear(p["q"], xq, qcfg.weight_bit).reshape(b, t, n_heads, d_k)
    k = _qlinear(p["k"], xq, qcfg.weight_bit).reshape(b, t, n_heads, d_k)
    v = _qlinear(p["v"], xq, qcfg.weight_bit).reshape(b, t, n_heads, d_k)
    # pos table is deterministic (sinusoids in [-1, 1]): quantize with its
    # own exact range, no calibration site needed
    pos_scale = symmetric_scale(jnp.min(pos_emb), jnp.max(pos_emb),
                                qcfg.act_bit)
    posq = QTensor(quantize(pos_emb, pos_scale, qcfg.act_bit).astype(jnp.int8),
                   pos_scale)
    pos = _qlinear(p["pos"], posq, qcfg.weight_bit).reshape(2 * t - 1,
                                                            n_heads, d_k)
    q_u = q + pos_bias_u
    q_v = q + pos_bias_v
    if qcfg.quantize_attention:
        # int8 attention operands: scores/context ride the MXU as
        # i8 x i8 -> i32 einsums.  static_attention uses CALIBRATED sites
        # (freeze-compatible: every scale static); otherwise dynamic
        # per-batch per-tensor scales, both pad-masked.
        vm = valid[..., None, None]  # (b, t, 1, 1)

        def dyn8(x):
            s = symmetric_scale(jnp.min(x), jnp.max(x), qcfg.act_bit)
            return QTensor(quantize(x, s, qcfg.act_bit).astype(jnp.int8), s)

        if qcfg.static_attention:
            qu8, st["att_qu"] = _act_quant(st["att_qu"], q_u, valid,
                                           qcfg, update)
            qv8, st["att_qv"] = _act_quant(st["att_qv"], q_v, valid,
                                           qcfg, update)
            k8, st["att_k"] = _act_quant(st["att_k"], k, valid, qcfg, update)
            p8, st["att_pos"] = _act_quant(st["att_pos"], pos, None,
                                           qcfg, update)
        else:
            qu8 = dyn8(q_u * vm)
            qv8 = dyn8(q_v * vm)
            k8 = dyn8(k * vm)
            p8 = dyn8(pos)
        ac = jnp.einsum("bihd,bjhd->bhij", qu8.values, k8.values,
                        preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * (qu8.scale * k8.scale)
        bd_full = jnp.einsum("bihd,phd->bhip", qv8.values, p8.values,
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * (qv8.scale * p8.scale)
    else:
        ac = jnp.einsum("bihd,bjhd->bhij", q_u, k)
        bd_full = jnp.einsum("bihd,phd->bhip", q_v, pos)
    idx = (t - 1) + np.arange(t)[:, None] - np.arange(t)[None, :]
    bd = jnp.take_along_axis(bd_full, jnp.asarray(idx)[None, None], axis=-1)
    scores = (ac + bd) / math.sqrt(d_k)
    mask_h = att_mask[:, None]
    n = 2 ** (qcfg.act_bit - 1) - 1
    if qcfg.quantize_attention and qcfg.integer_softmax:
        from qasr_tpu.ops.integer_softmax import i_softmax

        a8 = i_softmax(scores, mask=mask_h,
                       out_bits=qcfg.act_bit).astype(jnp.int8)
    else:
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(mask_h, neg, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(mask_h, 0.0, attn)
        if qcfg.quantize_attention:
            a8 = jnp.round(attn * n).astype(jnp.int8)  # exact [0,1] range
    if qcfg.quantize_attention:
        if qcfg.static_attention:
            v8, st["att_v"] = _act_quant(st["att_v"], v, valid, qcfg, update)
        else:
            v8 = dyn8(v * valid[..., None, None])
        ctx = (jnp.einsum("bhij,bjhd->bihd", a8, v8.values,
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32) * (v8.scale / n)
               ).reshape(b, t, d)
    else:
        ctx = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, t, d)
    cq, st["att_ctx"] = _act_quant(st["att_ctx"], ctx, valid, qcfg, update)
    return _qlinear(p["out"], cq, qcfg.weight_bit), st


def _q_conv_module(p, st, x: Array, pad_mask, valid,
                   qcfg: ConformerQuantConfig, update: bool,
                   dw_padding=None):
    """conformer_conv_module with int8 pw1/dw/pw2 (BN/GLU/swish float)."""
    xq, st["conv_in"] = _act_quant(st["conv_in"], x, valid, qcfg, update)
    y = _qlinear(_conv_pw(p, "pw1"), xq, qcfg.weight_bit)
    a, g = jnp.split(y, 2, axis=-1)
    if qcfg.integer_activations:
        from qasr_tpu.ops.integer_sigmoid import K_SIG, i_sigmoid_fp

        aq, st["conv_a"] = _act_quant(st["conv_a"], a, valid, qcfg, update)
        y_int = aq.values.astype(jnp.int32) * i_sigmoid_fp(g)
        y = y_int.astype(jnp.float32) * (aq.scale / (1 << K_SIG))
    else:
        y = a * jax.nn.sigmoid(g)  # GLU over channel halves
    y = jnp.where(pad_mask[:, :, None], 0.0, y)
    yq, st["conv_glu"] = _act_quant(st["conv_glu"], y, valid, qcfg, update)
    y = _qdepthwise(p["dw"], yq, qcfg.weight_bit, padding=dw_padding)
    bn = p["bn"]
    y = (y - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * bn["gamma"] + bn["beta"]
    if qcfg.integer_activations:
        y, st = _i_swish(st, "conv_bn", y, valid, qcfg, update)
    else:
        y = _swish(y)
    yq, st["conv_mid"] = _act_quant(st["conv_mid"], y, valid, qcfg, update)
    return _qlinear(_conv_pw(p, "pw2"), yq, qcfg.weight_bit), st


def _q_layer_norm(p_ln, st, key, x, valid, qcfg, update):
    """LayerNorm with optional integer statistics (i-LayerNorm): quantize
    the LN input on its own site, normalize with integer mean/var/sqrt."""
    if not qcfg.integer_layernorm:
        return _layer_norm(p_ln, x), st
    from qasr_tpu.ops.integer_layernorm import i_layernorm

    xq, st[key] = _act_quant(st[key], x, valid, qcfg, update)
    return i_layernorm(xq.values, p_ln["gamma"], p_ln["beta"]), st


def _i_swish(st, key, x, valid, qcfg, update):
    """Integer swish: x's own quantized integers times the i-exp sigmoid
    fraction (ops/integer_sigmoid.py)."""
    from qasr_tpu.ops.integer_sigmoid import K_SIG, i_swish_terms

    xq, st[key] = _act_quant(st[key], x, valid, qcfg, update)
    y = i_swish_terms(xq.values, xq.dequantize())
    return y.astype(jnp.float32) * (xq.scale / (1 << K_SIG)), st


def _q_feed_forward(p, st, x, valid, pre, qcfg, update):
    xq, st[f"{pre}_in"] = _act_quant(st[f"{pre}_in"], x, valid, qcfg, update)
    h = _qlinear(p["l1"], xq, qcfg.weight_bit)
    if qcfg.integer_activations:
        y, st = _i_swish(st, f"{pre}_act", h, valid, qcfg, update)
    else:
        y = _swish(h)
    yq, st[f"{pre}_mid"] = _act_quant(st[f"{pre}_mid"], y, valid, qcfg, update)
    return _qlinear(p["l2"], yq, qcfg.weight_bit), st


def conformer_encoder_apply_ptq(params, cfg: ConformerConfig,
                                qcfg: ConformerQuantConfig,
                                qstate, x: Array, lens: Array,
                                *, update: bool = False
                                ) -> Tuple[Array, Array, Any]:
    """Quantized conformer_encoder_apply (eval graph: no dropout).

    update=True  -> calibration pass: returns EMA-updated qstate
    update=False -> static eval with qstate ranges (or per-batch ranges
                    when qcfg.dynamic)

    Returns (encodings, lens, new_qstate).  The float skeleton mirrors
    conformer_encoder_apply (models/conformer.py:275-328) — layer order,
    masks, half-step FFNs, xscaling — with every projection routed through
    the int8 path.  The subsampler's 2D convs stay float (one-time cost,
    <2% of FLOPs); its flatten->d_model projection is quantized.
    """
    new_q = jax.tree_util.tree_map(lambda a: a, qstate)
    if cfg.subsampling:
        p_pre = params["pre_encode"]
        # float 2D convs (shared helper), then the (c*f -> d) projection
        # through the int8 machinery
        from qasr_tpu.models.conformer import subsample_convs

        y, lens = subsample_convs(p_pre, cfg, x, lens)
        t = y.shape[1]
        valid0 = jnp.arange(t)[None, :] < lens[:, None]
        yq, new_q["pre_out"] = _act_quant(new_q["pre_out"], y, valid0,
                                          qcfg, update)
        x = _qlinear(p_pre["out"], yq, qcfg.weight_bit)
    else:
        # feat_in projection: small; quantize via the pre_out site too
        t = x.shape[1]
        valid0 = jnp.arange(t)[None, :] < lens[:, None]
        yq, new_q["pre_out"] = _act_quant(new_q["pre_out"], x, valid0,
                                          qcfg, update)
        x = _qlinear(params["pre_encode"]["linear"], yq, qcfg.weight_bit)

    t = x.shape[1]
    if cfg.xscaling:
        x = x * math.sqrt(cfg.d_model)
    pos_emb = jnp.asarray(rel_positional_encoding(t, cfg.d_model, None))

    valid = jnp.arange(t)[None, :] < lens[:, None]
    att_mask = attention_mask(valid, cfg.att_context_size)
    pad_mask = ~valid
    vmask = valid.astype(jnp.float32)

    u = params.get("pos_bias_u")
    v = params.get("pos_bias_v")
    for li, lp in enumerate(params["layers"]):
        st = new_q["layers"][li]
        bu = lp.get("pos_bias_u", u)
        bv = lp.get("pos_bias_v", v)
        r = x
        y, st = _q_layer_norm(lp["norm_ff1"], st, "ln_ff1", x, vmask,
                              qcfg, update)
        y, st = _q_feed_forward(lp["ff1"], st, y, vmask, "ff1", qcfg, update)
        x = 0.5 * y + r
        r = x
        y, st = _q_layer_norm(lp["norm_att"], st, "ln_att", x, vmask,
                              qcfg, update)
        yq, st["att_in"] = _act_quant(st["att_in"], y, vmask, qcfg, update)
        if cfg.self_attention_model == "rel_pos":
            y, st = _q_rel_attention(lp["att"], st, yq, pos_emb, att_mask,
                                     vmask, bu, bv, cfg.n_heads, qcfg, update)
        else:
            raise NotImplementedError(
                "abs-pos attention under PTQ: add an att site per projection "
                "(rel_pos is the Conformer default, conformer_encoder.py:199)")
        x = y + r
        r = x
        y, st = _q_layer_norm(lp["norm_conv"], st, "ln_conv", x, vmask,
                              qcfg, update)
        y, st = _q_conv_module(lp["conv"], st, y, pad_mask, vmask,
                               qcfg, update, dw_padding=cfg.dw_padding)
        x = y + r
        r = x
        y, st = _q_layer_norm(lp["norm_ff2"], st, "ln_ff2", x, vmask,
                              qcfg, update)
        y, st = _q_feed_forward(lp["ff2"], st, y, vmask, "ff2", qcfg, update)
        x = 0.5 * y + r
        x, st = _q_layer_norm(lp["norm_out"], st, "ln_out", x, vmask,
                              qcfg, update)
        new_q["layers"][li] = st
    if "out_proj" in params:
        xq, new_q["out_proj_in"] = _act_quant(new_q["out_proj_in"], x,
                                              vmask, qcfg, update)
        x = _qlinear(params["out_proj"], xq, qcfg.weight_bit)
    return x, lens, new_q


def calibrate_conformer(params, cfg: ConformerConfig,
                        qcfg: ConformerQuantConfig, batches,
                        qstate=None):
    """Run EMA calibration over an iterable of (feats (B,T,F), lens (B,))
    batches; returns the final qstate (quantize_model.py:73-75 pattern).
    One jitted executable, reused across batches (static shapes)."""
    if qstate is None:
        qstate = init_conformer_qstate(cfg, qcfg)

    @jax.jit
    def step(p, qs, feats, lens):
        # params ride as arguments, not baked constants: the compile
        # payload stays O(program) (a d_model>=512 encoder's weights
        # exceed payload-capped remote-compile transports)
        _, _, nq = conformer_encoder_apply_ptq(p, cfg, qcfg, qs,
                                               feats, lens, update=True)
        return nq

    for feats, lens in batches:
        qstate = step(params, qstate, jnp.asarray(feats), jnp.asarray(lens))
    return qstate


# ---------------------------------------------------------------------------
# QAT: differentiable fake-quant forward
# ---------------------------------------------------------------------------


def conformer_encoder_apply_qat(params, cfg: ConformerConfig,
                                qcfg: ConformerQuantConfig,
                                x: Array, lens: Array, *,
                                rng=None) -> Tuple[Array, Array]:
    """Quantization-aware-training forward: the float Conformer with
    straight-through fake quantization at every PTQ matmul site — STE
    per-out-channel weight quant + per-batch dynamic (stop-gradient,
    pad-masked) activation ranges, the same recipe the QuartzNet QATExec
    uses (reference quantize_model.py:69-71 train mode; per-batch ranges).
    Glue ops stay float (QAT trains tolerance to GEMM quantization noise;
    the integer glue is an inference detail).  Differentiable end to end;
    dropout from `rng` like conformer_encoder_apply."""
    import math as _math

    from qasr_tpu.models.conformer import (
        rel_positional_encoding as _rpe, subsample_convs,
    )
    from qasr_tpu.ops.fake_quant import (
        fake_quant_symmetric, fake_quant_weights,
    )  # noqa: F401 (fake_quant_symmetric: fq_act)

    if cfg.self_attention_model != "rel_pos":
        raise NotImplementedError(
            "abs-pos attention under QAT (rel_pos is the Conformer default, "
            "conformer_encoder.py:199)")
    ab, wb = qcfg.act_bit, qcfg.weight_bit

    def fq_act(v, valid):
        vd = jax.lax.stop_gradient(v)
        if valid is not None:
            vm = valid.reshape(valid.shape + (1,) * (vd.ndim - valid.ndim))
            vd = vd * vm
        scale = symmetric_scale(jnp.min(vd), jnp.max(vd), ab)
        return fake_quant_symmetric(v, scale, ab)

    def fq_lin(p, v):
        y = jnp.matmul(v, fake_quant_weights(p["w"], wb))
        return y + p["b"] if "b" in p else y

    if cfg.subsampling:
        y, lens = subsample_convs(params["pre_encode"], cfg, x, lens)
        t0 = y.shape[1]
        valid0 = jnp.arange(t0)[None, :] < lens[:, None]
        x = fq_lin(params["pre_encode"]["out"],
                   fq_act(y, valid0.astype(y.dtype)))
    else:
        t0 = x.shape[1]
        valid0 = jnp.arange(t0)[None, :] < lens[:, None]
        x = fq_lin(params["pre_encode"]["linear"],
                   fq_act(x, valid0.astype(x.dtype)))

    t = x.shape[1]
    if cfg.xscaling:
        x = x * _math.sqrt(cfg.d_model)
    pos_emb = jnp.asarray(_rpe(t, cfg.d_model, None))
    valid = jnp.arange(t)[None, :] < lens[:, None]
    att_mask = attention_mask(valid, cfg.att_context_size)
    pad_mask = ~valid
    vmask = valid.astype(jnp.float32)
    d, h = cfg.d_model, cfg.n_heads
    d_k = d // h

    def dropout(y, rate):
        nonlocal rng
        if rate <= 0 or rng is None:
            return y
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - rate, y.shape)
        return jnp.where(keep, y / (1.0 - rate), 0.0)

    u = params.get("pos_bias_u")
    v_b = params.get("pos_bias_v")
    for lp in params["layers"]:
        bu = lp.get("pos_bias_u", u)
        bv = lp.get("pos_bias_v", v_b)
        r = x
        y = _layer_norm(lp["norm_ff1"], x)
        y = fq_lin(lp["ff1"]["l1"], fq_act(y, vmask))
        y = fq_lin(lp["ff1"]["l2"], fq_act(_swish(y), vmask))
        x = 0.5 * dropout(y, cfg.dropout) + r
        r = x
        y = _layer_norm(lp["norm_att"], x)
        yq = fq_act(y, vmask)
        q = fq_lin(lp["att"]["q"], yq).reshape(-1, t, h, d_k)
        k = fq_lin(lp["att"]["k"], yq).reshape(-1, t, h, d_k)
        v = fq_lin(lp["att"]["v"], yq).reshape(-1, t, h, d_k)
        pos = fq_lin(lp["att"]["pos"],
                     fq_act(pos_emb, None)).reshape(2 * t - 1, h, d_k)
        q_u, q_v = q + bu, q + bv
        if qcfg.quantize_attention:
            q_u = fq_act(q_u, vmask)
            q_v = fq_act(q_v, vmask)
            k = fq_act(k, vmask)
            v = fq_act(v, vmask)
        ac = jnp.einsum("bihd,bjhd->bhij", q_u, k)
        bd_full = jnp.einsum("bihd,phd->bhip", q_v, pos)
        idx = ((t - 1) + np.arange(t)[:, None] - np.arange(t)[None, :])
        bd = jnp.take_along_axis(bd_full, jnp.asarray(idx)[None, None],
                                 axis=-1)
        scores = (ac + bd) / _math.sqrt(d_k)
        scores = jnp.where(att_mask[:, None],
                           jnp.finfo(scores.dtype).min, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(att_mask[:, None], 0.0, attn)
        ctx = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(-1, t, d)
        y = fq_lin(lp["att"]["out"], fq_act(ctx, vmask))
        x = dropout(y, cfg.dropout) + r
        r = x
        y = _layer_norm(lp["norm_conv"], x)
        cv = lp["conv"]
        y = fq_lin({"w": cv["pw1"]["w"][0], "b": cv["pw1"]["b"]},
                   fq_act(y, vmask))
        a, g = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(g)
        y = jnp.where(pad_mask[:, :, None], 0.0, y)
        kk = cv["dw"]["w"].shape[0]
        # depthwise: per-channel (last axis) weight fake-quant
        w_dw = fake_quant_weights(cv["dw"]["w"], wb)
        from qasr_tpu.ops.grouped_conv import grouped_conv1d

        y = grouped_conv1d(fq_act(y, vmask), w_dw, 1,
                           cfg.dw_padding, 1, d,
                           None, None) + cv["dw"]["b"]
        bn = cv["bn"]
        y = (y - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * bn["gamma"] \
            + bn["beta"]
        y = _swish(y)
        y = fq_lin({"w": cv["pw2"]["w"][0], "b": cv["pw2"]["b"]},
                   fq_act(y, vmask))
        x = dropout(y, cfg.dropout) + r
        r = x
        y = _layer_norm(lp["norm_ff2"], x)
        y = fq_lin(lp["ff2"]["l1"], fq_act(y, vmask))
        y = fq_lin(lp["ff2"]["l2"], fq_act(_swish(y), vmask))
        x = 0.5 * dropout(y, cfg.dropout) + r
        x = _layer_norm(lp["norm_out"], x)
    if "out_proj" in params:
        x = fq_lin(params["out_proj"], fq_act(x, vmask))
    return x, lens
