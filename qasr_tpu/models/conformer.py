"""Conformer encoder (functional JAX).

Equivalent of the reference ConformerEncoder
(modules/conformer_encoder.py:32-240) with its parts:
ConformerEncoderBlock (conformer_modules.py:25-118: half-step FFNs,
self-attention, conv module, final LayerNorm), ConformerConvolution
(conformer_modules.py:120-166: pw -> GLU -> depthwise -> BN -> swish -> pw),
RelPositionMultiHeadAttention with the legacy rel-shift
(multi_head_attention.py:134-211: scores[i,j] uses relative index i-j into a
(2T-1)-long sinusoidal table), and ConvSubsampling (subsampling.py:21-130,
'vggnet' and 'striding' variants).

Layout: (B, T, D) channels-last; attention matmuls hit the MXU; the rel-shift
is a take_along_axis gather instead of the reference's view/pad/flip trick.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
HI = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class ConformerConfig:
    feat_in: int
    n_layers: int = 16
    d_model: int = 256
    feat_out: int = -1
    subsampling: str = "striding"       # 'vggnet' | 'striding' | '' (linear)
    subsampling_factor: int = 4
    subsampling_conv_channels: int = 64
    ff_expansion_factor: int = 4
    self_attention_model: str = "rel_pos"
    pos_emb_max_len: int = 5000
    n_heads: int = 4
    xscaling: bool = True
    untie_biases: bool = False
    conv_kernel_size: int = 31
    # local (limited-context) self-attention: an int bounds BOTH sides, a
    # (left, right) pair bounds them separately — (L, 0) + causal_conv is
    # the zero-lookahead cache-aware streaming configuration NeMo's
    # streaming conformers use (-1 = unlimited).  Bounds the encoder's
    # receptive field for streaming/long-form serving (absent upstream).
    att_context_size: Any = -1
    # causal depthwise convs: all (k-1) pad on the left — no conv
    # lookahead, required for zero-lookahead streaming
    causal_conv: bool = False
    dropout: float = 0.1
    dropout_emb: float = 0.1
    dropout_att: float = 0.0

    @property
    def att_context(self) -> Tuple[int, int]:
        """(left, right) attention context; (-1, -1) = unlimited."""
        v = self.att_context_size
        if v is None:
            return (-1, -1)
        if isinstance(v, (tuple, list)):
            left, right = int(v[0]), int(v[1])
            return (left, right)
        return (int(v), int(v))

    @property
    def dw_padding(self) -> Tuple[int, int]:
        k = self.conv_kernel_size
        return (k - 1, 0) if self.causal_conv else ((k - 1) // 2,
                                                    (k - 1) // 2)

    @property
    def d_ff(self) -> int:
        return self.d_model * self.ff_expansion_factor


# ---------------------------------------------------------------------------
# init (torch Linear/Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
# ---------------------------------------------------------------------------


def _linear(rng, din, dout, bias=True):
    bound = 1.0 / math.sqrt(din)
    p = {"w": rng.uniform(-bound, bound, (din, dout)).astype(np.float32)}
    if bias:
        p["b"] = rng.uniform(-bound, bound, (dout,)).astype(np.float32)
    return p


def _conv2d(rng, cin, cout, k):
    fan_in = cin * k * k
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": rng.uniform(-bound, bound, (k, k, cin, cout)).astype(np.float32),
            "b": rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def _conv1d(rng, cin_g, cout, k):
    fan_in = cin_g * k
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": rng.uniform(-bound, bound, (k, cin_g, cout)).astype(np.float32),
            "b": rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def _ln(d):
    return {"gamma": np.ones((d,), np.float32), "beta": np.zeros((d,), np.float32)}


def init_conformer_params(seed, cfg: ConformerConfig) -> Dict[str, Any]:
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    d, h = cfg.d_model, cfg.n_heads
    d_k = d // h
    params: Dict[str, Any] = {}
    if cfg.subsampling:
        n_sub = int(math.log2(cfg.subsampling_factor))
        convs = []
        cin = 1
        cc = cfg.subsampling_conv_channels
        for _ in range(n_sub):
            if cfg.subsampling == "vggnet":
                convs.append({"c1": _conv2d(rng, cin, cc, 3), "c2": _conv2d(rng, cc, cc, 3)})
            else:
                convs.append({"c1": _conv2d(rng, cin, cc, 3)})
            cin = cc
        f_out = cfg.feat_in
        for _ in range(n_sub):
            f_out = _sub_out_len(f_out, cfg.subsampling)
        params["pre_encode"] = {"convs": convs,
                                "out": _linear(rng, cc * f_out, d)}
    else:
        params["pre_encode"] = {"linear": _linear(rng, cfg.feat_in, d)}
    if cfg.self_attention_model == "rel_pos" and not cfg.untie_biases:
        params["pos_bias_u"] = np.zeros((h, d_k), np.float32)
        params["pos_bias_v"] = np.zeros((h, d_k), np.float32)
    layers = []
    for _ in range(cfg.n_layers):
        lp = {
            "norm_ff1": _ln(d), "ff1": {"l1": _linear(rng, d, cfg.d_ff),
                                        "l2": _linear(rng, cfg.d_ff, d)},
            "norm_conv": _ln(d),
            "conv": {"pw1": _conv1d(rng, d, 2 * d, 1),
                     "dw": _conv1d(rng, 1, d, cfg.conv_kernel_size),
                     "bn": {"gamma": np.ones((d,), np.float32),
                            "beta": np.zeros((d,), np.float32),
                            "mean": np.zeros((d,), np.float32),
                            "var": np.ones((d,), np.float32)},
                     "pw2": _conv1d(rng, d, d, 1)},
            "norm_att": _ln(d),
            "att": {"q": _linear(rng, d, d), "k": _linear(rng, d, d),
                    "v": _linear(rng, d, d), "out": _linear(rng, d, d),
                    "pos": _linear(rng, d, d, bias=False)},
            "norm_ff2": _ln(d), "ff2": {"l1": _linear(rng, d, cfg.d_ff),
                                        "l2": _linear(rng, cfg.d_ff, d)},
            "norm_out": _ln(d),
        }
        if cfg.untie_biases and cfg.self_attention_model == "rel_pos":
            lp["pos_bias_u"] = np.zeros((h, d_k), np.float32)
            lp["pos_bias_v"] = np.zeros((h, d_k), np.float32)
        layers.append(lp)
    params["layers"] = layers
    if cfg.feat_out > 0 and cfg.feat_out != d:
        params["out_proj"] = _linear(rng, d, cfg.feat_out)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _apply_linear(p, x):
    y = jnp.matmul(x, p["w"], precision=HI)
    return y + p["b"] if "b" in p else y


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["gamma"] + p["beta"]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def attention_mask(valid: Array, att_context_size) -> Array:
    """True = masked: padding pairs, plus out-of-context pairs when local
    attention is enabled.  att_context_size: int (symmetric), (left, right)
    pair, or -1/None (unlimited); query i may attend key j iff
    -right <= i - j <= left."""
    t = valid.shape[1]
    mask = ~(valid[:, :, None] & valid[:, None, :])
    if isinstance(att_context_size, (tuple, list)):
        left, right = int(att_context_size[0]), int(att_context_size[1])
    elif att_context_size is None:
        left = right = -1
    else:
        left = right = int(att_context_size)
    idx = jnp.arange(t)
    diff = idx[:, None] - idx[None, :]   # i - j
    far = jnp.zeros((t, t), bool)
    if left >= 0:
        far = far | (diff > left)
    if right >= 0:
        far = far | (-diff > right)
    if left >= 0 or right >= 0:
        mask = mask | far[None]
    return mask


def _sub_out_len(length: int, kind: str) -> int:
    if kind == "vggnet":  # maxpool k2 s2 ceil
        return int(math.ceil((length - 2) / 2 + 1))
    return int(math.floor((length - 3) / 2 + 1))  # conv k3 s2 p0


def _sub_out_len_arr(lens, kind: str):
    if kind == "vggnet":
        return jnp.ceil((lens - 2) / 2 + 1).astype(lens.dtype)
    return jnp.floor((lens.astype(jnp.float32) - 3) / 2 + 1).astype(lens.dtype)


def sub_prec_flag() -> str:
    """Effective QASR_SUB_PREC: lowering of the float subsampler convs.

    'hi'   — fp32 at Precision.HIGHEST (the bit-stable reference lowering;
             default off-TPU, where fp32 is native and free).
    'f32'  — fp32 at Precision.DEFAULT (on TPU: fewer bf16 passes).
    'bf16' — bf16 inputs/weights with fp32 accumulation: ONE MXU pass per
             dot instead of HIGHEST's multi-pass fp32 emulation.  Default
             on TPU (measured: experiments/subsampler_probe.py, PERF.md
             round 5 — the subsampler is the frozen Conformer's one float
             region and its output is immediately quantized to int8, so
             bf16 noise is sub-quantization-step).
    Trace-time flag; read through effective_kernel_flags() for cache keys.
    """
    import os

    v = os.environ.get("QASR_SUB_PREC")
    if v is not None:
        return v
    return "bf16" if jax.default_backend() == "tpu" else "hi"


def subsample_convs(p, cfg: ConformerConfig, x: Array, lens: Array):
    """The subsampler's conv/pool stack + channel flatten, WITHOUT the
    d_model projection: (B, T, F) -> ((B, T', c*f), lens').  Shared by the
    float, PTQ and frozen paths (the quantized paths route the projection
    through their own int8 machinery).  Conv precision per QASR_SUB_PREC."""
    prec = sub_prec_flag()
    if prec == "bf16":
        # bf16 in AND out (f32 MXU accumulation, output rounded to bf16),
        # then an explicit upcast.  NOT preferred_element_type=f32: that
        # form's conv transpose receives an f32 cotangent against bf16
        # operands and lax rejects the dtype mix, breaking value_and_grad
        # through the float training path; with bf16-out the astype
        # transpose recasts the cotangent and the whole VJP stays bf16.
        def conv(v, w, strides, pads):
            return jax.lax.conv_general_dilated(
                v.astype(jnp.bfloat16), w.astype(jnp.bfloat16), strides,
                pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32)
    else:
        p_lax = HI if prec == "hi" else jax.lax.Precision.DEFAULT

        def conv(v, w, strides, pads):
            return jax.lax.conv_general_dilated(
                v, w, strides, pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=p_lax)

    y = x[:, :, :, None]  # NHWC: (B, T, F, 1)
    for blk in p["convs"]:
        if cfg.subsampling == "vggnet":
            y = conv(y, blk["c1"]["w"], (1, 1), [(1, 1), (1, 1)]) + blk["c1"]["b"]
            y = jax.nn.relu(y)
            y = conv(y, blk["c2"]["w"], (1, 1), [(1, 1), (1, 1)]) + blk["c2"]["b"]
            y = jax.nn.relu(y)
            # maxpool k2 s2 ceil_mode: pad to even with -inf then reduce
            pads = [(0, y.shape[1] % 2, 0), (0, y.shape[2] % 2, 0)]
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                [(0, 0), pads[0][:2], pads[1][:2], (0, 0)])
        else:
            y = conv(y, blk["c1"]["w"], (2, 2), [(0, 0), (0, 0)]) + blk["c1"]["b"]
            y = jax.nn.relu(y)
        lens = _sub_out_len_arr(lens, cfg.subsampling)
    b, t, f, c = y.shape
    y = y.transpose(0, 1, 3, 2).reshape(b, t, c * f)  # matches torch view(b,t,c*f)
    return y, lens


def conv_subsampling(p, cfg: ConformerConfig, x: Array, lens: Array):
    """(B, T, F) -> (B, T', d_model); vggnet/striding (subsampling.py:35-130)."""
    y, lens = subsample_convs(p, cfg, x, lens)
    return _apply_linear(p["out"], y), lens


def rel_positional_encoding(t: int, d_model: int, xscale: Optional[float]):
    """Sinusoidal table over relative positions -(T-1)..(T-1)
    (multi_head_attention.py:232-254 with reverse=True + the slice at :289)."""
    pos = np.arange(-(t - 1), t, 1.0)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((2 * t - 1, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def rel_attention(p, x: Array, pos_emb: Array, att_mask: Array,
                  pos_bias_u: Array, pos_bias_v: Array, n_heads: int) -> Array:
    """RelPositionMultiHeadAttention.forward (multi_head_attention.py:174-211);
    the legacy rel_shift resolves to scores[i,j] += (q_i+v)·P[T-1+i-j]."""
    b, t, d = x.shape
    d_k = d // n_heads
    q = _apply_linear(p["q"], x).reshape(b, t, n_heads, d_k)
    k = _apply_linear(p["k"], x).reshape(b, t, n_heads, d_k)
    v = _apply_linear(p["v"], x).reshape(b, t, n_heads, d_k)
    pos = _apply_linear(p["pos"], pos_emb).reshape(2 * t - 1, n_heads, d_k)
    q_u = q + pos_bias_u  # (b, t, h, dk)
    q_v = q + pos_bias_v
    ac = jnp.einsum("bihd,bjhd->bhij", q_u, k, precision=HI)
    bd_full = jnp.einsum("bihd,phd->bhip", q_v, pos, precision=HI)  # (b,h,t,2t-1)
    idx = (t - 1) + np.arange(t)[:, None] - np.arange(t)[None, :]  # (t, t)
    bd = jnp.take_along_axis(bd_full, jnp.asarray(idx)[None, None], axis=-1)
    scores = (ac + bd) / math.sqrt(d_k)
    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(att_mask[:, None], neg, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(att_mask[:, None], 0.0, attn)
    ctx = jnp.einsum("bhij,bjhd->bihd", attn, v, precision=HI).reshape(b, t, d)
    return _apply_linear(p["out"], ctx)


def abs_attention(p, x: Array, att_mask: Array, n_heads: int) -> Array:
    b, t, d = x.shape
    d_k = d // n_heads
    q = _apply_linear(p["q"], x).reshape(b, t, n_heads, d_k)
    k = _apply_linear(p["k"], x).reshape(b, t, n_heads, d_k)
    v = _apply_linear(p["v"], x).reshape(b, t, n_heads, d_k)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k, precision=HI) / math.sqrt(d_k)
    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(att_mask[:, None], neg, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(att_mask[:, None], 0.0, attn)
    ctx = jnp.einsum("bhij,bjhd->bihd", attn, v, precision=HI).reshape(b, t, d)
    return _apply_linear(p["out"], ctx)


def conformer_conv_module(p, x: Array, pad_mask: Array,
                          stats_out: Optional[list] = None,
                          padding: Optional[Tuple[int, int]] = None) -> Array:
    """pw1 -> GLU -> mask -> depthwise -> BN(eval) -> swish -> pw2
    (conformer_modules.py:150-166).  `stats_out`, if given, collects the
    pre-BN depthwise output's per-channel batch (mean, var) — the BN
    statistics the data-free synthesizer matches (quantize/conformer_synth
    .py, the distill_data.py:59-68 role)."""
    y = _apply_linear({"w": p["pw1"]["w"][0], "b": p["pw1"]["b"]}, x)
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)  # GLU over channel halves
    y = jnp.where(pad_mask[:, :, None], 0.0, y)
    k = p["dw"]["w"].shape[0]
    # partitioner-safe depthwise (ops/grouped_conv.py): XLA GSPMD doubles
    # grouped-conv WEIGHT grads under dp sharding on a multi-axis mesh
    from qasr_tpu.ops.grouped_conv import grouped_conv1d

    if padding is None:
        padding = ((k - 1) // 2, (k - 1) // 2)
    y = grouped_conv1d(y, p["dw"]["w"], 1, padding,
                       1, y.shape[-1], HI, None) + p["dw"]["b"]
    if stats_out is not None:
        # pad-masked batch statistics (padded frames hold bias values,
        # not data)
        vm = (~pad_mask)[:, :, None].astype(y.dtype)
        cnt = jnp.maximum(jnp.sum(vm), 1.0)
        mu = jnp.sum(y * vm, axis=(0, 1)) / cnt
        var = jnp.sum(vm * (y - mu) ** 2, axis=(0, 1)) / cnt
        stats_out.append((mu, var))
    bn = p["bn"]
    y = (y - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * bn["gamma"] + bn["beta"]
    y = _swish(y)
    return _apply_linear({"w": p["pw2"]["w"][0], "b": p["pw2"]["b"]}, y)


def _feed_forward(p, x):
    return _apply_linear(p["l2"], _swish(_apply_linear(p["l1"], x)))


def conformer_encoder_apply(params, cfg: ConformerConfig, x: Array, lens: Array,
                            *, train: bool = False, rng: Optional[Array] = None,
                            bn_stats: Optional[list] = None
                            ) -> Tuple[Array, Array]:
    """(B, T, F) features -> (B, T', d) encodings (conformer_encoder.py:199-240).
    Dropout omitted at eval; train-mode dropout derives from `rng`.
    `bn_stats`, if a list, collects each conv module's pre-BN batch
    (mean, var) for the data-free synthesizer."""
    if cfg.subsampling:
        x, lens = conv_subsampling(params["pre_encode"], cfg, x, lens)
    else:
        x = _apply_linear(params["pre_encode"]["linear"], x)
    t = x.shape[1]
    if cfg.xscaling:
        x = x * math.sqrt(cfg.d_model)
    pos_emb = jnp.asarray(rel_positional_encoding(t, cfg.d_model, None))

    valid = jnp.arange(t)[None, :] < lens[:, None]  # (B, T)
    att_mask = attention_mask(valid, cfg.att_context_size)  # True = masked
    pad_mask = ~valid

    def dropout(y, rate):
        nonlocal rng
        if not train or rate <= 0 or rng is None:
            return y
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - rate, y.shape)
        return jnp.where(keep, y / (1.0 - rate), 0.0)

    u = params.get("pos_bias_u")
    v = params.get("pos_bias_v")
    for lp in params["layers"]:
        bu = lp.get("pos_bias_u", u)
        bv = lp.get("pos_bias_v", v)
        r = x
        y = _feed_forward(lp["ff1"], _layer_norm(lp["norm_ff1"], x))
        x = 0.5 * dropout(y, cfg.dropout) + r
        r = x
        y = _layer_norm(lp["norm_att"], x)
        if cfg.self_attention_model == "rel_pos":
            y = rel_attention(lp["att"], y, pos_emb, att_mask, bu, bv, cfg.n_heads)
        else:
            y = abs_attention(lp["att"], y, att_mask, cfg.n_heads)
        x = dropout(y, cfg.dropout) + r
        r = x
        y = conformer_conv_module(lp["conv"], _layer_norm(lp["norm_conv"], x),
                                  pad_mask, stats_out=bn_stats,
                                  padding=cfg.dw_padding)
        x = dropout(y, cfg.dropout) + r
        r = x
        y = _feed_forward(lp["ff2"], _layer_norm(lp["norm_ff2"], x))
        x = 0.5 * dropout(y, cfg.dropout) + r
        x = _layer_norm(lp["norm_out"], x)
    if "out_proj" in params:
        x = _apply_linear(params["out_proj"], x)
    return x, lens
