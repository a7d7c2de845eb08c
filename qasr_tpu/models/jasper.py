"""Jasper/QuartzNet encoder-decoder as pure functions over parameter pytrees.

Functional re-design of the reference module tree
(`/root/reference/nemo/collections/asr/parts/jasper.py`,
 `/root/reference/nemo/collections/asr/modules/conv_asr.py`):

  * layout is channels-last (B, T, C); convs are `lax.conv_general_dilated`
    with ('NWC','WIO','NWC') so XLA tiles them onto the MXU;
  * the reference's "scaling factor travels with the tensor"
    (conv_asr.py:194-206) becomes a `QTensor` (int values + scale);
  * one block-walk (`encoder_forward`) is shared by four *executors*:
      - FloatExec   : fp32 path (training / synthesis teacher / no_quant),
                      optionally collecting pre-BN statistics for the
                      data-free synthesizer (distill_data.py:104-148);
      - QuantExec   : integer path with in-graph scales — used for
                      calibration (running-range EMA updates,
                      quant_modules.py:111-141) and dynamic quantization
                      (quant_modules.py:149-170);
      - ScaleFreezeExec (host): propagates frozen scales and emits exact
                      Decimal-rounded dyadic requant tables (the reference
                      computes these per forward in float64,
                      quant_utils.py:121-216 — here they are precomputed
                      once because static-mode scales are constants);
      - FrozenExec  : the deployment path — int8 MXU convs + int32 bias +
                      exact integer dyadic requantization, no float math
                      until the final log-softmax.

Reference structure being matched (cites in members below): MaskedConv1d
(jasper.py:116-212), JasperBlock.forward (jasper.py:641-692), BN folding
(jasper.py:451-474, quant_modules.py:269-271,351-365), ConvASRDecoder
(conv_asr.py:223-319), the "+1 bit for post-ReLU tensors" trick
(jasper.py:159-163) with the first-layer exception (jasper.py:371,394,437).
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.config import BlockConfig, DecoderConfig, EncoderConfig, QuantConfig
from qasr_tpu.ops.quant_prims import (
    Dyadic,
    QTensor,
    dyadic_from_scale_host,
    quantize,
    requantize,
    symmetric_scale,
)

Array = jax.Array
BN_EPS = 1e-3  # nn.BatchNorm1d(eps=1e-3) in jasper.py:624


# ---------------------------------------------------------------------------
# Plan: static structure resolved from config
# ---------------------------------------------------------------------------


def compute_new_kernel_size(kernel_size: int, factor: float) -> int:
    new = max(int(kernel_size * factor), 1)
    return new + 1 if new % 2 == 0 else new  # jasper.py:53-58


def get_same_padding(kernel: int, stride: int, dilation: int) -> int:
    if stride > 1 and dilation > 1:
        raise ValueError("Only stride OR dilation may be greater than 1")
    if dilation > 1:
        return (dilation * kernel) // 2 - 1  # jasper.py:61-66
    return kernel // 2


@dataclass(frozen=True)
class ConvSpec:
    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    heads: int = -1
    padding: int = 0
    bias: bool = False
    has_bn: bool = True
    asymmetric: bool = False     # +1 act bit (post-ReLU input), jasper.py:159-163
    end_of_repeat: bool = False  # activation+dropout follow inside mconv


@dataclass(frozen=True)
class BlockPlan:
    index: int
    convs: Tuple[ConvSpec, ...]
    res: Tuple[ConvSpec, ...]
    residual: bool
    dense_residual: bool
    residual_mode: str
    dropout: float
    groups: int
    se: bool
    se_reduction_ratio: int = 8
    se_context_window: int = -1


@dataclass(frozen=True)
class EncoderPlan:
    blocks: Tuple[BlockPlan, ...]
    activation: str
    feat_in: int
    feat_out: int


def build_encoder_plan(cfg: EncoderConfig) -> EncoderPlan:
    """Resolves BlockConfigs into explicit conv specs (JasperBlock.__init__,
    jasper.py:296-448)."""
    feat_in = cfg.feat_in * cfg.frame_splicing
    blocks: List[BlockPlan] = []
    residual_panes: List[int] = []
    for bi, b in enumerate(cfg.blocks):
        kernel = compute_new_kernel_size(b.kernel[0], b.kernel_size_factor)
        stride, dilation = b.stride[0], b.dilation[0]
        padding = get_same_padding(kernel, stride, dilation)
        convs: List[ConvSpec] = []
        inp = feat_in
        for r in range(b.repeat):
            is_last_rep = r == b.repeat - 1
            s = stride if (is_last_rep or not b.stride_last) else 1
            is_first_conv = bi == 0 and r == 0
            if b.separable:
                convs.append(ConvSpec(
                    in_ch=inp, out_ch=inp, kernel=kernel, stride=s,
                    dilation=dilation, groups=inp, heads=b.heads, padding=padding,
                    has_bn=False, asymmetric=not is_first_conv))
                convs.append(ConvSpec(
                    in_ch=inp, out_ch=b.filters, kernel=1, groups=b.groups,
                    has_bn=True, asymmetric=False,
                    end_of_repeat=not is_last_rep))
            else:
                convs.append(ConvSpec(
                    in_ch=inp, out_ch=b.filters, kernel=kernel, stride=s,
                    dilation=dilation, groups=b.groups, heads=b.heads,
                    padding=padding, has_bn=True,
                    asymmetric=not is_first_conv, end_of_repeat=not is_last_rep))
            inp = b.filters
        res: List[ConvSpec] = []
        dense_residual = False
        if b.residual:
            res_stride = stride if b.residual_mode == "stride_add" else 1
            if b.residual_dense:
                residual_panes.append(feat_in)
                panes = list(residual_panes)
                dense_residual = True
            else:
                panes = [feat_in]
            for ip in panes:
                res.append(ConvSpec(
                    in_ch=ip, out_ch=b.filters, kernel=1, stride=res_stride,
                    has_bn=True, asymmetric=bi != 0))  # jasper.py:437
        blocks.append(BlockPlan(
            index=bi, convs=tuple(convs), res=tuple(res), residual=b.residual,
            dense_residual=dense_residual, residual_mode=b.residual_mode,
            dropout=b.dropout, groups=b.groups, se=b.se,
            se_reduction_ratio=b.se_reduction_ratio,
            se_context_window=b.se_context_size))
        feat_in = b.filters
    return EncoderPlan(blocks=tuple(blocks), activation=cfg.activation,
                       feat_in=cfg.feat_in * cfg.frame_splicing, feat_out=feat_in)


# ---------------------------------------------------------------------------
# Parameter init (xavier_uniform like jasper.py:28-50) and BN folding
# ---------------------------------------------------------------------------


def _init_conv(rng: np.random.Generator, spec: ConvSpec, dtype=np.float32) -> Dict[str, Any]:
    # Host-side numpy init: over the TPU tunnel every distinct eager op shape
    # costs a remote compile, so model construction never touches the device.
    if spec.heads != -1:
        # heads: depthwise conv over `heads` channels, batch-folded
        # (jasper.py:139-147: in=out=groups=heads)
        cin_g, out_ch = 1, spec.heads
    else:
        cin_g, out_ch = spec.in_ch // spec.groups, spec.out_ch
    fan_in = cin_g * spec.kernel
    fan_out = out_ch * spec.kernel
    a = math.sqrt(6.0 / (fan_in + fan_out))  # xavier_uniform, jasper.py:33-34
    p: Dict[str, Any] = {
        "w": rng.uniform(-a, a, (spec.kernel, cin_g, out_ch)).astype(dtype)
    }
    if spec.bias:
        p["b"] = np.zeros((spec.out_ch,), dtype)
    if spec.has_bn:
        p["bn"] = {
            "gamma": np.ones((spec.out_ch,), dtype),
            "beta": np.zeros((spec.out_ch,), dtype),
            "mean": np.zeros((spec.out_ch,), dtype),
            "var": np.ones((spec.out_ch,), dtype),
        }
    return p


def init_encoder_params(seed, plan: EncoderPlan) -> Dict[str, Any]:
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(
        int(np.asarray(seed).sum()) if hasattr(seed, "shape") else seed)
    blocks = []
    for bp in plan.blocks:
        b = {"convs": [_init_conv(rng, s) for s in bp.convs],
             "res": [_init_conv(rng, s) for s in bp.res]}
        if bp.se:
            # SqueezeExcite fc stack (jasper.py:271-275): C -> C/r -> C, no bias
            c = bp.convs[-1].out_ch
            r = max(c // bp.se_reduction_ratio, 1)
            a1 = math.sqrt(6.0 / (c + r))
            a2 = math.sqrt(6.0 / (r + c))
            b["se"] = {"fc1": rng.uniform(-a1, a1, (c, r)).astype(np.float32),
                       "fc2": rng.uniform(-a2, a2, (r, c)).astype(np.float32)}
        blocks.append(b)
    return {"blocks": blocks}


def init_decoder_params(seed, cfg: DecoderConfig, dtype=np.float32) -> Dict[str, Any]:
    # 1x1 conv with bias onto num_classes+1 (conv_asr.py:259-267)
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(
        int(np.asarray(seed).sum()) if hasattr(seed, "shape") else seed)
    v = cfg.num_classes + 1
    a = math.sqrt(6.0 / (cfg.feat_in + v))
    return {
        "w": rng.uniform(-a, a, (1, cfg.feat_in, v)).astype(dtype),
        "b": np.zeros((v,), dtype),
    }


def fold_bn_conv(p: Dict[str, Any], eps: float = BN_EPS) -> Dict[str, Any]:
    """W' = W * gamma/sigma ; b' = (b - mu) * gamma/sigma + beta
    (quant_modules.py:351-365).  Pure host numpy."""
    if "bn" not in p:
        return p
    bn = {k: np.asarray(v) for k, v in p["bn"].items()}
    sf = bn["gamma"] / np.sqrt(bn["var"] + np.float32(eps))
    b0 = np.asarray(p["b"]) if "b" in p else np.zeros_like(bn["mean"])
    return {"w": np.asarray(p["w"]) * sf,
            "b": (b0 - bn["mean"]) * sf + bn["beta"]}


def fold_bn_encoder(params: Dict[str, Any]) -> Dict[str, Any]:
    """encoder.bn_folding() as a pure parameter transform (conv_asr.py:208-210,
    jasper.py:451-474)."""
    return {"blocks": [
        {"convs": [fold_bn_conv(c) for c in b["convs"]],
         "res": [fold_bn_conv(c) for c in b["res"]]}
        for b in params["blocks"]
    ]}


# ---------------------------------------------------------------------------
# Quantization range state (QuantAct buffers, quant_modules.py:60-67)
# ---------------------------------------------------------------------------


def init_qstate(plan: EncoderPlan) -> Dict[str, Any]:
    z = lambda: {"x_min": np.zeros((), np.float32), "x_max": np.zeros((), np.float32)}
    return {
        "blocks": [
            {"convs": [z() for _ in bp.convs],
             "res": [z() for _ in bp.res],
             "res_act": z()}
            for bp in plan.blocks
        ],
        "decoder_act": z(),
    }


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------


def conv_out_len(lens: Array, spec: ConvSpec) -> Array:
    # MaskedConv1d.get_seq_len (jasper.py:170-173)
    return (lens + 2 * spec.padding - spec.dilation * (spec.kernel - 1) - 1) // spec.stride + 1


def _length_mask(t: int, lens: Array) -> Array:
    return jnp.arange(t)[None, :] < lens[:, None]  # (B, T)


def pad_frames_aligned(feats: Array, mult: int = 64) -> Array:
    """Pad the frame axis to a multiple of `mult` (zeros beyond the true
    lengths are masked everywhere).  QuartzNet's stride-1 'same' convs
    preserve T exactly, so aligning the features once keeps every interior
    layer's physical T 32-aligned — the envelope the fused depthwise kernel
    needs — and (with mult=64) the post-stride-2 T lands on exact VPU time
    tiles (768 vs 751 -> zero padded-row waste)."""
    t = feats.shape[1]
    pad = (-t) % mult
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    return feats


def mask_values(x: Array, lens: Array) -> Array:
    m = _length_mask(x.shape[1], lens)[:, :, None]
    return jnp.where(m, x, jnp.zeros((), x.dtype))


def _depthwise_conv_int(x: Array, w: Array, stride: int, padding: int,
                        dilation: int) -> Array:
    """Integer depthwise conv as an unrolled sum of strided slices.

    Depthwise convs have no contraction dimension, so on TPU they are VPU
    work either way; this formulation compiles orders of magnitude faster
    than XLA's grouped integer conv and is bit-identical (int32 accumulate).
    x: (B, T, C) int, w: (K, 1, C) int.
    """
    k_size = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    t_out = (x.shape[1] + 2 * padding - dilation * (k_size - 1) - 1) // stride + 1
    acc = jnp.zeros((x.shape[0], t_out, x.shape[2]), jnp.int32)
    wi = w.astype(jnp.int32)
    for k in range(k_size):
        start = k * dilation
        sl = jax.lax.slice(xp, (0, start, 0),
                           (xp.shape[0], start + (t_out - 1) * stride + 1, xp.shape[2]),
                           (1, stride, 1))
        acc = acc + sl.astype(jnp.int32) * wi[k, 0]
    return acc


def conv_nwc(x: Array, w: Array, spec: ConvSpec, b: Optional[Array] = None,
             preferred=None, precision=None,
             dw_max_prod: Optional[int] = None,
             dw_band: Optional[Array] = None) -> Array:
    """1D conv, channels-last, optional grouped/depthwise; heads fold extra
    channels into the batch (jasper.py:184-192).

    Float convs force precision='highest': the TPU default routes f32 convs
    through bf16 MXU passes (~1e-2 relative error), which would break parity
    with the reference; integer convs are exact regardless.
    """
    if preferred is None and precision is None:
        precision = jax.lax.Precision.HIGHEST
    sh = x.shape
    if spec.heads != -1:
        # (B, T, C) -> (B * C/heads, T, heads)
        x = x.reshape(sh[0], sh[1], sh[2] // spec.heads, spec.heads)
        x = x.transpose(0, 2, 1, 3).reshape(-1, sh[1], spec.heads)
    groups = spec.groups if spec.heads == -1 else spec.heads
    if preferred == jnp.int32 and w.shape[0] == 1 and groups == 1 \
            and spec.stride == 1 and spec.dilation == 1 and spec.padding == 0:
        # pointwise integer conv as a plain matmul: XLA fuses elementwise
        # epilogues (bias/relu/mask/requant/int8-cast) into dot outputs far
        # more readily than into convolutions — the requant chains between
        # pw convs and the Pallas depthwise kernels otherwise run as
        # standalone bandwidth passes (profiled 6.7 ms/step over 140 sites)
        y = jax.lax.dot_general(x, w[0], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        if b is not None:
            y = y + b
        return y
    if preferred == jnp.int32 and w.shape[1] == 1 and groups == x.shape[-1]:
        if dw_band is not None and spec.stride in (1, 2) and x.ndim == 3 \
                and x.dtype == jnp.int8:
            # banded-Toeplitz channel-batched matmul: runs the depthwise conv
            # on the MXU (exact int8 dots), 2.2x the VPU kernel net on v5e
            from qasr_tpu.kernels.dw_mxu import apply_banded
            y = apply_banded(x, dw_band, k_size=w.shape[0], stride=spec.stride,
                             padding=spec.padding, dilation=spec.dilation)
        elif spec.stride in (1, 2) and jax.default_backend() == "tpu" and x.ndim == 3:
            # Pallas kernel: one HBM pass (the HLO sum-of-slices form re-reads
            # the input K times; profiled at ~85% of the frozen-model step)
            from qasr_tpu.kernels.depthwise import depthwise_conv_int_pallas
            y = depthwise_conv_int_pallas(x, w, spec.stride, spec.padding,
                                          spec.dilation, max_prod=dw_max_prod)
        else:
            y = _depthwise_conv_int(x, w, spec.stride, spec.padding, spec.dilation)
        if spec.heads != -1:
            t2 = y.shape[1]
            y = y.reshape(sh[0], sh[2] // spec.heads, t2, spec.heads)
            y = y.transpose(0, 2, 1, 3).reshape(sh[0], t2, sh[2])
        if b is not None:
            y = y + b
        return y
    if groups > 1:
        # partitioner-safe grouped conv (ops/grouped_conv.py): XLA GSPMD
        # multiplies grouped-conv WEIGHT grads by the unused mesh-axis size
        # under dp sharding on a multi-axis (dp x tp) mesh
        from qasr_tpu.ops.grouped_conv import grouped_conv1d

        y = grouped_conv1d(x, w, spec.stride,
                           (spec.padding, spec.padding), spec.dilation,
                           groups, precision, preferred)
    else:
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(spec.stride,),
            padding=[(spec.padding, spec.padding)],
            rhs_dilation=(spec.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=1,
            preferred_element_type=preferred,
            precision=precision,
        )
    if spec.heads != -1:
        t2 = y.shape[1]
        y = y.reshape(sh[0], sh[2] // spec.heads, t2, spec.heads)
        y = y.transpose(0, 2, 1, 3).reshape(sh[0], t2, sh[2])
    if b is not None:
        y = y + b
    return y


def group_shuffle(x: Array, groups: int) -> Array:
    # GroupShuffle (jasper.py:215-231), channels-last variant
    b, t, c = x.shape
    return x.reshape(b, t, groups, c // groups).swapaxes(2, 3).reshape(b, t, c)


def shuffle_channel_vector(v, groups: int):
    """Apply GroupShuffle's channel permutation to a per-channel vector
    (scale / dyadic mantissa).  Integer activations carry per-out-channel
    scales out of every conv (QuantConv1d per_channel=True semantics,
    reference quant_modules.py:251-267), so shuffling the values without
    shuffling the grid would silently misquantize; the reference never hits
    this because it dequantizes to float before GroupShuffle."""
    c = v.shape[0]
    return v.reshape(groups, c // groups).swapaxes(0, 1).reshape(c)


def group_shuffle_q(x: "QTensor", groups: int) -> "QTensor":
    """GroupShuffle on an integer activation: permute values AND, when the
    scale is per-channel, the scale grid (reference QuantConv1d threads
    `groups` straight through, quant_modules.py:232-250)."""
    vals = group_shuffle(x.values, groups)
    scale = x.scale
    if getattr(scale, "ndim", 0) == 1:
        scale = shuffle_channel_vector(scale, groups)
    return QTensor(vals, scale)


def _apply_activation(x: Array, kind: str) -> Array:
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "hardtanh":
        return jnp.clip(x, 0.0, 20.0)  # jasper.py:637
    if kind == "selu":
        return jax.nn.selu(x)
    if kind == "swish":
        return x * jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {kind}")


# ---------------------------------------------------------------------------
# Executors
# ---------------------------------------------------------------------------


class FloatExec:
    """FP32 path. BN applied when present (unfolded params) else the folded
    bias is inside the conv. Optionally collects per-channel (mean, var) of
    every pre-BN conv output — the statistics the data-free synthesizer
    matches against BN running stats (distill_data.py:143-152)."""

    def __init__(self, params, *, activation: str, train: bool = False,
                 rng: Optional[Array] = None, collect_bn_stats: bool = False):
        self.params = params
        self.activation_kind = activation
        self.train = train
        self.rng = rng
        self.collect = collect_bn_stats
        self.bn_stats: List[Tuple[Array, Array]] = []  # (mean, var) per BN site

    def _p(self, site):
        bi, kind, i = site
        return self.params["blocks"][bi][kind][i]

    def masked_conv(self, site, spec: ConvSpec, x: Array, lens: Array):
        p = self._p(site)
        x = mask_values(x, lens)
        new_lens = conv_out_len(lens, spec)
        y = conv_nwc(x, p["w"], spec, p.get("b"))
        if spec.has_bn and self.collect:
            # match distill_data.py:146-148: mean/var over (batch, time)
            mean = jnp.mean(y, axis=(0, 1))
            var = jnp.var(y, axis=(0, 1), ddof=1)
            self.bn_stats.append((mean, var))
        if spec.has_bn and "bn" in p:
            bn = p["bn"]
            y = (y - bn["mean"]) / jnp.sqrt(bn["var"] + BN_EPS) * bn["gamma"] + bn["beta"]
        return y, new_lens

    def residual_add(self, block_idx: int, pane: int, out, res_out, mode: str):
        if mode in ("add", "stride_add"):
            return out + res_out
        return jnp.maximum(out, res_out)  # jasper.py:684

    def activation(self, x, dropout: float):
        y = _apply_activation(x, self.activation_kind)
        if self.train and dropout > 0 and self.rng is not None:
            self.rng, sub = jax.random.split(self.rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, y.shape)
            y = jnp.where(keep, y / (1.0 - dropout), 0.0)
        return y

    def group_shuffle(self, x, groups):
        return group_shuffle(x, groups)

    def squeeze_excite(self, block_idx: int, x: Array, bp: "BlockPlan") -> Array:
        """SqueezeExcite (jasper.py:234-290): global (or windowed) time-avg ->
        fc1 -> relu -> fc2 -> sigmoid gate.  Float path only; the reference
        asserts quantization is unsupported here too (jasper.py:399)."""
        p = self.params["blocks"][block_idx]["se"]
        if bp.se_context_window <= 0:
            y = jnp.mean(x, axis=1, keepdims=True)  # AdaptiveAvgPool1d(1)
        else:
            w = bp.se_context_window
            # AvgPool1d(window, stride=1) then nearest upsample back to T
            c = jnp.cumsum(jnp.pad(x, ((0, 0), (1, 0), (0, 0))), axis=1)
            y = (c[:, w:] - c[:, :-w]) / w  # (B, T-w+1, C)
            reps = -(-x.shape[1] // y.shape[1])
            y = jnp.repeat(y, reps, axis=1)[:, : x.shape[1]]
        y = jnp.matmul(jax.nn.relu(jnp.matmul(y, p["fc1"], precision=jax.lax.Precision.HIGHEST)),
                       p["fc2"], precision=jax.lax.Precision.HIGHEST)
        return x * jax.nn.sigmoid(y)


class QATExec(FloatExec):
    """Quantization-aware training executor: FloatExec + STE fake-quant on
    weights (per-channel) and pre-conv activations (per-tensor, EMA ranges).

    The reference trains with quant_mode='symmetric' forced at construction
    (ctc_models.py:103-107) and `qm.train` unfixing every op
    (quantize_model.py:69-71); this is the same capability with well-defined
    gradients (STE) and float BatchNorm batch statistics during training.
    """

    def __init__(self, params, qstate, qcfg, *, activation: str,
                 train: bool = True, rng=None):
        super().__init__(params, activation=activation, train=train, rng=rng)
        self.qcfg = qcfg
        self.qstate = qstate
        self.new_qstate = jax.tree_util.tree_map(lambda x: x, qstate)

    def masked_conv(self, site, spec: ConvSpec, x: Array, lens: Array):
        from qasr_tpu.ops.fake_quant import fake_quant_acts, fake_quant_weights

        bi, kind, i = site
        p = dict(self._p(site))
        x = mask_values(x, lens)
        bits = self.qcfg.act_bit + (1 if spec.asymmetric else 0)
        node = self.new_qstate["blocks"][bi][kind]
        xq, node[i] = fake_quant_acts(x, node[i], bits, self.qcfg.act_momentum)
        p["w"] = fake_quant_weights(p["w"], self.qcfg.weight_bit)
        new_lens = conv_out_len(lens, spec)
        y = conv_nwc(xq, p["w"], spec, p.get("b"))
        if spec.has_bn and "bn" in p:
            bn = p["bn"]
            if self.train:
                mu = jnp.mean(y, axis=(0, 1))
                var = jnp.var(y, axis=(0, 1))
            else:
                mu, var = bn["mean"], bn["var"]
            y = (y - mu) / jnp.sqrt(var + BN_EPS) * bn["gamma"] + bn["beta"]
        return y, new_lens

    def residual_add(self, block_idx: int, pane: int, out, res_out, mode: str):
        from qasr_tpu.ops.fake_quant import fake_quant_acts

        s = out + res_out if mode in ("add", "stride_add") else jnp.maximum(out, res_out)
        node = self.new_qstate["blocks"][block_idx]
        sq, node["res_act"] = fake_quant_acts(s, node["res_act"], self.qcfg.act_bit,
                                              self.qcfg.act_momentum)
        return sq


def _ema_ranges(state, bmin, bmax, momentum):
    """QuantAct running-stat update: init-on-first-batch then EMA
    (quant_modules.py:127-141)."""
    init = jnp.equal(state["x_min"], state["x_max"])
    if momentum == -1:
        nmin = jnp.minimum(state["x_min"], bmin)
        nmax = jnp.maximum(state["x_max"], bmax)
    else:
        nmin = state["x_min"] * momentum + bmin * (1 - momentum)
        nmax = state["x_max"] * momentum + bmax * (1 - momentum)
    return {
        "x_min": jnp.where(init, state["x_min"] + bmin, nmin),
        "x_max": jnp.where(init, state["x_max"] + bmax, nmax),
    }


# above this many elements, percentile switches from an exact global sort
# (jnp.quantile = the reference's torch.quantile, quant_modules.py:120-125)
# to the linear-pass histogram quantile (ops/stats.py) -- SURVEY.md hard-part
# 4: realistic calibration sites (8 x 500 x 512) should not full-sort
_QUANTILE_SORT_MAX = 1 << 18


def _batch_ranges(x_f: Array, percentile: Optional[float]):
    if percentile is None:
        return jnp.min(x_f), jnp.max(x_f)
    if x_f.size > _QUANTILE_SORT_MAX:
        from qasr_tpu.ops.stats import quantile_range

        return quantile_range(x_f, percentile)
    lo = jnp.quantile(x_f.reshape(-1), 1.0 - percentile / 100.0)
    hi = jnp.quantile(x_f.reshape(-1), percentile / 100.0)
    return lo, hi


class QuantExec:
    """Integer path with in-graph scales.

    update_ranges=True  -> calibration (qm.calibrate, quantize_model.py:73-75)
    qcfg.dynamic=True   -> per-batch ranges at eval (quant_modules.py:149-170)
    otherwise           -> static eval with the EMA ranges in qstate (slow
                           reference path; production uses FrozenExec).
    """

    def __init__(self, params, qstate, qcfg: QuantConfig, *, activation: str,
                 update_ranges: bool, bn_update: bool = False):
        if not bn_update:
            for b in params["blocks"]:
                for c in b["convs"] + b["res"]:
                    if "bn" in c:
                        raise ValueError(
                            "quant path requires BN-folded params; call "
                            "fold_bn_encoder first (or pass bn_update=True "
                            "for the folded-not-fixed training mode)")
        self.params = params
        self.qstate = qstate
        self.qcfg = qcfg
        self.activation_kind = activation
        self.update = update_ranges
        self.bn_update = bn_update
        self.new_qstate = jax.tree_util.tree_map(lambda x: x, qstate)
        self.new_bn_stats: Dict[int, Any] = {}  # updated BN running stats

    # -- act quant ---------------------------------------------------------

    def _site_state(self, path):
        node = self.new_qstate
        for k in path[:-1]:
            node = node[k]
        return node, path[-1]

    def act_quantize(self, path, x: Union[Array, QTensor], bits: int,
                     identity: Optional[QTensor] = None) -> QTensor:
        node, leaf = self._site_state(path)
        state = node[leaf]
        x_f = x.dequantize() if isinstance(x, QTensor) else x
        if identity is not None:
            x_f = x_f + identity.dequantize()
        if self.update:
            bmin, bmax = _batch_ranges(x_f, self.qcfg.percentile)
            state = _ema_ranges(state, bmin, bmax, self.qcfg.act_momentum)
            node[leaf] = state
        if self.qcfg.dynamic:
            x_min, x_max = _batch_ranges(x_f, self.qcfg.percentile)
        else:
            x_min, x_max = state["x_min"], state["x_max"]
        scale = symmetric_scale(x_min, x_max, bits)
        if isinstance(x, QTensor):
            if self.update and not self.qcfg.calib_exact:
                # calibration: ranges are all that matter; the f32-multiplier
                # approximation keeps the graph ~10x smaller to compile
                # (QuantConfig.calib_exact=True restores the exact dyadic)
                from qasr_tpu.ops.quant_prims import requantize_approx
                return requantize_approx(x, scale, bits, identity=identity)
            return requantize(x, scale, bits, identity=identity)
        assert identity is None
        return QTensor(quantize(x, scale, bits), scale)

    # -- conv ---------------------------------------------------------------

    def _qconv(self, p, spec: ConvSpec, x: QTensor) -> QTensor:
        w = p["w"]
        w_scale = symmetric_scale(jnp.min(w, axis=(0, 1)), jnp.max(w, axis=(0, 1)),
                                  self.qcfg.weight_bit)  # per out-channel
        w_int = quantize(w, w_scale, self.qcfg.weight_bit)
        out_scale = (w_scale * x.scale).astype(jnp.float32)
        b_int = None
        if "b" in p:
            # 32-bit bias, reciprocal-multiply rounding like linear_quantize
            b_int = jnp.round((1.0 / out_scale) * p["b"]).astype(jnp.int32)
        xv, wv = _conv_operands(x.values, w_int, self._act_storage_bits(spec))
        y = conv_nwc(xv, wv, spec, preferred=jnp.int32)
        if b_int is not None:
            y = y + b_int
        return QTensor(y, out_scale)

    def _act_storage_bits(self, spec: ConvSpec) -> int:
        return self.qcfg.act_bit + (1 if spec.asymmetric else 0)

    def masked_conv(self, site, spec: ConvSpec, x, lens):
        bi, kind, i = site
        p = self.params["blocks"][bi][kind][i]
        if isinstance(x, QTensor):
            x = QTensor(mask_values(x.values, lens), x.scale)
        else:
            x = mask_values(x, lens)
        new_lens = conv_out_len(lens, spec)
        xq = self.act_quantize(("blocks", bi, kind, i), x, self._act_storage_bits(spec))
        y = self._qconv(p, spec, xq)
        if spec.has_bn and "bn" in p:
            # "folded but not fixed" train mode (quant_modules.py:337-349):
            # int conv on raw weights, batch stats update the BN running
            # stats (momentum), output normalized with the *updated running*
            # stats; the output scale picks up gamma/sigma per channel.
            assert self.bn_update, (
                "quant path with unfolded BN requires bn_update=True "
                "(training); call fold_bn_encoder for inference")
            bn = p["bn"]
            conv_f = y.dequantize()
            batch_mean = jnp.mean(conv_f, axis=(0, 1))
            batch_var = jnp.var(conv_f, axis=(0, 1))
            mom = 0.1  # BatchNorm1d default momentum (jasper.py:624)
            new_mean = bn["mean"] * (1 - mom) + mom * batch_mean
            new_var = bn["var"] * (1 - mom) + mom * batch_var
            node = self.new_bn_stats.setdefault(bi, {}).setdefault(kind, {})
            node[i] = {"mean": new_mean, "var": new_var}
            factor = bn["gamma"] / jnp.sqrt(new_var + BN_EPS)
            out_f = factor * (conv_f - new_mean) + bn["beta"]
            out_scale = (factor * y.scale).astype(jnp.float32)
            # keep integer representation on the new per-channel grid
            y = QTensor(jnp.round(out_f / out_scale).astype(jnp.int32), out_scale)
        return y, new_lens

    def residual_add(self, block_idx: int, pane: int, out: QTensor, res_out: QTensor,
                     mode: str):
        assert mode in ("add", "stride_add")  # jasper.py:665-666
        return self.act_quantize(("blocks", block_idx, "res_act"), out,
                                 self.qcfg.act_bit, identity=res_out)

    def activation(self, x: QTensor, dropout: float) -> QTensor:
        if self.activation_kind == "relu":
            return QTensor(jnp.maximum(x.values, 0), x.scale)
        # generic: act in float, re-round onto the same grid
        y = _apply_activation(x.dequantize(), self.activation_kind)
        return QTensor(jnp.round(y / x.scale).astype(jnp.int32), x.scale)

    def group_shuffle(self, x, groups):
        return group_shuffle_q(x, groups)

    def squeeze_excite(self, block_idx, x, bp):
        # same restriction as the reference (jasper.py:399)
        raise NotImplementedError("SqueezeExcite does not support quantization")


def _conv_operands(xv: Array, wv: Array, act_bits: int):
    """Cast conv operands to int8 when ranges allow — int8 x int8 -> int32
    rides the MXU natively; 9-bit (asymmetric-trick W8A8) falls back to int32."""
    if act_bits <= 8:
        return xv.astype(jnp.int8), wv.astype(jnp.int8)
    return xv, wv.astype(jnp.int32)


# ---------------------------------------------------------------------------
# The shared walk (JasperBlock.forward, jasper.py:641-692)
# ---------------------------------------------------------------------------


def block_forward(exec_, bp: BlockPlan, xs: List[Any], lens: Array):
    out = xs[-1]
    lens_orig = lens
    n = len(bp.convs)
    for ci, spec in enumerate(bp.convs):
        out, lens = exec_.masked_conv((bp.index, "convs", ci), spec, out, lens)
        if bp.groups > 1 and spec.has_bn:
            out = exec_.group_shuffle(out, bp.groups)
        if spec.end_of_repeat and ci != n - 1:
            out = exec_.activation(out, bp.dropout)
    if bp.se:
        out = exec_.squeeze_excite(bp.index, out, bp)
    if bp.residual:
        for pi, rspec in enumerate(bp.res):
            res_out, _ = exec_.masked_conv((bp.index, "res", pi), rspec, xs[pi], lens_orig)
            out = exec_.residual_add(bp.index, pi, out, res_out, bp.residual_mode)
    out = exec_.activation(out, bp.dropout)
    block_end = getattr(exec_, "block_end", None)
    if block_end is not None:
        # fusing executors materialize here: a block output can have several
        # consumers (next block's first conv + residual branches), each with
        # its own input requant, so its dot cannot stay pending past this point
        out = block_end(out)
    if bp.residual and bp.dense_residual:
        return xs + [out], lens
    return [out], lens


def encoder_forward(exec_, plan: EncoderPlan, x, lens: Array):
    """ConvASREncoder.forward (conv_asr.py:194-206)."""
    xs: List[Any] = [x]
    for bp in plan.blocks:
        xs, lens = block_forward(exec_, bp, xs, lens)
    return xs[-1], lens


# ---------------------------------------------------------------------------
# Decoder (ConvASRDecoder, conv_asr.py:223-319)
# ---------------------------------------------------------------------------

DECODER_SPEC_TEMPLATE = dict(kernel=1, stride=1, dilation=1, groups=1, heads=-1,
                             padding=0, bias=True, has_bn=False, asymmetric=False)


def decoder_spec(feat_in: int, num_classes_with_blank: int) -> ConvSpec:
    return ConvSpec(in_ch=feat_in, out_ch=num_classes_with_blank, **DECODER_SPEC_TEMPLATE)


def decoder_forward_float(params, x: Array) -> Array:
    spec = decoder_spec(x.shape[-1], params["w"].shape[-1])
    y = conv_nwc(x, params["w"], spec, params["b"])
    return jax.nn.log_softmax(y, axis=-1)


def decoder_forward_quant(exec_: QuantExec, dec_params, x: QTensor) -> Array:
    spec = decoder_spec(x.values.shape[-1], dec_params["w"].shape[-1])
    xq = exec_.act_quantize(("decoder_act",), x, exec_.qcfg.act_bit)
    y = exec_._qconv(dec_params, spec, xq)
    return jax.nn.log_softmax(y.dequantize(), axis=-1)
