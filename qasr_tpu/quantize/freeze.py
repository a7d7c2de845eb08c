"""Freezing: turn (float params + calibrated ranges) into a static integer model.

In the reference, static-mode inference recomputes per layer, per forward:
weight integerization (quant_modules.py:272-309), the float64 dyadic
decomposition of every requant multiplier (quant_utils.py:121-147, including
a host round-trip through Python ``Decimal``), and a float64 emulated conv.
On TPU all of those quantities are *constants* once calibration has frozen
the ranges (qm.evaluate, quantize_model.py:65-67), so we precompute them once
on the host — with the same np.frexp + Decimal ROUND_HALF_UP semantics — and
the deployed graph is pure int8/int32 MXU+VPU work.

`freeze_model` runs a scale-propagation pass over the same block-walk used by
the compute executors (models/jasper.py), emitting `FrozenTables`;
`FrozenExec` then executes the walk with those tables.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.config import DecoderConfig, QuantConfig
from qasr_tpu.models.jasper import (
    ConvSpec,
    EncoderPlan,
    _apply_activation,
    conv_nwc,
    conv_out_len,
    decoder_spec,
    encoder_forward,
    mask_values,
)
from qasr_tpu.ops.quant_prims import (
    Dyadic,
    QTensor,
    dyadic_from_scale_host,
    dyadic_from_scale_host_static_e,
    dyadic_requant,
    dyadic_requant_static,
    dyadic_requant_static16,
    requant_clamp,
)

Array = jax.Array


def _act_scale_f32(x_min: float, x_max: float, bits: int) -> np.float32:
    n = 2 ** (bits - 1) - 1
    sat = max(abs(np.float32(x_min)), abs(np.float32(x_max)))
    return np.float32(max(sat, np.float32(1e-8)) / np.float32(n))


def _weight_tables(w: np.ndarray, b: Optional[np.ndarray], act_scale: np.float32,
                   weight_bit: int):
    """Per-out-channel weight quant + 32-bit bias, f32 semantics identical to
    the in-graph path (QuantConv1d.int_conv, quant_modules.py:272-309)."""
    w = np.asarray(w, np.float32)
    n = 2 ** (weight_bit - 1) - 1
    sat = np.maximum(np.abs(w.min(axis=(0, 1))), np.abs(w.max(axis=(0, 1))))
    w_scale = (np.maximum(sat, 1e-8) / np.float32(n)).astype(np.float32)
    w_int = np.clip(np.round((np.float32(1.0) / w_scale) * w), -n, n - 1)
    out_scale = (w_scale * act_scale).astype(np.float32)
    b_int = None
    if b is not None:
        b_int = np.round((np.float32(1.0) / out_scale) * np.asarray(b, np.float32))
        b_int = b_int.astype(np.int64).clip(-(2**31), 2**31 - 1).astype(np.int32)
    return w_int, w_scale, out_scale, b_int


def _dyadic(pre_scale: np.ndarray, out_scale: np.float32, mode: str = "per_channel"):
    """new_scale = f64(pre)/f64(out), matching fixedpoint_mul's
    _A.double()/_B.double() (quant_utils.py:188-190).

    mode 'per_channel': reference-exact 31-bit mantissa per channel (e is a
    per-channel vector).  mode 'static_e': one static exponent per site —
    ~5x faster requants on the VPU (constant shifts), >= ~24-bit mantissas.
    mode 'static_e16': 16-bit mantissas (TFLite-style narrow requant
    multipliers; relative scale error <= 2**-16) — the requant chain
    halves to two multiplies (quant_prims.dyadic_requant_static16).
    """
    ns = np.asarray(pre_scale, np.float32).astype(np.float64) / np.float64(
        np.float32(out_scale))
    if mode == "static_e":
        m, e = dyadic_from_scale_host_static_e(ns)
        return Dyadic(m, e)  # e: python int (static under jit)
    if mode == "static_e16":
        m, e = dyadic_from_scale_host_static_e(ns, max_bit=16)
        if not 1 <= e <= 31:
            raise ValueError(f"static_e16 exponent out of range: {e}")
        return Dyadic(m, e)
    return dyadic_from_scale_host(ns)


class _SVal:
    """Symbolic activation: its scale (None => float/unquantized) plus a
    worst-case |integer value| bound used for overflow checks at freeze."""

    __slots__ = ("scale", "bound")

    def __init__(self, scale, bound=None):
        self.scale = scale  # np.float32 scalar, (C,) np array, or None
        self.bound = bound  # int upper bound on |values|, or None (unknown)


class ScaleFreezeExec:
    """Host executor: propagates scales, emits tables (no tensor math)."""

    def __init__(self, params, qstate, qcfg: QuantConfig, plan: EncoderPlan,
                 dyadic_mode: str = "static_e"):
        self.params = params
        self.qstate = qstate
        self.qcfg = qcfg
        self.dyadic_mode = dyadic_mode
        # set when a static_e16 requant site could see |z| >= 2**30 — the
        # 16-bit scheme's exactness bound (dyadic_requant_static16 computes
        # p_hi = (z>>16)*m in int32); freeze_model then falls back to static_e
        self.e16_overflow = False
        self.tables: Dict[str, Any] = {
            "blocks": [
                {"convs": [None] * len(bp.convs), "res": [None] * len(bp.res),
                 "res_act": []}
                for bp in plan.blocks
            ],
        }

    def _state(self, path):
        node = self.qstate
        for k in path:
            node = node[k]
        return float(np.asarray(node["x_min"])), float(np.asarray(node["x_max"]))

    def _act_bits(self, asymmetric: bool) -> int:
        return self.qcfg.act_bit + (1 if asymmetric else 0)

    def _check_e16(self, x: _SVal) -> None:
        """Consumer-side exactness check for 16-bit requant mantissas: the
        incoming integer (a conv accumulator) must satisfy |z| < 2**30."""
        if (self.dyadic_mode == "static_e16" and x.bound is not None
                and x.bound >= (1 << 30)):
            self.e16_overflow = True

    def masked_conv(self, site, spec: ConvSpec, x: _SVal, lens):
        bi, kind, i = site
        p = self.params["blocks"][bi][kind][i]
        if "bn" in p:
            raise ValueError("freeze requires BN-folded params")
        bits = self._act_bits(spec.asymmetric)
        x_min, x_max = self._state(("blocks", bi, kind, i))
        act_scale = _act_scale_f32(x_min, x_max, bits)
        entry: Dict[str, Any] = {"act_scale": np.float32(act_scale),
                                 "act_bits": bits}
        if x.scale is not None:
            self._check_e16(x)
            d = _dyadic(x.scale, act_scale, self.dyadic_mode)
            entry["act_m"], entry["act_e"] = d.m, d.e
        w_int, w_scale, out_scale, b_int = _weight_tables(
            np.asarray(p["w"]), np.asarray(p["b"]) if "b" in p else None,
            act_scale, self.qcfg.weight_bit)
        entry["w"] = w_int.astype(np.int8)  # weight_bit <= 8 always
        if b_int is not None:
            entry["b"] = b_int
        entry["out_scale"] = out_scale
        self.tables["blocks"][bi][kind][i] = entry
        # worst-case conv-accumulator magnitude: the requant clamps inputs
        # to [-2**(bits-1), 2**(bits-1)-1] (fresh quantize is tighter)
        contraction = spec.kernel * (spec.in_ch // spec.groups)
        acc = (contraction * (1 << (bits - 1)) * int(np.abs(w_int).max())
               + (int(np.abs(b_int).max()) if b_int is not None else 0))
        if acc >= (1 << 31):
            # worst-case only — real activations rarely saturate every lane,
            # and the reference's float64 emulation would diverge from int32
            # hardware in the same regime; surface it rather than refuse
            from qasr_tpu.utils.logging import logging
            logging.warning(
                f"conv site {site}: worst-case accumulator {acc} exceeds "
                f"int32 — consider lower weight/act bits", once=True)
        return _SVal(out_scale, acc), conv_out_len(np.asarray(lens), spec)

    def residual_add(self, block_idx: int, pane: int, out: _SVal, res_out: _SVal,
                     mode: str):
        x_min, x_max = self._state(("blocks", block_idx, "res_act"))
        act_scale = _act_scale_f32(x_min, x_max, self.qcfg.act_bit)
        self._check_e16(out)
        self._check_e16(res_out)
        dx = _dyadic(out.scale, act_scale, self.dyadic_mode)
        dr = _dyadic(res_out.scale, act_scale, self.dyadic_mode)
        self.tables["blocks"][block_idx]["res_act"].append(
            {"m": dx.m, "e": dx.e, "m_r": dr.m, "e_r": dr.e,
             "scale": np.float32(act_scale)})
        # requant_clamp bounds the sum to [-2**(b-1), 2**(b-1)-1]
        return _SVal(np.float32(act_scale), 1 << (self.qcfg.act_bit - 1))

    def activation(self, x: _SVal, dropout: float) -> _SVal:
        return x  # relu/hardtanh preserve the scale grid

    def group_shuffle(self, x: _SVal, groups: int) -> _SVal:
        # permute the per-channel scale grid exactly as the values are
        # permuted at execution (models/jasper.py::group_shuffle_q) so the
        # next site's dyadic mantissas line up channel-for-channel
        scale = x.scale
        if getattr(scale, "ndim", 0) == 1:
            from qasr_tpu.models.jasper import shuffle_channel_vector
            scale = shuffle_channel_vector(np.asarray(scale), groups)
        return _SVal(scale, x.bound)

    def squeeze_excite(self, block_idx, x, bp):
        raise NotImplementedError("SqueezeExcite does not support quantization")


def _mark_separable_fusion(plan: EncoderPlan, tables) -> None:
    """Flag dw->pw separable pairs whose surrounding requants the fused
    Pallas kernel (kernels/depthwise.depthwise_fused_requant) can absorb:
    stride-1 depthwise with a dyadic input requant (static exponent),
    followed by a plain pointwise conv whose input clamp fits int8."""
    for bp, tb in zip(plan.blocks, tables["blocks"]):
        convs = bp.convs
        for i in range(len(convs) - 1):
            s, nx = convs[i], convs[i + 1]
            e0, e1 = tb["convs"][i], tb["convs"][i + 1]
            if e0 is None or e1 is None:
                continue
            if (s.groups == s.in_ch and s.groups > 1 and s.kernel > 1
                    and s.stride == 1 and s.heads == -1 and "b" not in e0
                    and nx.kernel == 1 and nx.groups == 1 and nx.stride == 1
                    and nx.heads == -1
                    and "act_m" in e0 and "act_m" in e1
                    and e1["act_bits"] <= 8
                    and isinstance(e0.get("act_e"), int)
                    and isinstance(e1.get("act_e"), int)):
                e0["fuse_next"] = True


def freeze_model(plan: EncoderPlan, enc_params, dec_params, qstate,
                 qcfg: QuantConfig, dec_cfg: DecoderConfig,
                 dyadic_mode: str = "static_e"):
    """Host pass producing the frozen integer model (tables pytree).

    dyadic_mode 'static_e' (default, fast) or 'per_channel'
    (reference-exact 31-bit mantissas; ~5x slower requants)."""
    fx = ScaleFreezeExec(enc_params, qstate, qcfg, plan, dyadic_mode)
    out_sval, _ = encoder_forward(fx, plan, _SVal(None), np.zeros((1,), np.int64))
    fx._check_e16(out_sval)  # the decoder's act requant consumes this
    if fx.e16_overflow:
        # a site's worst-case accumulator exceeds the 16-bit scheme's
        # |z| < 2**30 exactness bound (large kernel*channels contractions,
        # e.g. non-separable 8-bit models) — fall back to static_e, whose
        # two-limb product is exact for |z| < 2**31
        from qasr_tpu.utils.logging import logging
        logging.warning("static_e16 requant could overflow on this model "
                        "(worst-case accumulator >= 2**30); falling back to "
                        "dyadic_mode='static_e'")
        return freeze_model(plan, enc_params, dec_params, qstate, qcfg,
                            dec_cfg, dyadic_mode="static_e")
    tables = fx.tables
    tables["dyadic16"] = dyadic_mode == "static_e16"
    _mark_separable_fusion(plan, tables)
    # decoder: plain act_bit QuantAct + per-channel 1x1 conv (conv_asr.py:260-267)
    x_min = float(np.asarray(qstate["decoder_act"]["x_min"]))
    x_max = float(np.asarray(qstate["decoder_act"]["x_max"]))
    act_scale = _act_scale_f32(x_min, x_max, qcfg.act_bit)
    d = _dyadic(out_sval.scale, act_scale, dyadic_mode)
    w_int, w_scale, out_scale, b_int = _weight_tables(
        np.asarray(dec_params["w"]), np.asarray(dec_params["b"]),
        act_scale, qcfg.weight_bit)
    tables["decoder"] = {
        "act_scale": np.float32(act_scale), "act_m": d.m, "act_e": d.e,
        "w": w_int.astype(np.int8), "b": b_int,
        "out_scale": out_scale,
    }
    return _tables_to_host(tables)


def _tables_to_host(t):
    """Force every array leaf to host numpy.  Executors close over the
    tables inside jitted forwards; numpy closures lower to HLO literals,
    while pre-committed device arrays become captured-constant buffers in
    the executable — which permanently degrades the process's host->device
    transfer bandwidth ~70x under the axon TPU tunnel (PERF.md round 3d).
    Host tables are also the serializable form (utils/checkpoint)."""
    if isinstance(t, dict):
        return {k: _tables_to_host(v) for k, v in t.items()}
    if isinstance(t, (list, tuple)):
        return type(t)(_tables_to_host(v) for v in t)
    if hasattr(t, "dtype") and hasattr(t, "shape"):
        return np.asarray(t)
    return t


def _is_dw(spec: ConvSpec) -> bool:
    return (spec.groups == spec.in_ch and spec.groups > 1 and spec.kernel > 1
            and spec.heads == -1)


def plan_supports_cm(plan: EncoderPlan, qcfg: QuantConfig) -> bool:
    """Channel-major interior eligibility: every conv is pointwise or
    depthwise (stride 1/2), no SE / group shuffle / heads, and every
    activation fits int8 (act_bit + asymmetric trick <= 8)."""
    if qcfg.act_bit + 1 > 8:
        return False
    for bp in plan.blocks:
        if bp.se or bp.groups > 1:
            return False
        for spec in list(bp.convs) + list(bp.res):
            if spec.heads != -1:
                return False
            if spec.kernel == 1 and spec.groups == 1 and spec.stride == 1:
                continue
            if _is_dw(spec) and spec.stride in (1, 2):
                continue
            return False
    return True


def tables_all_static_e(tables) -> bool:
    """True when every requant exponent in the tables is a static Python int
    (freeze dyadic_mode='static_e') — required by the fused CM kernels."""
    for tb in tables["blocks"]:
        for entry in list(tb["convs"]) + list(tb["res"]):
            if entry is not None and "act_e" in entry \
                    and not isinstance(entry["act_e"], int):
                return False
        for e in tb["res_act"]:
            if not (isinstance(e["e"], int) and isinstance(e["e_r"], int)):
                return False
    return isinstance(tables["decoder"]["act_e"], int)


def build_dw_bands_cm(plan: EncoderPlan, tables):
    """Channel-major banded tiles (pad baked in) for every depthwise site.
    Returns ({key: (C,128,n_d*128) int8} for jit args, {key: j_min} static)."""
    from qasr_tpu.kernels.dw_mxu import band_tiles_cm

    bands: Dict[str, np.ndarray] = {}
    jmins: Dict[str, int] = {}
    for bi, (bp, tb) in enumerate(zip(plan.blocks, tables["blocks"])):
        for i, spec in enumerate(bp.convs):
            e = tb["convs"][i]
            if e is None or not _is_dw(spec):
                continue
            key = f"{bi}.convs.{i}"
            bands[key], jmins[key] = band_tiles_cm(
                np.asarray(e["w"], np.int8), spec.stride, spec.dilation,
                spec.padding)
    return bands, jmins


def build_dw_bands(plan: EncoderPlan, tables) -> Dict[str, np.ndarray]:
    """Banded-Toeplitz MXU weight tiles for every eligible depthwise site
    (kernels/dw_mxu.py): int8 activations (act_bits <= 8), stride 1/2, no
    heads.  Returned as a flat {"bi.kind.i": (C, 128, n_d*128) int8} dict —
    callers device_put this once and pass it as a *runtime argument* of the
    jitted step (as HLO literals the tiles are ~1 GB of program text, which
    overflows compile-payload limits)."""
    from qasr_tpu.kernels.dw_mxu import band_tiles

    bands: Dict[str, np.ndarray] = {}
    for bi, (bp, tb) in enumerate(zip(plan.blocks, tables["blocks"])):
        for i, spec in enumerate(bp.convs):
            e = tb["convs"][i]
            if e is None:
                continue
            if (spec.groups == spec.in_ch and spec.groups > 1
                    and spec.kernel > 1 and spec.heads == -1
                    and spec.stride in (1, 2) and e["act_bits"] <= 8):
                bands[f"{bi}.convs.{i}"] = band_tiles(
                    np.asarray(e["w"], np.int8), spec.stride, spec.dilation)
    return bands


class FrozenExec:
    """Deployment executor: int8 MXU convs + exact dyadic requants from the
    frozen tables. No float arithmetic until the decoder's log-softmax.

    use_pallas switches requants to the fused Pallas kernel
    (kernels/requant.py — same integer math, bit-identical).  Measured on
    v5e: identical runtime (the XLA-fused int chain already saturates HBM
    between convs) but slower one-time compile (~130 Mosaic kernel builds),
    so it stays opt-in."""

    def __init__(self, tables, qcfg: QuantConfig, *, activation: str,
                 use_pallas: bool = False, fuse_dw: bool = False,
                 dw_bands: Optional[Dict[str, Array]] = None):
        self.t = tables
        self.m16 = bool(tables.get("dyadic16", False))
        self.qcfg = qcfg
        self.activation_kind = activation
        self.use_pallas = use_pallas
        # dw_bands: banded-Toeplitz MXU tiles (build_dw_bands), passed by the
        # enclosing jit as runtime args; sites present here run the depthwise
        # conv on the MXU (bit-identical), the rest use the VPU kernel
        self.dw_bands = dw_bands or {}
        # fuse_dw: run separable dw convs through the fused requant+conv+
        # requant Pallas kernel (kernels/depthwise.depthwise_fused_requant).
        # Measured SLOWER on v5e (6055 vs 7499 RTFx): the exact two-limb
        # dyadic chain costs more as Mosaic VPU code than as XLA's fused
        # elementwise passes, and the input requant re-processes halo rows.
        # Kept opt-in (bit-identity tested) — it removes ~139 kernel
        # launches, which may win on parts with faster int vector units.
        self.fuse_dw = fuse_dw
        # site whose input the preceding fused dw kernel already requantized
        # + masked onto that site's grid (trace-sequential state)
        self._prequant_site = None

    def _act_bits(self, spec: ConvSpec) -> int:
        return self.qcfg.act_bit + (1 if spec.asymmetric else 0)

    @staticmethod
    def _narrow(q: Array, bits: int) -> Array:
        """Store activations int8 when they fit: a standalone int32->int8
        convert feeding a conv measures ~5x slower than a native int8 conv
        input on v5e; narrowing here fuses the cast into the requant chain
        and convs consume int8 directly."""
        return q.astype(jnp.int8) if bits <= 8 else q

    def _requant(self, z, m, e):
        if isinstance(e, int):  # static-exponent tables
            if self.m16:
                return dyadic_requant_static16(z, m, e)
            return dyadic_requant_static(z, m, e)
        return dyadic_requant(z, Dyadic(m, e))

    def _requant_in(self, entry, x: Union[Array, QTensor], bits: int) -> QTensor:
        if isinstance(x, QTensor):
            if self.use_pallas and not isinstance(entry["act_e"], int):
                from qasr_tpu.kernels.requant import requant_pallas
                q = requant_pallas(x.values, Dyadic(entry["act_m"], entry["act_e"]),
                                   bits)
                return QTensor(self._narrow(q, bits), entry["act_scale"])
            q = self._requant(x.values, entry["act_m"], entry["act_e"])
            q = requant_clamp(q, bits)
            return QTensor(self._narrow(q, bits), entry["act_scale"])
        # direct quantization of the float network input
        n = 2 ** (bits - 1) - 1
        q = jnp.round((1.0 / entry["act_scale"]) * x)
        return QTensor(self._narrow(jnp.clip(q, -n, n - 1).astype(jnp.int32), bits),
                       entry["act_scale"])

    def masked_conv(self, site, spec: ConvSpec, x, lens):
        bi, kind, i = site
        entry = self.t["blocks"][bi][kind][i]
        new_lens = conv_out_len(lens, spec)
        if self._prequant_site == site:
            # input is already int8 on this site's grid, masked, courtesy of
            # the preceding fused dw kernel — straight to the MXU
            self._prequant_site = None
            y = conv_nwc(x.values, entry["w"], spec, preferred=jnp.int32)
            if "b" in entry:
                y = y + entry["b"]
            return QTensor(y, entry["out_scale"]), new_lens
        if entry.get("fuse_next") and isinstance(x, QTensor) \
                and self.fuse_dw and not self.use_pallas:
            from qasr_tpu.kernels.depthwise import depthwise_fused_requant

            nxt = self.t["blocks"][bi][kind][i + 1]
            y8 = depthwise_fused_requant(
                x.values, entry["w"], lens,
                m1=entry["act_m"], e1=entry["act_e"], bits1=entry["act_bits"],
                m2=nxt["act_m"], e2=nxt["act_e"], bits2=nxt["act_bits"],
                padding=spec.padding, dilation=spec.dilation)
            if y8 is not None:
                self._prequant_site = (bi, kind, i + 1)
                return QTensor(y8, nxt["act_scale"]), new_lens
        if isinstance(x, QTensor):
            x = QTensor(mask_values(x.values, lens), x.scale)
        else:
            x = mask_values(x, lens)
        bits = self._act_bits(spec)
        xq = self._requant_in(entry, x, bits)
        xv = xq.values  # already int8 when bits <= 8
        wv = entry["w"] if xv.dtype == jnp.int8 else entry["w"].astype(jnp.int32)
        # exact per-tap product bound: requant clamps acts to [-2^(b-1),
        # 2^(b-1)-1], weights to [-(2^(wb-1)-1), 2^(wb-1)-2] — lets the
        # Pallas depthwise kernel pick the widest safe int16 tap group
        max_prod = (2 ** (bits - 1)) * (2 ** (self.qcfg.weight_bit - 1) - 1)
        y = conv_nwc(xv, wv, spec, preferred=jnp.int32, dw_max_prod=max_prod,
                     dw_band=self.dw_bands.get(f"{bi}.{kind}.{i}"))
        if "b" in entry:
            y = y + entry["b"]
        return QTensor(y, entry["out_scale"]), new_lens

    def residual_add(self, block_idx: int, pane: int, out: QTensor, res_out: QTensor,
                     mode: str):
        assert mode in ("add", "stride_add")
        e = self.t["blocks"][block_idx]["res_act"][pane]
        if self.use_pallas and not isinstance(e["e"], int):
            from qasr_tpu.kernels.requant import requant_pallas
            q = requant_pallas(out.values, Dyadic(e["m"], e["e"]),
                               self.qcfg.act_bit, identity=res_out.values,
                               identity_dyadic=Dyadic(e["m_r"], e["e_r"]))
            return QTensor(self._narrow(q, self.qcfg.act_bit), e["scale"])
        q = self._requant(out.values, e["m"], e["e"]) + \
            self._requant(res_out.values, e["m_r"], e["e_r"])
        q = requant_clamp(q, self.qcfg.act_bit)
        return QTensor(self._narrow(q, self.qcfg.act_bit), e["scale"])

    def activation(self, x: QTensor, dropout: float) -> QTensor:
        if self.activation_kind == "relu":
            return QTensor(jnp.maximum(x.values, 0), x.scale)  # dtype-preserving
        if self.activation_kind == "hardtanh":
            hi = jnp.round(20.0 / x.scale).astype(jnp.int32)
            if x.values.dtype == jnp.int8:
                hi = jnp.minimum(hi, 127)
            return QTensor(jnp.clip(x.values, 0, hi).astype(x.values.dtype), x.scale)
        y = jnp.round(_apply_activation(x.dequantize(), self.activation_kind) / x.scale)
        return QTensor(y.astype(jnp.int32), x.scale)

    def group_shuffle(self, x: QTensor, groups: int) -> QTensor:
        from qasr_tpu.models.jasper import group_shuffle_q
        return group_shuffle_q(x, groups)

    def squeeze_excite(self, block_idx, x, bp):
        raise NotImplementedError("SqueezeExcite does not support quantization")

    # -- decoder -----------------------------------------------------------

    def decoder(self, x: QTensor) -> Array:
        t = self.t["decoder"]
        if self.use_pallas and not isinstance(t["act_e"], int):
            from qasr_tpu.kernels.requant import requant_pallas
            q = requant_pallas(x.values, Dyadic(t["act_m"], t["act_e"]),
                               self.qcfg.act_bit)
        else:
            q = self._requant(x.values, t["act_m"], t["act_e"])
            q = requant_clamp(q, self.qcfg.act_bit)
        spec = decoder_spec(q.shape[-1], t["w"].shape[-1])
        xv = self._narrow(q, self.qcfg.act_bit)
        wv = t["w"] if xv.dtype == jnp.int8 else t["w"].astype(jnp.int32)
        y = conv_nwc(xv, wv, spec, preferred=jnp.int32) + t["b"]
        logits = y.astype(jnp.float32) * t["out_scale"]
        return jax.nn.log_softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Channel-major deployment executor
# ---------------------------------------------------------------------------


def _cm_vec(v):
    a = jnp.asarray(v)
    return a.reshape(-1, 1, 1, 1) if a.ndim == 1 else a


def cm_mask(lens: Array, n_t: int, tile0=0) -> Array:
    """(128, B, n_t) bool validity mask; time t = (tile0 + tile)*128 + row.
    tile0 (static or traced) offsets the local tile window under
    sequence-parallel sharding."""
    t_idx = (jnp.arange(128)[:, None, None]
             + 128 * (tile0 + jnp.arange(n_t))[None, None, :])  # (128, 1, n_t)
    return t_idx < lens[None, :, None]                  # (128, B, n_t)


def mask_values_cm(v: Array, lens: Array, tile0=0) -> Array:
    """Zero rows at/after the per-sample length; v: (C, 128, B, n_t),
    time t = (tile0 + tile)*128 + row."""
    mask = cm_mask(lens, v.shape[3], tile0)
    return jnp.where(mask[None], v, jnp.zeros((), v.dtype))


class FrozenExecCM(FrozenExec):
    """Channel-major FrozenExec: interior tensors live as (C, 128, B, n_t) —
    the banded depthwise matmul's *native output layout* — so separable
    stacks run transpose-free: dw = banded MXU dot (kernels/dw_mxu.py
    dw_banded_cm, conv padding baked into the band), pw = dot contracting
    the leading channel axis, requants/masks/relu elementwise.  Bit-identical
    to FrozenExec end to end (test_pallas_depthwise.py).

    Eligible plans only (plan_supports_cm: all convs pointwise or depthwise,
    every activation int8).  The float input is quantized in (B, T, C) and
    converted once; log-probs convert back after the decoder.  Frame counts
    must be padded to 128 * total_stride (pad_frames_aligned)."""

    def __init__(self, tables, qcfg: QuantConfig, *, activation: str,
                 dw_bands: Dict[str, Array], dw_jmins: Dict[str, int],
                 tp_axis: Optional[str] = None, tp_size: int = 1,
                 sp_axis: Optional[str] = None, sp_size: int = 1):
        super().__init__(tables, qcfg, activation=activation)
        self.dw_bands_cm = dw_bands
        self.dw_jmins = dw_jmins
        # Tensor-parallel mode (inside shard_map): the channel axis of every
        # interior tensor, band, and per-channel table vector is the LOCAL
        # shard of the mesh axis `tp_axis`.  Depthwise convs, requants,
        # activations, and residual adds are per-channel — no communication;
        # pointwise convs contract the full Cin, so their (already int8)
        # inputs are all-gathered along tp_axis while the weight stays
        # out-channel-sharded (parallel/eval.py localize_tables_cm).
        self.tp_axis = tp_axis
        self.tp_size = tp_size
        # Sequence-parallel mode (inside shard_map): the tile axis (axis 3)
        # of every interior tensor is the LOCAL time shard of mesh axis
        # `sp_axis` — pointwise convs / requants / residual adds are local,
        # masks are offset by the shard's global tile index, and depthwise
        # convs ppermute-exchange the few neighbor tiles their band reaches
        # (halo = receptive field at 128-frame tile granularity; ppermute's
        # zero fill at the mesh edges matches the conv's zero padding).
        self.sp_axis = sp_axis
        self.sp_size = sp_size

    def _sp_tile0(self, n_t_local: int):
        """Global tile index of this device's first local tile."""
        if self.sp_axis is None:
            return 0
        return jax.lax.axis_index(self.sp_axis) * n_t_local

    def _sp_halo4(self, x: Array, hl: int, hr: int) -> Array:
        """Extend the local tile axis (last) with hl left-neighbor and hr
        right-neighbor tiles via ppermute; devices at the mesh edges
        receive zeros (= the global conv padding)."""
        if self.sp_axis is None or (hl == 0 and hr == 0):
            return x
        n = self.sp_size
        parts = []
        if hl:
            parts.append(jax.lax.ppermute(
                x[..., -hl:], self.sp_axis,
                [(i, i + 1) for i in range(n - 1)]))
        parts.append(x)
        if hr:
            parts.append(jax.lax.ppermute(
                x[..., :hr], self.sp_axis,
                [(i + 1, i) for i in range(n - 1)]))
        return jnp.concatenate(parts, axis=-1)

    def _dw_halos(self, key: str, stride: int):
        """(hl, hr) neighbor tiles a depthwise site needs: its band reads
        input tiles [s*o + j_min, s*o + j_min + n_d - 1] per output tile o."""
        if self.sp_axis is None:
            return 0, 0
        n_d = self.dw_bands_cm[key].shape[-1] // 128
        j_min = self.dw_jmins[key]
        return max(0, -j_min), max(0, j_min + n_d - stride)

    def _local_tiles(self, x: Array) -> Array:
        """Slice this device's tile shard from a full-T channel-major
        tensor (the float network input after to_cm); axis 3."""
        if self.sp_axis is None:
            return x
        nl = x.shape[3] // self.sp_size
        idx = jax.lax.axis_index(self.sp_axis)
        return jax.lax.dynamic_slice_in_dim(x, idx * nl, nl, axis=3)

    def _local_channels(self, x: Array) -> Array:
        """Slice this device's channel shard from a full-C channel-major
        tensor (the float network input after to_cm)."""
        if self.tp_axis is None:
            return x
        cl = x.shape[0] // self.tp_size
        idx = jax.lax.axis_index(self.tp_axis)
        return jax.lax.dynamic_slice_in_dim(x, idx * cl, cl, axis=0)

    def _gather_tp(self, xq: Array) -> Array:
        """all-gather a channel-sharded int8 tensor to full C (axis 0).
        tiled=True concatenates shards in axis order, restoring the global
        channel order the out-channel-sharded weights were sliced from."""
        if self.tp_axis is None:
            return xq
        return jax.lax.all_gather(xq, self.tp_axis, axis=0, tiled=True)

    def _requant_cm(self, z, m, e, nonneg: bool = False):
        m = _cm_vec(m)
        if isinstance(e, int):
            if self.m16:
                return dyadic_requant_static16(z, m, e, nonneg=nonneg)
            return dyadic_requant_static(z, m, e, nonneg=nonneg)
        return dyadic_requant(z, Dyadic(m, _cm_vec(e)))

    def _is_nonneg(self, x) -> bool:
        """True when x is the tensor activation() just returned — relu and
        the clip(0, hi) hardtanh both guarantee values >= 0, letting the
        following requant skip sign handling (exact on non-negatives).
        Tracks a *strong reference* compared with ``is`` (not ``id()``):
        CPython reuses freed object addresses, so an id of a collected
        QTensor could alias an unrelated later tensor."""
        return x is getattr(self, "_nonneg_ref", None)

    def _prep_input_cm(self, entry, x, lens, bits: int):
        """Mask + requant + clamp + narrow the conv input to int8-valued
        (C, 128, B, n_t), handling both a QTensor from the previous layer
        and the float network input (quantized then converted once)."""
        if isinstance(x, QTensor):
            nonneg = self._is_nonneg(x)
            xv = mask_values_cm(x.values, lens,
                                self._sp_tile0(x.values.shape[3]))
            q = requant_clamp(
                self._requant_cm(xv, entry["act_m"], entry["act_e"],
                                 nonneg=nonneg), bits)
            return self._narrow(q, bits)
        from qasr_tpu.kernels.dw_mxu import to_cm

        n = 2 ** (bits - 1) - 1
        xm = mask_values(x, lens)
        q = jnp.round((1.0 / entry["act_scale"]) * xm)
        return self._local_tiles(self._local_channels(to_cm(self._narrow(
            jnp.clip(q, -n, n - 1).astype(jnp.int32), bits))))

    def masked_conv(self, site, spec: ConvSpec, x, lens):
        bi, kind, i = site
        entry = self.t["blocks"][bi][kind][i]
        new_lens = conv_out_len(lens, spec)
        bits = self._act_bits(spec)
        xq = self._prep_input_cm(entry, x, lens, bits)
        if _is_dw(spec):
            from qasr_tpu.kernels.dw_mxu import dw_banded_cm, dw_banded_cm_ext

            key = f"{bi}.{kind}.{i}"
            hl, hr = self._dw_halos(key, spec.stride)
            if hl or hr:
                xe = self._sp_halo4(xq, hl, hr)
                y = dw_banded_cm_ext(xe, self.dw_bands_cm[key], spec.stride,
                                     xq.shape[3] // spec.stride)
            else:
                y = dw_banded_cm(xq, self.dw_bands_cm[key],
                                 self.dw_jmins[key], spec.stride)
        else:
            y = jax.lax.dot_general(entry["w"][0], self._gather_tp(xq),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        if "b" in entry:
            y = y + _cm_vec(entry["b"])
        return QTensor(y, entry["out_scale"]), new_lens

    def residual_add(self, block_idx: int, pane: int, out: QTensor,
                     res_out: QTensor, mode: str):
        assert mode in ("add", "stride_add")
        e = self.t["blocks"][block_idx]["res_act"][pane]
        q = self._requant_cm(out.values, e["m"], e["e"]) + \
            self._requant_cm(res_out.values, e["m_r"], e["e_r"])
        q = requant_clamp(q, self.qcfg.act_bit)
        return QTensor(self._narrow(q, self.qcfg.act_bit), e["scale"])

    def activation(self, x: QTensor, dropout: float) -> QTensor:
        if self.activation_kind == "relu":
            out = QTensor(jnp.maximum(x.values, 0), x.scale)
            self._nonneg_ref = out
            return out
        if self.activation_kind == "hardtanh":
            hi = jnp.round(20.0 / _cm_vec(x.scale)).astype(jnp.int32)
            if x.values.dtype == jnp.int8:
                hi = jnp.minimum(hi, 127)
            out = QTensor(jnp.clip(x.values, 0, hi).astype(x.values.dtype),
                          x.scale)
            self._nonneg_ref = out
            return out
        y = jnp.round(_apply_activation(
            x.values.astype(jnp.float32) * _cm_vec(x.scale),
            self.activation_kind) / _cm_vec(x.scale))
        return QTensor(y.astype(jnp.int32), x.scale)

    def decoder(self, x: QTensor) -> Array:
        from qasr_tpu.kernels.dw_mxu import from_cm

        t = self.t["decoder"]
        q = requant_clamp(
            self._requant_cm(x.values, t["act_m"], t["act_e"]),
            self.qcfg.act_bit)
        xv = self._gather_tp(self._narrow(q, self.qcfg.act_bit))
        y = jax.lax.dot_general(t["w"][0], xv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y + _cm_vec(t["b"])
        logits = y.astype(jnp.float32) * _cm_vec(t["out_scale"])
        lp = jax.nn.log_softmax(logits, axis=0)
        return from_cm(lp)


# ---------------------------------------------------------------------------
# Fused channel-major executor: pending dots
# ---------------------------------------------------------------------------


class _PendingConv:
    """A conv whose MXU dot has not been materialized yet.

    The epilogue between two convs — bias, ReLU, length mask, the consumer's
    dyadic requant, clamp, int8 narrow — is entirely elementwise, so it runs
    fused with the *producer's* dot in one Pallas kernel
    (kernels/cm_fused.py) once the consumer supplies its requant parameters.
    Until then the dot is carried symbolically."""

    __slots__ = ("kind", "xq", "entry", "spec", "key", "b_sz", "relu")

    def __init__(self, kind, xq, entry, spec, key, b_sz):
        self.kind = kind      # 'pw' | 'dw'
        self.xq = xq          # int8 (Cin, 128, B*n_t) channel-major input
        self.entry = entry    # this conv's frozen table entry
        self.spec = spec
        self.key = key        # dw band key ("bi.kind.i")
        self.b_sz = b_sz      # batch size (bt = b_sz * n_t)
        self.relu = False     # staged activation (set by activation())


class FrozenExecCMF(FrozenExecCM):
    """FrozenExecCM with dot-epilogue fusion.

    Each masked_conv returns a _PendingConv instead of running its dot; the
    *next* conv flushes it through a fused Pallas kernel whose epilogue
    performs [bias -> relu -> mask -> exact dyadic requant -> clamp -> int8]
    on the VPU while the MXU streams the dot — the step's VPU requant floor
    then hides all MXU time and the int32 accumulators never reach HBM.
    Joins that need concrete int32 tensors (residual adds, non-relu
    activations, block ends, the decoder) flush through the plain XLA dot,
    which is today's unfused path — so this executor is bit-identical to
    FrozenExecCM end to end (tested in test_pallas_depthwise.py).

    Requires static-exponent tables (freeze dyadic_mode='static_e',
    tables_all_static_e) on top of plan_supports_cm eligibility.

    fuse_pw=False (the default) fuses only the depthwise sites and leaves
    pointwise dots + their input requants to XLA.  Measured on v5e this is
    the faster configuration: a Pallas kernel's operands/results are pinned
    to default layouts, and the retiling copies XLA inserts between two
    adjacent Pallas kernels (the 2D pw form and 3D dw form tile different
    physical dims) cost more than the pw fusion saves — whereas an XLA
    elementwise producer/consumer adapts to the dw kernel's layout for
    free.  fuse_pw=True runs the all-kernel pipeline (kept for future TPU
    generations / layout-assignment improvements).
    """

    def __init__(self, tables, qcfg: QuantConfig, *, activation: str,
                 dw_bands: Dict[str, Array], dw_jmins: Dict[str, int],
                 fuse_pw: bool = False, fuse_join: bool = False,
                 tp_axis: Optional[str] = None,
                 tp_size: int = 1, sp_axis: Optional[str] = None,
                 sp_size: int = 1):
        super().__init__(tables, qcfg, activation=activation,
                         dw_bands=dw_bands, dw_jmins=dw_jmins,
                         tp_axis=tp_axis, tp_size=tp_size,
                         sp_axis=sp_axis, sp_size=sp_size)
        self.fuse_pw = fuse_pw
        # fuse_join: the block-tail pointwise conv stays pending through
        # residual_add, which flushes it through the 3-input fused kernel
        # (dot + two-requant join epilogue, kernels/cm_fused.py::
        # fused_pw_join_cm) instead of [XLA dot -> int32 HBM round-trip ->
        # standalone join fusion]
        self.fuse_join = fuse_join

    # -- pending resolution --------------------------------------------------

    def _band3(self, key: str, c: int) -> Array:
        # bands ride through the jit as 2D (C*128, n_d*128) parameters so
        # XLA's parameter-layout choice stays default (the 3D form was
        # assigned layout {0,2,1} and copied — 0.1 ms x 77 sites — before
        # every pallas call); this reshape is a free bitcast
        b2 = self.dw_bands_cm[key]
        return b2.reshape(c, 128, b2.shape[1]) if b2.ndim == 2 else b2

    def _mask2(self, lens, n_t: int, tile0=0):
        return cm_mask(lens, n_t, tile0).reshape(128, lens.shape[0] * n_t)

    def _mask_tm(self, lens, n_t: int, tile0=0):
        """(B*n_t, 128) validity mask for the tile-major kernel;
        t = (tile0 + tile)*128 + row."""
        t_idx = (128 * (tile0 + jnp.arange(n_t))[None, :, None]
                 + jnp.arange(128)[None, None, :])       # (1, n_t, 128)
        return (t_idx < lens[:, None, None]).reshape(-1, 128)

    def _x4(self, p: _PendingConv):
        c, _, bt = p.xq.shape
        return p.xq.reshape(c, 128, p.b_sz, bt // p.b_sz)

    def _flush_int8(self, p: _PendingConv, lens, entry, bits: int):
        """Run p's dot with the consumer-site epilogue -> int8 3D tensor."""
        from qasr_tpu.kernels.cm_fused import (
            fused_dw_cm, fused_dw_win_cm, fused_pw_cm,
        )
        from qasr_tpu.kernels.dw_mxu import dw_gather_cm

        m = entry["act_m"]
        e = entry["act_e"]
        assert isinstance(e, int) and np.ndim(m) == 1
        bias = p.entry.get("b")
        n_t = p.xq.shape[2] // p.b_sz
        if p.kind == "pw":
            w0 = p.entry["w"][0]
            # host transpose when the table is still a host array; traced
            # (e.g. TP-sliced) weights transpose in-graph
            wt = (jnp.asarray(np.ascontiguousarray(np.asarray(w0).T))
                  if isinstance(w0, np.ndarray) else w0.T)
            return fused_pw_cm(p.xq, wt, bias,
                               self._mask2(lens, n_t, self._sp_tile0(n_t)),
                               m, e, bits, p.relu, m16=self.m16)
        j_min = self.dw_jmins[p.key]
        band2 = self.dw_bands_cm[p.key]
        hl, hr = self._dw_halos(p.key, p.spec.stride)
        band2t = self.dw_bands_cm.get(p.key + "#tm")
        if (p.spec.stride == 1 and band2t is not None
                and not (hl or hr)):
            # tile-major kernel: operands logically (bt, C, 128) — the
            # physical form XLA's dot/requant fusions already prefer, so
            # the transposes around it lower to layout bitcasts and the
            # 2-copies-per-site layout tax disappears (PERF.md round 3c)
            from qasr_tpu.kernels.cm_fused import fused_dw_win_tm

            x_tm = jnp.transpose(p.xq, (2, 0, 1))
            out_tm = fused_dw_win_tm(
                x_tm, band2t, j_min, p.b_sz, bias,
                self._mask_tm(lens, n_t, self._sp_tile0(n_t)), m, e, bits,
                p.relu, m16=self.m16)
            return jnp.transpose(out_tm, (1, 2, 0))
        if p.spec.stride == 1 and band2.ndim == 2:
            if hl or hr:
                # SP: run the fused kernel on the halo-extended shard (its
                # per-tile validity masks see the extended range; outputs in
                # the halo tiles assume global-edge padding and are dropped)
                c = p.xq.shape[0]
                xe = self._sp_halo4(self._x4(p), hl, hr)
                n_ext = xe.shape[3]
                tile0 = self._sp_tile0(n_t) - hl
                out = fused_dw_win_cm(
                    xe.reshape(c, 128, p.b_sz * n_ext), band2, j_min, p.b_sz,
                    bias, self._mask2(lens, n_ext, tile0), m, e, bits, p.relu,
                    m16=self.m16)
                out = out.reshape(c, 128, p.b_sz, n_ext)[..., hl:hl + n_t]
                return out.reshape(c, 128, p.b_sz * n_t)
            return fused_dw_win_cm(p.xq, band2, j_min, p.b_sz, bias,
                                   self._mask2(lens, n_t), m, e, bits, p.relu,
                                   m16=self.m16)
        band = self._band3(p.key, p.xq.shape[0])
        if hl or hr:
            from qasr_tpu.kernels.dw_mxu import dw_gather_cm_ext

            xe = self._sp_halo4(self._x4(p), hl, hr)
            xg = dw_gather_cm_ext(xe, band.shape[2] // 128, p.spec.stride,
                                  n_t // p.spec.stride)
        else:
            xg = dw_gather_cm(self._x4(p), j_min, band.shape[2] // 128,
                              p.spec.stride)
        mask = cm_mask(lens, xg.shape[3], self._sp_tile0(xg.shape[3]))
        out = fused_dw_cm(xg, band, bias, mask, m, e, bits, p.relu,
                          m16=self.m16)
        c = out.shape[0]
        return out.reshape(c, 128, out.shape[2] * out.shape[3])

    def _flush_int32(self, p: _PendingConv) -> QTensor:
        """Materialize p through the plain XLA dot (+bias, +staged relu),
        back in the 4D (C, 128, B, n_t) form the XLA-side ops use."""
        from qasr_tpu.kernels.dw_mxu import dw_banded_cm

        if p.kind == "pw":
            y = jax.lax.dot_general(p.entry["w"][0], self._x4(p),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        else:
            hl, hr = self._dw_halos(p.key, p.spec.stride)
            if hl or hr:
                from qasr_tpu.kernels.dw_mxu import dw_banded_cm_ext

                x4 = self._x4(p)
                y = dw_banded_cm_ext(self._sp_halo4(x4, hl, hr),
                                     self._band3(p.key, p.xq.shape[0]),
                                     p.spec.stride,
                                     x4.shape[3] // p.spec.stride)
            else:
                y = dw_banded_cm(self._x4(p),
                                 self._band3(p.key, p.xq.shape[0]),
                                 self.dw_jmins[p.key], p.spec.stride)
        if "b" in p.entry:
            y = y + _cm_vec(p.entry["b"])
        if p.relu:
            y = jnp.maximum(y, 0)
        return QTensor(y, p.entry["out_scale"])

    # -- executor protocol ---------------------------------------------------

    def masked_conv(self, site, spec: ConvSpec, x, lens):
        bi, kind, i = site
        entry = self.t["blocks"][bi][kind][i]
        new_lens = conv_out_len(lens, spec)
        bits = self._act_bits(spec)
        if isinstance(x, _PendingConv):
            xq = self._flush_int8(x, lens, entry, bits)
        else:
            xq = self._prep_input_cm(entry, x, lens, bits)
            c, _, b_, n_t = xq.shape
            xq = xq.reshape(c, 128, b_ * n_t)
        key = f"{bi}.{kind}.{i}"
        pkind = "dw" if _is_dw(spec) else "pw"
        if pkind == "pw":
            # TP: the pw dot contracts the full Cin; gather the (int8,
            # already-requantized) channel shards before staging the dot
            xq = self._gather_tp(xq)
        p = _PendingConv(pkind, xq, entry, spec, key, lens.shape[0])
        band2 = self.dw_bands_cm.get(key)
        blk = self.t["blocks"][bi]
        res_tail = (kind == "convs" and len(blk["res_act"]) > 0
                    and i == len(blk["convs"]) - 1)
        eligible = (
            (pkind == "dw" and spec.stride == 1
             and getattr(band2, "ndim", 0) == 2)
            or (pkind == "pw" and self.fuse_pw)
            or (pkind == "pw" and self.fuse_join and res_tail))
        if eligible:
            return p, new_lens
        # ineligible for deferred fusion: materialize through XLA right away
        return self._flush_int32(p), new_lens

    def activation(self, x, dropout: float):
        if isinstance(x, _PendingConv):
            if self.activation_kind == "relu":
                x.relu = True
                return x
            x = self._flush_int32(x)
        return super().activation(x, dropout)

    def residual_add(self, block_idx: int, pane: int, out, res_out, mode: str):
        if isinstance(res_out, _PendingConv):
            res_out = self._flush_int32(res_out)
        if (isinstance(out, _PendingConv) and self.fuse_join
                and out.kind == "pw" and not out.relu):
            from qasr_tpu.kernels.cm_fused import fused_pw_join_cm

            e = self.t["blocks"][block_idx]["res_act"][pane]
            assert isinstance(e["e"], int) and isinstance(e["e_r"], int)
            w0 = out.entry["w"][0]
            wt = (jnp.asarray(np.ascontiguousarray(np.asarray(w0).T))
                  if isinstance(w0, np.ndarray) else w0.T)
            c_out, _, b_, n_t = res_out.values.shape
            q8 = fused_pw_join_cm(
                out.xq, wt, out.entry.get("b"),
                res_out.values.reshape(c_out, 128, b_ * n_t),
                e["m"], e["e"], e["m_r"], e["e_r"],
                self.qcfg.act_bit, m16=self.m16)
            return QTensor(q8.reshape(c_out, 128, b_, n_t), e["scale"])
        if isinstance(out, _PendingConv):
            out = self._flush_int32(out)
        return super().residual_add(block_idx, pane, out, res_out, mode)

    def block_end(self, x):
        # Block outputs can have several consumers (the next block's first
        # conv plus residual branches, many under dense residual), each with
        # its own requant — a single fused epilogue cannot serve them all,
        # so materialize here.  Residual blocks end in residual_add and are
        # already concrete; this only un-fuses non-residual block tails.
        return self._flush_int32(x) if isinstance(x, _PendingConv) else x

    def decoder(self, x) -> Array:
        if isinstance(x, _PendingConv):  # defensive: block_end materializes
            x = self._flush_int32(x)
        return super().decoder(x)
