"""ONNX export of the ConvASR model family (fp32 deployment graphs).

Capability parity with the reference's ONNX interop:
  * `scripts/convasr_to_onnx.py:1-60` — .nemo -> separate encoder / decoder
    ONNX files for the asr / speech_label / speaker model types;
  * `core/classes/exportable.py:43-212` — dynamic batch/time axes from the
    module's NeuralTypes;
  * `nemo/utils/export_utils.py:192-232` (`attach_onnx_to_onnx`) — stitch an
    encoder ModelProto and a decoder ModelProto into one graph.

The graphs are built directly from the same `EncoderPlan` the JAX executors
walk (models/jasper.py::block_forward), so the exported topology is exactly
the serving topology: Conv/BatchNormalization/Relu/Add/... in the
channels-first (B, C, T) layout ONNX runtimes expect.  Like the reference's
torch.onnx trace of MaskedConv1d, the exported graph computes the unmasked
forward — on padded batches the caller trims by the returned length
arithmetic, exactly as the reference deployment examples do.

Quantized paths deploy via StableHLO (utils/export.py) — ONNX export is the
float interop surface, mirroring the reference (which likewise only ever
exported the float model; its quant modules have no ONNX symbolics).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from qasr_tpu.compat import onnx_proto as P
from qasr_tpu.models.jasper import BN_EPS, BlockPlan, ConvSpec, EncoderPlan

_SELU_ALPHA = 1.6732632423543772
_SELU_GAMMA = 1.0507009873554805


class _GraphBuilder:
    """Accumulates nodes/initializers with unique names."""

    def __init__(self, name: str):
        self.name = name
        self.nodes: List[bytes] = []
        self.inits: List[bytes] = []
        self._init_names: set = set()
        self._n = 0

    def tensor(self, name: str, arr: np.ndarray) -> str:
        if name in self._init_names:
            raise ValueError(f"duplicate initializer {name}")
        self._init_names.add(name)
        self.inits.append(P.tensor_proto(name, np.asarray(arr)))
        return name

    def op(self, op_type: str, inputs: Sequence[str], n_out: int = 1,
           name: str = "", **attrs) -> Any:
        self._n += 1
        name = name or f"{op_type}_{self._n}"
        outs = [f"{name}_out{i}" if i else f"{name}_out" for i in range(n_out)]
        self.nodes.append(P.node_proto(op_type, inputs, outs, name, attrs))
        return outs[0] if n_out == 1 else outs

    def rename_output(self, tensor: str, public: str):
        """Expose an internal tensor under a public output name."""
        self.nodes.append(P.node_proto("Identity", [tensor], [public],
                                       f"output_{public}"))
        return public

    def build(self, inputs: Sequence[bytes], outputs: Sequence[bytes],
              opset: int = 13, doc: str = "") -> bytes:
        g = P.graph_proto(self.name, self.nodes, inputs, outputs, self.inits)
        return P.model_proto(g, opset=opset, doc=doc)


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv_weight_onnx(spec: ConvSpec, w: np.ndarray) -> Tuple[np.ndarray, int]:
    """(K, Cin/g, Cout) WIO -> ONNX (M, C/group, K), resolving `heads`.

    `heads` folds channel groups into the batch with a shared depthwise
    weight (jasper.py:139-147 in the reference; models/jasper.py:346-350
    here).  That is arithmetic-identical to a depthwise conv over all C
    channels whose weight tiles the shared (heads,) bank C/heads times, which
    is how ONNX (one static graph, no batch reshaping) expresses it.
    """
    w = _np(w)
    if spec.heads != -1:
        k, cg, _ = w.shape
        assert cg == 1, "heads conv is depthwise"
        reps = spec.in_ch // spec.heads
        w_onnx = np.tile(np.transpose(w, (2, 1, 0)), (reps, 1, 1))
        return w_onnx, spec.in_ch
    return np.transpose(w, (2, 1, 0)), spec.groups


def _emit_conv(g: _GraphBuilder, prefix: str, spec: ConvSpec,
               p: Dict[str, Any], x: str) -> str:
    w_onnx, group = _conv_weight_onnx(spec, p["w"])
    ins = [x, g.tensor(f"{prefix}.weight", w_onnx)]
    if p.get("b") is not None:
        ins.append(g.tensor(f"{prefix}.bias", _np(p["b"])))
    y = g.op("Conv", ins, name=f"{prefix}.conv",
             dilations=[spec.dilation], group=group,
             kernel_shape=[spec.kernel],
             pads=[spec.padding, spec.padding], strides=[spec.stride])
    if spec.has_bn and "bn" in p:
        bn = p["bn"]
        y = g.op("BatchNormalization",
                 [y,
                  g.tensor(f"{prefix}.bn.gamma", _np(bn["gamma"])),
                  g.tensor(f"{prefix}.bn.beta", _np(bn["beta"])),
                  g.tensor(f"{prefix}.bn.mean", _np(bn["mean"])),
                  g.tensor(f"{prefix}.bn.var", _np(bn["var"]))],
                 name=f"{prefix}.bn", epsilon=float(BN_EPS))
    return y


def _emit_activation(g: _GraphBuilder, kind: str, x: str, name: str) -> str:
    if kind == "relu":
        return g.op("Relu", [x], name=name)
    if kind == "hardtanh":  # clip to [0, 20], jasper.py:637
        lo = g.tensor(f"{name}.min", np.float32(0.0))
        hi = g.tensor(f"{name}.max", np.float32(20.0))
        return g.op("Clip", [x, lo, hi], name=name)
    if kind == "selu":
        return g.op("Selu", [x], name=name,
                    alpha=float(_SELU_ALPHA), gamma=float(_SELU_GAMMA))
    if kind == "swish":
        s = g.op("Sigmoid", [x], name=f"{name}.sigmoid")
        return g.op("Mul", [x, s], name=f"{name}.mul")
    raise ValueError(f"unknown activation {kind}")


def _emit_group_shuffle(g: _GraphBuilder, x: str, groups: int, c: int,
                        name: str) -> str:
    """GroupShuffle (jasper.py:215-231) on (B, C, T): reshape to
    (B, g, C/g, T), swap the channel factors, reshape back.  Reshape uses
    0 = copy-dim and -1 = infer so B and T stay dynamic."""
    s1 = g.tensor(f"{name}.shape1", np.asarray([0, groups, c // groups, -1], np.int64))
    s2 = g.tensor(f"{name}.shape2", np.asarray([0, c, -1], np.int64))
    y = g.op("Reshape", [x, s1], name=f"{name}.split")
    y = g.op("Transpose", [y], name=f"{name}.swap", perm=[0, 2, 1, 3])
    return g.op("Reshape", [y, s2], name=f"{name}.merge")


def _emit_se(g: _GraphBuilder, bp: BlockPlan, p: Dict[str, Any], x: str,
             name: str) -> str:
    """SqueezeExcite, global-context form (jasper.py:234-290): time-average
    -> fc1 -> relu -> fc2 -> sigmoid gate."""
    if bp.se_context_window > 0:
        raise NotImplementedError(
            "ONNX export of windowed SqueezeExcite (se_context_window>0) is "
            "not supported; export with global context or use StableHLO "
            "(utils/export.py)")
    y = g.op("ReduceMean", [x], name=f"{name}.pool", axes=[2], keepdims=1)
    y = g.op("Transpose", [y], name=f"{name}.to_nlc", perm=[0, 2, 1])  # (B,1,C)
    y = g.op("MatMul", [y, g.tensor(f"{name}.fc1", _np(p["fc1"]))],
             name=f"{name}.fc1mm")
    y = g.op("Relu", [y], name=f"{name}.relu")
    y = g.op("MatMul", [y, g.tensor(f"{name}.fc2", _np(p["fc2"]))],
             name=f"{name}.fc2mm")
    y = g.op("Sigmoid", [y], name=f"{name}.gate")
    y = g.op("Transpose", [y], name=f"{name}.to_ncl", perm=[0, 2, 1])  # (B,C,1)
    return g.op("Mul", [x, y], name=f"{name}.scale")


def encoder_to_onnx(plan: EncoderPlan, enc_params: Dict[str, Any],
                    doc: str = "") -> bytes:
    """ConvASREncoder -> ONNX ModelProto.

    Input `audio_signal` (B, feat_in, T), output `outputs` (B, feat_out, T')
    — the same ports the reference encoder exports
    (conv_asr.py:160-175 NeuralTypes; exportable.py:43-212 dynamic axes).
    """
    g = _GraphBuilder("qasr_tpu_encoder")
    act = plan.activation
    xs: List[str] = ["audio_signal"]
    for bp in plan.blocks:
        bparams = enc_params["blocks"][bp.index]
        out = xs[-1]
        n = len(bp.convs)
        for ci, spec in enumerate(bp.convs):
            prefix = f"b{bp.index}.conv{ci}"
            out = _emit_conv(g, prefix, spec, bparams["convs"][ci], out)
            if bp.groups > 1 and spec.has_bn:
                out = _emit_group_shuffle(g, out, bp.groups, spec.out_ch,
                                          f"{prefix}.shuffle")
            if spec.end_of_repeat and ci != n - 1:
                out = _emit_activation(g, act, out, f"{prefix}.act")
        if bp.se:
            out = _emit_se(g, bp, bparams["se"], out, f"b{bp.index}.se")
        if bp.residual:
            for pi, rspec in enumerate(bp.res):
                r = _emit_conv(g, f"b{bp.index}.res{pi}", rspec,
                               bparams["res"][pi], xs[pi])
                op = "Add" if bp.residual_mode in ("add", "stride_add") else "Max"
                out = g.op(op, [out, r], name=f"b{bp.index}.join{pi}")
        out = _emit_activation(g, act, out, f"b{bp.index}.act")
        xs = xs + [out] if (bp.residual and bp.dense_residual) else [out]
    g.rename_output(xs[-1], "outputs")
    return g.build(
        inputs=[P.value_info("audio_signal", P.FLOAT,
                             ["batch", plan.feat_in, "time"])],
        outputs=[P.value_info("outputs", P.FLOAT,
                              ["batch", plan.feat_out, "time_out"])],
        doc=doc or "qasr_tpu ConvASREncoder (fp32)")


def ctc_decoder_to_onnx(dec_params: Dict[str, Any]) -> bytes:
    """ConvASRDecoder (conv_asr.py:223-319): 1x1 conv -> transpose ->
    LogSoftmax.  Input `encoder_output` (B, C, T'); output `logprobs`
    (B, T', classes)."""
    g = _GraphBuilder("qasr_tpu_ctc_decoder")
    w = _np(dec_params["w"])  # (1, C, classes)
    feat_in, classes = w.shape[1], w.shape[2]
    spec = ConvSpec(in_ch=feat_in, out_ch=classes, kernel=1, bias=True,
                    has_bn=False)
    y = _emit_conv(g, "decoder", spec,
                   {"w": w, "b": _np(dec_params["b"])}, "encoder_output")
    y = g.op("Transpose", [y], name="decoder.btc", perm=[0, 2, 1])
    y = g.op("LogSoftmax", [y], name="decoder.logsoftmax", axis=2)
    g.rename_output(y, "logprobs")
    return g.build(
        inputs=[P.value_info("encoder_output", P.FLOAT,
                             ["batch", feat_in, "time_out"])],
        outputs=[P.value_info("logprobs", P.FLOAT,
                              ["batch", "time_out", classes])],
        doc="qasr_tpu ConvASRDecoder (fp32)")


def classification_decoder_to_onnx(dec_params: Dict[str, Any],
                                   pooling: str = "avg") -> bytes:
    """ConvASRDecoderClassification (conv_asr.py:322-384): time pool ->
    linear -> logits.  The exported pool is over the full (unmasked) time
    axis, matching the reference's AdaptiveAvgPool1d(1) export."""
    g = _GraphBuilder("qasr_tpu_classification_decoder")
    w = _np(dec_params["linear"]["w"])  # (C, num_classes)
    feat_in, classes = w.shape
    pool_op = {"avg": "ReduceMean", "max": "ReduceMax"}[pooling]
    y = g.op(pool_op, ["encoder_output"], name="decoder.pool",
             axes=[2], keepdims=0)  # (B, C)
    y = g.op("MatMul", [y, g.tensor("decoder.weight", w)], name="decoder.mm")
    y = g.op("Add", [y, g.tensor("decoder.bias", _np(dec_params["linear"]["b"]))],
             name="decoder.addb")
    g.rename_output(y, "logits")
    return g.build(
        inputs=[P.value_info("encoder_output", P.FLOAT,
                             ["batch", feat_in, "time_out"])],
        outputs=[P.value_info("logits", P.FLOAT, ["batch", classes])],
        doc="qasr_tpu ConvASRDecoderClassification (fp32)")


def speaker_decoder_to_onnx(dec_params: Dict[str, Any], *,
                            pool_mode: str = "xvector",
                            angular: bool = False) -> bytes:
    """SpeakerDecoder (conv_asr.py:387-489): stats pooling (mean ++ std over
    time) -> [linear+BN+relu] embedding layers -> final linear.  Outputs
    `logits` and `embs` (the last embedding layer's pre-BN linear output),
    the same two ports the reference decoder exports."""
    if pool_mode != "xvector":
        raise NotImplementedError(
            f"ONNX speaker export supports pool_mode='xvector' "
            f"(got {pool_mode!r}); gram/superVector deploy via StableHLO")
    g = _GraphBuilder("qasr_tpu_speaker_decoder")
    x = "encoder_output"  # (B, C, T)
    mean = g.op("ReduceMean", [x], name="pool.mean", axes=[2], keepdims=1)
    cent = g.op("Sub", [x, mean], name="pool.center")
    sq = g.op("Mul", [cent, cent], name="pool.sq")
    var0 = g.op("ReduceMean", [sq], name="pool.var0", axes=[2], keepdims=0)
    # Bessel correction (StatsPoolLayer std is ddof=1, classification.py):
    # scale the population variance by T/(T-1) with T read dynamically.
    shp = g.op("Shape", [x], name="pool.shape")
    t64 = g.op("Gather", [shp, g.tensor("pool.tidx", np.asarray(2, np.int64))],
               name="pool.t", axis=0)
    tf = g.op("Cast", [t64], name="pool.tf", to=P.FLOAT)
    tm1 = g.op("Sub", [tf, g.tensor("pool.one", np.float32(1.0))],
               name="pool.tm1")
    corr = g.op("Div", [tf, tm1], name="pool.bessel")
    var = g.op("Mul", [var0, corr], name="pool.var")
    std = g.op("Sqrt", [var], name="pool.std")
    # (B, C, 1) -> (B, C): reuse pool.mean instead of reducing T twice
    mean2 = g.op("Squeeze",
                 [mean, g.tensor("pool.sqz_axes", np.asarray([2], np.int64))],
                 name="pool.mean2")
    pooled = g.op("Concat", [mean2, std], name="pool.cat", axis=1)  # (B, 2C)

    if not dec_params["emb_layers"]:
        raise NotImplementedError(
            "ONNX speaker export needs at least one embedding layer (the "
            "'embs' output port is the last embedding's pre-BN linear)")
    emb_out = pooled
    feat_in = None
    for li, lp in enumerate(dec_params["emb_layers"]):
        w = _np(lp["linear"]["w"])
        if feat_in is None:
            feat_in = w.shape[0] // 2
        lin = g.op("MatMul", [emb_out, g.tensor(f"emb{li}.weight", w)],
                   name=f"emb{li}.mm")
        lin = g.op("Add", [lin, g.tensor(f"emb{li}.bias", _np(lp["linear"]["b"]))],
                   name=f"emb{li}.addb")
        pre_bn = lin
        bn = lp["bn"]
        y = g.op("BatchNormalization",
                 [lin,
                  g.tensor(f"emb{li}.bn.gamma", _np(bn["gamma"])),
                  g.tensor(f"emb{li}.bn.beta", _np(bn["beta"])),
                  g.tensor(f"emb{li}.bn.mean", _np(bn["mean"])),
                  g.tensor(f"emb{li}.bn.var", _np(bn["var"]))],
                 # nn.BatchNorm1d default eps (speaker_decoder uses 1e-5,
                 # unlike the encoder's 1e-3)
                 name=f"emb{li}.bn", epsilon=1e-5)
        emb_out = g.op("Relu", [y], name=f"emb{li}.relu")

    wf = _np(dec_params["final"]["w"])
    if angular:
        # L2-normalize the embedding and the (normalized-at-freeze) weight
        nrm = g.op("ReduceL2", [emb_out], name="final.norm", axes=[1], keepdims=1)
        emb_n = g.op("Div", [emb_out, nrm], name="final.div")
        wf = wf / np.linalg.norm(wf, axis=0, keepdims=True)
        logits = g.op("MatMul", [emb_n, g.tensor("final.weight", _np(wf))],
                      name="final.mm")
    else:
        logits = g.op("MatMul", [emb_out, g.tensor("final.weight", wf)],
                      name="final.mm")
        logits = g.op("Add", [logits, g.tensor("final.bias",
                                               _np(dec_params["final"]["b"]))],
                      name="final.addb")
    g.rename_output(logits, "logits")
    g.rename_output(pre_bn, "embs")
    classes = wf.shape[1]
    return g.build(
        inputs=[P.value_info("encoder_output", P.FLOAT,
                             ["batch", feat_in or "feat", "time_out"])],
        outputs=[P.value_info("logits", P.FLOAT, ["batch", classes]),
                 P.value_info("embs", P.FLOAT, ["batch", "emb_dim"])],
        doc="qasr_tpu SpeakerDecoder (fp32)")


# --------------------------------------------------------------------------
# graph stitching (export_utils.attach_onnx_to_onnx, export_utils.py:192-232)
# --------------------------------------------------------------------------

def attach_onnx_to_onnx(enc_bytes: bytes, dec_bytes: bytes,
                        prefix: str = "DEC") -> bytes:
    """Stitch two exported ModelProtos: the decoder's first graph input is
    fed by the encoder's first graph output; decoder-internal names are
    prefixed to avoid collisions — the same contract as the reference's
    `attach_onnx_to_onnx` (export_utils.py:192-232)."""
    enc = P.parse_model(enc_bytes)
    dec = P.parse_model(dec_bytes)
    eg, dg = enc.graph, dec.graph
    if not eg.outputs or not dg.inputs:
        raise ValueError("stitch requires encoder outputs and decoder inputs")
    bridge = {dg.inputs[0].name: eg.outputs[0].name}

    def ren(name: str) -> str:
        if name in bridge:
            return bridge[name]
        return f"{prefix}.{name}" if name else name

    g = _GraphBuilder(f"{eg.name}+{dg.name}")
    for t in eg.initializers.items():
        g.tensor(t[0], t[1])
    for n in eg.nodes:
        g.nodes.append(P.node_proto(n.op_type, n.inputs, n.outputs,
                                    n.name, n.attrs))
    for name, arr in dg.initializers.items():
        g.tensor(ren(name), arr)
    for n in dg.nodes:
        g.nodes.append(P.node_proto(
            n.op_type, [ren(i) for i in n.inputs],
            [ren(o) for o in n.outputs], f"{prefix}.{n.name}", n.attrs))
    ins = [P.value_info(v.name, v.elem_type, v.dims) for v in eg.inputs]
    outs = [P.value_info(ren(v.name), v.elem_type, v.dims) for v in dg.outputs]
    return g.build(ins, outs, opset=max(enc.opset, dec.opset),
                   doc="qasr_tpu stitched encoder+decoder")


# --------------------------------------------------------------------------
# model-level entry (convasr_to_onnx.py parity)
# --------------------------------------------------------------------------

def export_model_onnx(model, onnx_encoder: str, onnx_decoder: str,
                      model_type: str = "asr") -> Tuple[str, str]:
    """Write encoder and decoder ONNX files for an in-memory model —
    `scripts/convasr_to_onnx.py:41-59` semantics (separate files, chosen by
    model_type in {asr, speech_label, speaker})."""
    enc = encoder_to_onnx(model.plan, model.params["encoder"])
    if model_type == "asr":
        dec = ctc_decoder_to_onnx(model.params["decoder"])
    elif model_type == "speech_label":
        dec = classification_decoder_to_onnx(model.params["decoder"],
                                             pooling=model.pooling)
    elif model_type == "speaker":
        dec = speaker_decoder_to_onnx(model.params["decoder"],
                                      pool_mode=model.pool_mode,
                                      angular=model.angular)
    else:
        raise NameError("Available model names are asr, speech_label and speaker")
    with open(onnx_encoder, "wb") as f:
        f.write(enc)
    with open(onnx_decoder, "wb") as f:
        f.write(dec)
    return onnx_encoder, onnx_decoder
