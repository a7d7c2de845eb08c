"""Minimal numpy evaluator for the ONNX graphs this package exports.

Validation backend for `compat/onnx_export.py` (this image has no `onnx` /
`onnxruntime`): parses a ModelProto with `compat/onnx_proto.py` and executes
it node-by-node with numpy, implementing exactly the opset-13 operator
subset the exporters emit.  Used by tests to prove exported artifacts
reproduce the JAX forward, and usable as a tiny host-side reference runtime.

The reference validates its exports by round-tripping through onnxruntime
(`core/classes/exportable.py:170-205` `check_trace`); this module plays that
role here.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from qasr_tpu.compat.onnx_proto import _ONNX_TO_NP, ModelIR, NodeIR, parse_model


def _conv1d(x, w, b, group, pads, stride, dilation):
    B, C, _ = x.shape
    M, Cg, K = w.shape
    x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[1])))
    Tp = x.shape[2]
    To = (Tp - dilation * (K - 1) - 1) // stride + 1
    hi = (To - 1) * stride + 1
    y = np.zeros((B, M, To), np.float32)
    if group == C and M == C and Cg == 1:  # depthwise
        for k in range(K):
            y += w[None, :, 0, k, None] * x[:, :, k * dilation:k * dilation + hi:stride]
    else:
        gm = M // group
        for gi in range(group):
            xg = x[:, gi * Cg:(gi + 1) * Cg]
            wg = w[gi * gm:(gi + 1) * gm]
            for k in range(K):
                seg = xg[:, :, k * dilation:k * dilation + hi:stride]
                y[:, gi * gm:(gi + 1) * gm] += np.einsum(
                    "bct,mc->bmt", seg, wg[:, :, k], dtype=np.float32)
    if b is not None:
        y = y + b[None, :, None]
    return y.astype(np.float32)


def _reduce(fn, x, axes, keepdims):
    return fn(x, axis=tuple(axes), keepdims=bool(keepdims))


def _reshape(x, shape):
    out = []
    for i, d in enumerate(shape):
        out.append(x.shape[i] if d == 0 else int(d))
    return x.reshape(out)


def _log_softmax(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    e = x - m
    return (e - np.log(np.sum(np.exp(e), axis=axis, keepdims=True))).astype(x.dtype)


def run_model(model: Union[bytes, ModelIR],
              feeds: Dict[str, np.ndarray],
              outputs: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
    """Execute a ModelProto; returns {output_name: array}."""
    ir = parse_model(model) if isinstance(model, (bytes, bytearray)) else model
    g = ir.graph
    env: Dict[str, np.ndarray] = dict(g.initializers)
    for vi in g.inputs:
        if vi.name not in feeds:
            raise KeyError(f"missing graph input {vi.name!r}")
    env.update({k: np.asarray(v) for k, v in feeds.items()})

    for n in g.nodes:
        env.update(_eval_node(n, env))

    names = list(outputs) if outputs else [v.name for v in g.outputs]
    return {name: env[name] for name in names}


def _eval_node(n: NodeIR, env: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    a = n.attrs
    ins = [env[i] for i in n.inputs if i]
    op = n.op_type

    if op == "Conv":
        x, w = ins[0], ins[1]
        b = ins[2] if len(ins) > 2 else None
        if x.ndim != 3:
            raise NotImplementedError("evaluator supports 1D Conv only")
        y = _conv1d(x, w, b, a.get("group", 1), a.get("pads", [0, 0]),
                    a.get("strides", [1])[0], a.get("dilations", [1])[0])
    elif op == "BatchNormalization":
        x, gamma, beta, mean, var = ins
        eps = a.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        y = ((x - mean.reshape(shape)) / np.sqrt(var.reshape(shape) + eps)
             * gamma.reshape(shape) + beta.reshape(shape)).astype(np.float32)
    elif op == "Relu":
        y = np.maximum(ins[0], 0)
    elif op == "Clip":
        lo = ins[1] if len(ins) > 1 else -np.inf
        hi = ins[2] if len(ins) > 2 else np.inf
        y = np.clip(ins[0], lo, hi)
    elif op == "Selu":
        alpha, gamma = a["alpha"], a["gamma"]
        x = ins[0]
        y = (gamma * np.where(x > 0, x, alpha * np.expm1(x))).astype(np.float32)
    elif op == "Sigmoid":
        y = (1.0 / (1.0 + np.exp(-ins[0]))).astype(np.float32)
    elif op == "Mul":
        y = ins[0] * ins[1]
    elif op == "Add":
        y = ins[0] + ins[1]
    elif op == "Sub":
        y = ins[0] - ins[1]
    elif op == "Div":
        y = ins[0] / ins[1]
    elif op == "Max":
        y = np.maximum(ins[0], ins[1])
    elif op == "MatMul":
        y = np.matmul(ins[0], ins[1]).astype(np.float32)
    elif op == "Sqrt":
        y = np.sqrt(ins[0])
    elif op == "Reshape":
        y = _reshape(ins[0], [int(v) for v in ins[1]])
    elif op == "Squeeze":  # opset 13: axes is the second INPUT
        y = np.squeeze(ins[0], axis=tuple(int(v) for v in ins[1]))
    elif op == "Transpose":
        y = np.transpose(ins[0], a["perm"])
    elif op == "ReduceMean":
        y = _reduce(np.mean, ins[0], a["axes"], a.get("keepdims", 1))
        y = y.astype(np.float32)
    elif op == "ReduceMax":
        y = _reduce(np.max, ins[0], a["axes"], a.get("keepdims", 1))
    elif op == "ReduceL2":
        y = np.sqrt(_reduce(np.sum, np.square(ins[0]), a["axes"],
                            a.get("keepdims", 1))).astype(np.float32)
    elif op == "Concat":
        y = np.concatenate(ins, axis=a["axis"])
    elif op == "LogSoftmax":
        y = _log_softmax(ins[0], a["axis"])
    elif op == "Shape":
        y = np.asarray(ins[0].shape, np.int64)
    elif op == "Gather":
        y = np.take(ins[0], ins[1], axis=a.get("axis", 0))
    elif op == "Cast":
        y = ins[0].astype(_ONNX_TO_NP[a["to"]])
    elif op == "Identity":
        y = ins[0]
    else:
        raise NotImplementedError(f"op {op} (node {n.name})")
    return {n.outputs[0]: y}
