"""ONNX protobuf wire format — writer and reader, no `onnx` dependency.

The reference exports deployment artifacts as ONNX through torch.onnx
(`/root/reference/nemo/core/classes/exportable.py:43-212`,
`/root/reference/scripts/convasr_to_onnx.py:1-60`).  This image has neither
the `onnx` package nor an exporter that works without it, so this module
implements the subset of the ONNX protobuf schema (onnx/onnx.proto, IR
version 7 / opset 13) the ConvASR model family needs, directly at the
protobuf wire level:

  * a writer producing standard `ModelProto` bytes any ONNX runtime loads;
  * a reader parsing those bytes back into a small typed IR (used by the
    in-tree numpy evaluator `onnx_run.py` to validate round trips, and by
    the stitcher `onnx_export.attach_onnx_to_onnx`).

Wire-format rules implemented: varint (wire 0), 64-bit (wire 1), length-
delimited (wire 2), 32-bit (wire 5); repeated scalar fields are emitted
unpacked and parsed in either packed or unpacked form, as proto2 parsers
must.  Tests cross-validate the writer against `protoc`-generated bindings
(tests/test_onnx_export.py) so the encoding is not self-certified.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

# --------------------------------------------------------------------------
# TensorProto.DataType (onnx.proto)
# --------------------------------------------------------------------------
FLOAT, UINT8, INT8, UINT16, INT16, INT32, INT64 = 1, 2, 3, 4, 5, 6, 7
STRING, BOOL, FLOAT16, DOUBLE = 8, 9, 10, 11

_NP_TO_ONNX = {
    np.dtype(np.float32): FLOAT,
    np.dtype(np.uint8): UINT8,
    np.dtype(np.int8): INT8,
    np.dtype(np.int16): INT16,
    np.dtype(np.int32): INT32,
    np.dtype(np.int64): INT64,
    np.dtype(np.bool_): BOOL,
    np.dtype(np.float64): DOUBLE,
}
_ONNX_TO_NP = {v: k for k, v in _NP_TO_ONNX.items()}

# AttributeProto.AttributeType
_ATTR_FLOAT, _ATTR_INT, _ATTR_STRING, _ATTR_TENSOR = 1, 2, 3, 4
_ATTR_FLOATS, _ATTR_INTS, _ATTR_STRINGS = 6, 7, 8


# --------------------------------------------------------------------------
# low-level encoding
# --------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    """Unsigned LEB128."""
    if n < 0:  # int64 two's complement, always 10 bytes
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(fieldno: int, wire: int) -> bytes:
    return _varint((fieldno << 3) | wire)


def _fv(fieldno: int, value: int) -> bytes:
    """varint-typed field."""
    return _key(fieldno, 0) + _varint(value)


def _fs(fieldno: int, value: Union[str, bytes]) -> bytes:
    """length-delimited field (string / bytes / submessage)."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    return _key(fieldno, 2) + _varint(len(value)) + value


def _ff32(fieldno: int, value: float) -> bytes:
    return _key(fieldno, 5) + struct.pack("<f", value)


# --------------------------------------------------------------------------
# message writers
# --------------------------------------------------------------------------

def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    """TensorProto: dims=1, data_type=2, name=8, raw_data=9 (little-endian)."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in _NP_TO_ONNX:
        raise TypeError(f"unsupported tensor dtype {arr.dtype}")
    out = b"".join(_fv(1, int(d)) for d in arr.shape)
    out += _fv(2, _NP_TO_ONNX[arr.dtype])
    out += _fs(8, name)
    out += _fs(9, arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes())
    return out


def _dim(d: Union[int, str]) -> bytes:
    # TensorShapeProto.Dimension: dim_value=1 / dim_param=2
    return _fv(1, int(d)) if isinstance(d, (int, np.integer)) else _fs(2, d)


def value_info(name: str, elem_type: int, dims: Sequence[Union[int, str]]) -> bytes:
    """ValueInfoProto{name=1, type=2}; TypeProto.tensor_type=1;
    Tensor{elem_type=1, shape=2}; TensorShapeProto.dim=1."""
    shape = b"".join(_fs(1, _dim(d)) for d in dims)
    tensor = _fv(1, elem_type) + _fs(2, shape)
    return _fs(1, name) + _fs(2, _fs(1, tensor))


def _attribute(name: str, value: Any) -> bytes:
    """AttributeProto{name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20}."""
    out = _fs(1, name)
    if isinstance(value, bool):
        out += _fv(3, int(value)) + _fv(20, _ATTR_INT)
    elif isinstance(value, (int, np.integer)):
        out += _fv(3, int(value)) + _fv(20, _ATTR_INT)
    elif isinstance(value, float):
        out += _ff32(2, value) + _fv(20, _ATTR_FLOAT)
    elif isinstance(value, str):
        out += _fs(4, value) + _fv(20, _ATTR_STRING)
    elif isinstance(value, bytes):
        out += _fs(4, value) + _fv(20, _ATTR_STRING)
    elif isinstance(value, np.ndarray):
        out += _fs(5, tensor_proto(name + "_value", value)) + _fv(20, _ATTR_TENSOR)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            out += b"".join(_fv(8, int(v)) for v in value) + _fv(20, _ATTR_INTS)
        elif all(isinstance(v, (float, int, np.floating)) for v in value):
            out += b"".join(_ff32(7, float(v)) for v in value) + _fv(20, _ATTR_FLOATS)
        else:
            raise TypeError(f"mixed attribute list for {name}: {value!r}")
    else:
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return out


def node_proto(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
               name: str = "", attrs: Optional[Dict[str, Any]] = None) -> bytes:
    """NodeProto{input=1, output=2, name=3, op_type=4, attribute=5}."""
    out = b"".join(_fs(1, i) for i in inputs)
    out += b"".join(_fs(2, o) for o in outputs)
    if name:
        out += _fs(3, name)
    out += _fs(4, op_type)
    for k in sorted(attrs or {}):
        out += _fs(5, _attribute(k, attrs[k]))
    return out


def graph_proto(name: str, nodes: Sequence[bytes],
                inputs: Sequence[bytes], outputs: Sequence[bytes],
                initializers: Sequence[bytes]) -> bytes:
    """GraphProto{node=1, name=2, initializer=5, input=11, output=12}."""
    out = b"".join(_fs(1, n) for n in nodes)
    out += _fs(2, name)
    out += b"".join(_fs(5, t) for t in initializers)
    out += b"".join(_fs(11, i) for i in inputs)
    out += b"".join(_fs(12, o) for o in outputs)
    return out


def model_proto(graph: bytes, opset: int = 13, ir_version: int = 7,
                producer: str = "qasr_tpu", doc: str = "") -> bytes:
    """ModelProto{ir_version=1, producer_name=2, doc_string=6, graph=7,
    opset_import=8}; OperatorSetIdProto{domain=1, version=2}."""
    out = _fv(1, ir_version)
    out += _fs(2, producer)
    if doc:
        out += _fs(6, doc)
    out += _fs(7, graph)
    out += _fs(8, _fs(1, "") + _fv(2, opset))
    return out


# --------------------------------------------------------------------------
# reader: generic wire parse -> typed IR
# --------------------------------------------------------------------------

def _parse_fields(buf: bytes) -> Dict[int, List[Tuple[int, Any]]]:
    """Parse one message into {fieldno: [(wire, raw_value), ...]}."""
    fields: Dict[int, List[Tuple[int, Any]]] = {}
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fieldno, wire = tag >> 3, tag & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            value: Any = v
        elif wire == 1:
            value = buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            value = buf[i:i + ln]
            i += ln
        elif wire == 5:
            value = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire} (field {fieldno})")
        fields.setdefault(fieldno, []).append((wire, value))
    return fields


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _ints(fields, no) -> List[int]:
    """Repeated varint field, accepting packed and unpacked encodings."""
    out: List[int] = []
    for wire, v in fields.get(no, []):
        if wire == 0:
            out.append(_signed(v))
        else:  # packed
            i = 0
            while i < len(v):
                x = 0
                shift = 0
                while True:
                    b = v[i]
                    i += 1
                    x |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                out.append(_signed(x))
    return out


def _floats(fields, no) -> List[float]:
    out: List[float] = []
    for wire, v in fields.get(no, []):
        if wire == 5:
            out.append(struct.unpack("<f", v)[0])
        else:  # packed
            out.extend(struct.unpack(f"<{len(v) // 4}f", v))
    return out


def _int(fields, no, default=0) -> int:
    vals = _ints(fields, no)
    return vals[-1] if vals else default


def _str(fields, no, default="") -> str:
    vals = fields.get(no, [])
    return vals[-1][1].decode("utf-8") if vals else default


def _bytes_list(fields, no) -> List[bytes]:
    return [v for _, v in fields.get(no, [])]


@dataclass
class TensorIR:
    name: str
    array: np.ndarray


@dataclass
class NodeIR:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    attrs: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ValueInfoIR:
    name: str
    elem_type: int
    dims: List[Union[int, str]]


@dataclass
class GraphIR:
    name: str
    nodes: List[NodeIR]
    inputs: List[ValueInfoIR]
    outputs: List[ValueInfoIR]
    initializers: Dict[str, np.ndarray]


@dataclass
class ModelIR:
    ir_version: int
    opset: int
    producer: str
    graph: GraphIR


def parse_tensor(buf: bytes) -> TensorIR:
    f = _parse_fields(buf)
    dims = _ints(f, 1)
    dtype_id = _int(f, 2)
    name = _str(f, 8)
    raw = _bytes_list(f, 9)
    if dtype_id not in _ONNX_TO_NP:
        raise ValueError(f"tensor {name}: unsupported data_type {dtype_id}")
    np_dtype = _ONNX_TO_NP[dtype_id]
    if raw:
        arr = np.frombuffer(raw[-1], dtype=np_dtype.newbyteorder("<")).astype(np_dtype)
    elif dtype_id == FLOAT:
        arr = np.asarray(_floats(f, 4), dtype=np.float32)
    elif dtype_id == INT64:
        arr = np.asarray(_ints(f, 7), dtype=np.int64)
    elif dtype_id in (INT32, INT8, UINT8, INT16, BOOL):
        arr = np.asarray(_ints(f, 5), dtype=np_dtype)
    else:
        raise ValueError(f"tensor {name}: no data")
    return TensorIR(name, arr.reshape(dims))


def _parse_attr(buf: bytes) -> Tuple[str, Any]:
    f = _parse_fields(buf)
    name = _str(f, 1)
    atype = _int(f, 20)
    if atype == _ATTR_INT:
        return name, _int(f, 3)
    if atype == _ATTR_FLOAT:
        return name, _floats(f, 2)[-1]
    if atype == _ATTR_STRING:
        return name, _str(f, 4)
    if atype == _ATTR_TENSOR:
        return name, parse_tensor(_bytes_list(f, 5)[-1]).array
    if atype == _ATTR_INTS:
        return name, _ints(f, 8)
    if atype == _ATTR_FLOATS:
        return name, _floats(f, 7)
    raise ValueError(f"attribute {name}: unsupported type {atype}")


def parse_value_info(buf: bytes) -> ValueInfoIR:
    f = _parse_fields(buf)
    name = _str(f, 1)
    elem_type, dims = 0, []
    tp = _bytes_list(f, 2)
    if tp:
        tt = _bytes_list(_parse_fields(tp[-1]), 1)  # tensor_type
        if tt:
            tf = _parse_fields(tt[-1])
            elem_type = _int(tf, 1)
            shp = _bytes_list(tf, 2)
            if shp:
                for db in _bytes_list(_parse_fields(shp[-1]), 1):
                    df = _parse_fields(db)
                    dims.append(_str(df, 2) if 2 in df else _int(df, 1))
    return ValueInfoIR(name, elem_type, dims)


def parse_node(buf: bytes) -> NodeIR:
    f = _parse_fields(buf)
    attrs = dict(_parse_attr(a) for a in _bytes_list(f, 5))
    return NodeIR(op_type=_str(f, 4),
                  inputs=[b.decode() for b in _bytes_list(f, 1)],
                  outputs=[b.decode() for b in _bytes_list(f, 2)],
                  name=_str(f, 3), attrs=attrs)


def parse_graph(buf: bytes) -> GraphIR:
    f = _parse_fields(buf)
    inits = [parse_tensor(t) for t in _bytes_list(f, 5)]
    return GraphIR(name=_str(f, 2),
                   nodes=[parse_node(n) for n in _bytes_list(f, 1)],
                   inputs=[parse_value_info(v) for v in _bytes_list(f, 11)],
                   outputs=[parse_value_info(v) for v in _bytes_list(f, 12)],
                   initializers={t.name: t.array for t in inits})


def parse_model(buf: bytes) -> ModelIR:
    f = _parse_fields(buf)
    opset = 0
    for op in _bytes_list(f, 8):
        of = _parse_fields(op)
        if _str(of, 1) == "":  # default ONNX domain
            opset = _int(of, 2)
    graphs = _bytes_list(f, 7)
    if not graphs:
        raise ValueError("ModelProto has no graph")
    return ModelIR(ir_version=_int(f, 1), opset=opset,
                   producer=_str(f, 2), graph=parse_graph(graphs[-1]))
