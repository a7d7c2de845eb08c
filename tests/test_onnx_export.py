"""ONNX interop tests: wire format, graph parity, stitching, CLI.

The reference's ONNX surface is `core/classes/exportable.py:43-212` +
`scripts/convasr_to_onnx.py` + `export_utils.attach_onnx_to_onnx`
(export_utils.py:192-232).  Here the exporter is in-tree
(compat/onnx_export.py); these tests validate
  (a) the protobuf wire format against protoc-generated bindings (so the
      encoding is not certified by its own reader),
  (b) numeric parity of the exported graphs vs the JAX float forward,
  (c) the stitched encoder+decoder graph,
  (d) the convasr_to_onnx-parity CLI.
"""
import os
import subprocess
import sys
import tempfile

import jax
import numpy as np
import pytest

from qasr_tpu.compat import onnx_proto as P
from qasr_tpu.compat.onnx_export import (
    attach_onnx_to_onnx,
    classification_decoder_to_onnx,
    ctc_decoder_to_onnx,
    encoder_to_onnx,
    speaker_decoder_to_onnx,
)
from qasr_tpu.compat.onnx_run import run_model
from qasr_tpu.models import jasper as J
from qasr_tpu.models.config import BlockConfig, DecoderConfig, EncoderConfig

FEAT = 16


def tiny_plan(blocks, activation="relu"):
    cfg = EncoderConfig(feat_in=FEAT, blocks=tuple(blocks), activation=activation)
    return J.build_encoder_plan(cfg)


def ruffle_bn(enc, seed=0):
    rng = np.random.default_rng(seed)
    for b in enc["blocks"]:
        for p in list(b["convs"]) + list(b["res"]):
            if "bn" in p:
                c = p["bn"]["mean"].shape[0]
                p["bn"]["mean"] = rng.normal(size=c).astype(np.float32) * 0.2
                p["bn"]["var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)
                p["bn"]["gamma"] = rng.uniform(0.5, 1.5, size=c).astype(np.float32)
                p["bn"]["beta"] = rng.normal(size=c).astype(np.float32) * 0.1
    return enc


def make_encoder(blocks, activation="relu", seed=0):
    plan = tiny_plan(blocks, activation)
    enc = J.init_encoder_params(jax.random.PRNGKey(seed), plan)
    return plan, ruffle_bn(enc, seed)


def jax_encoder_out(plan, enc, feats_btc):
    import jax.numpy as jnp
    ex = J.FloatExec(enc, activation=plan.activation)
    lens = jnp.full((feats_btc.shape[0],), feats_btc.shape[1], jnp.int32)
    out, out_lens = J.encoder_forward(ex, plan, jnp.asarray(feats_btc), lens)
    return np.asarray(out), np.asarray(out_lens)


def run_onnx_encoder(blob, feats_btc):
    out = run_model(blob, {"audio_signal": feats_btc.transpose(0, 2, 1)})
    return out["outputs"].transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# (a) wire format
# ---------------------------------------------------------------------------

# Subset of onnx/onnx.proto (public, frozen field numbers) sufficient to
# re-parse everything the exporter writes — compiled with protoc so the
# writer's bytes are validated by an independent protobuf implementation.
ONNX_PROTO_SUBSET = """
syntax = "proto2";
package qasr_onnx_check;
message AttributeProto {
  optional string name = 1;
  optional float f = 2;
  optional int64 i = 3;
  optional bytes s = 4;
  optional TensorProto t = 5;
  repeated float floats = 7;
  repeated int64 ints = 8;
  optional int32 type = 20;
}
message ValueInfoProto {
  optional string name = 1;
  optional TypeProto type = 2;
}
message NodeProto {
  repeated string input = 1;
  repeated string output = 2;
  optional string name = 3;
  optional string op_type = 4;
  repeated AttributeProto attribute = 5;
  optional string domain = 7;
}
message ModelProto {
  optional int64 ir_version = 1;
  optional string producer_name = 2;
  optional string doc_string = 6;
  optional GraphProto graph = 7;
  repeated OperatorSetIdProto opset_import = 8;
}
message GraphProto {
  repeated NodeProto node = 1;
  optional string name = 2;
  repeated TensorProto initializer = 5;
  repeated ValueInfoProto input = 11;
  repeated ValueInfoProto output = 12;
}
message TensorProto {
  repeated int64 dims = 1;
  optional int32 data_type = 2;
  optional string name = 8;
  optional bytes raw_data = 9;
}
message TensorShapeProto {
  message Dimension {
    optional int64 dim_value = 1;
    optional string dim_param = 2;
  }
  repeated Dimension dim = 1;
}
message TypeProto {
  message Tensor {
    optional int32 elem_type = 1;
    optional TensorShapeProto shape = 2;
  }
  optional Tensor tensor_type = 1;
}
message OperatorSetIdProto {
  optional string domain = 1;
  optional int64 version = 2;
}
"""


def _protoc_module(tmpdir):
    proto = os.path.join(tmpdir, "qasr_onnx_check.proto")
    with open(proto, "w") as f:
        f.write(ONNX_PROTO_SUBSET)
    r = subprocess.run(["protoc", f"--python_out={tmpdir}",
                        f"--proto_path={tmpdir}", proto],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"protoc unavailable/failed: {r.stderr[:200]}")
    sys.path.insert(0, tmpdir)
    try:
        import importlib
        return importlib.import_module("qasr_onnx_check_pb2")
    except Exception as e:  # runtime/codegen version mismatch
        pytest.skip(f"generated protobuf module unusable: {e}")
    finally:
        sys.path.remove(tmpdir)


def test_wire_format_crossvalidated_with_protoc(tmp_path):
    pb2 = _protoc_module(str(tmp_path))
    plan, enc = make_encoder([
        BlockConfig(filters=8, repeat=1, kernel=(3,), residual=False,
                    separable=False)])
    blob = encoder_to_onnx(plan, enc)
    m = pb2.ModelProto()
    m.ParseFromString(blob)  # raises on any malformed wire data
    assert m.ir_version == 7
    assert m.producer_name == "qasr_tpu"
    assert m.opset_import[0].version == 13
    g = m.graph
    assert g.input[0].name == "audio_signal"
    shape = g.input[0].type.tensor_type.shape
    assert shape.dim[0].dim_param == "batch"
    assert shape.dim[1].dim_value == FEAT
    assert g.output[0].name == "outputs"
    ops = [n.op_type for n in g.node]
    assert "Conv" in ops and "BatchNormalization" in ops and "Relu" in ops
    conv = next(n for n in g.node if n.op_type == "Conv")
    attrs = {a.name: a for a in conv.attribute}
    assert list(attrs["kernel_shape"].ints) == [3]
    assert list(attrs["pads"].ints) == [1, 1]
    # initializer raw bytes decode to the actual weights
    w = next(t for t in g.initializer if t.name.endswith("conv0.weight"))
    arr = np.frombuffer(w.raw_data, np.float32).reshape(list(w.dims))
    np.testing.assert_allclose(
        arr, np.transpose(np.asarray(enc["blocks"][0]["convs"][0]["w"]), (2, 1, 0)))


def test_reader_roundtrip_every_message_type():
    plan, enc = make_encoder([
        BlockConfig(filters=8, repeat=2, kernel=(3,), residual=True,
                    separable=True)])
    blob = encoder_to_onnx(plan, enc)
    ir = P.parse_model(blob)
    assert ir.opset == 13 and ir.ir_version == 7
    assert ir.graph.inputs[0].dims == ["batch", FEAT, "time"]
    assert any(n.op_type == "Add" for n in ir.graph.nodes)
    conv = next(n for n in ir.graph.nodes if n.op_type == "Conv")
    assert conv.attrs["strides"] == [1] and isinstance(conv.attrs["group"], int)
    name = conv.inputs[1]
    assert ir.graph.initializers[name].dtype == np.float32


# ---------------------------------------------------------------------------
# (b) graph parity vs the JAX float forward
# ---------------------------------------------------------------------------

VARIANTS = {
    "quartznet_like": dict(blocks=[
        BlockConfig(filters=24, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=24, repeat=2, kernel=(5,), residual=True,
                    separable=True),
        BlockConfig(filters=32, repeat=1, kernel=(5,), dilation=(2,),
                    residual=False, separable=False),
    ]),
    "dense_residual": dict(blocks=[
        BlockConfig(filters=16, repeat=1, kernel=(5,), residual=False),
        BlockConfig(filters=16, repeat=2, kernel=(3,), residual=True,
                    residual_dense=True),
        BlockConfig(filters=16, repeat=2, kernel=(3,), residual=True,
                    residual_dense=True),
    ]),
    "groups_shuffle": dict(blocks=[
        BlockConfig(filters=16, repeat=2, kernel=(3,), residual=True,
                    groups=4),
    ]),
    "heads": dict(blocks=[
        BlockConfig(filters=16, repeat=1, kernel=(5,), residual=False,
                    separable=True, heads=8),
    ]),
    "se_swish": dict(blocks=[
        BlockConfig(filters=16, repeat=1, kernel=(3,), residual=True,
                    se=True, se_reduction_ratio=4),
    ], activation="swish"),
    "hardtanh_max_residual": dict(blocks=[
        BlockConfig(filters=16, repeat=2, kernel=(3,), residual=True,
                    residual_mode="max"),
    ], activation="hardtanh"),
    "selu": dict(blocks=[
        BlockConfig(filters=12, repeat=1, kernel=(3,), residual=False),
    ], activation="selu"),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_encoder_onnx_matches_jax(variant):
    kw = VARIANTS[variant]
    plan, enc = make_encoder(kw["blocks"], kw.get("activation", "relu"))
    blob = encoder_to_onnx(plan, enc)
    rng = np.random.default_rng(7)
    feats = rng.normal(size=(2, 40, FEAT)).astype(np.float32)
    want, _ = jax_encoder_out(plan, enc, feats)
    got = run_onnx_encoder(blob, feats)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_encoder_onnx_dynamic_batch_and_time():
    plan, enc = make_encoder(VARIANTS["quartznet_like"]["blocks"])
    blob = encoder_to_onnx(plan, enc)
    rng = np.random.default_rng(3)
    for b, t in [(1, 33), (3, 64)]:
        feats = rng.normal(size=(b, t, FEAT)).astype(np.float32)
        want, _ = jax_encoder_out(plan, enc, feats)
        got = run_onnx_encoder(blob, feats)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_encoder_onnx_folded_bn():
    """Exporting after bn_folding produces a BN-free graph, same function."""
    plan, enc = make_encoder(VARIANTS["quartznet_like"]["blocks"])
    folded = J.fold_bn_encoder(enc)
    blob = encoder_to_onnx(plan, folded)
    assert not any(n.op_type == "BatchNormalization"
                   for n in P.parse_model(blob).graph.nodes)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(2, 40, FEAT)).astype(np.float32)
    want, _ = jax_encoder_out(plan, enc, feats)
    got = run_onnx_encoder(blob, feats)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_windowed_se_is_rejected():
    plan, enc = make_encoder([
        BlockConfig(filters=16, repeat=1, kernel=(3,), residual=False,
                    se=True, se_context_size=4)])
    with pytest.raises(NotImplementedError, match="se_context_window"):
        encoder_to_onnx(plan, enc)


def test_ctc_decoder_onnx_matches_jax():
    rng = np.random.default_rng(0)
    dec = {"w": rng.normal(size=(1, 24, 29)).astype(np.float32) * 0.1,
           "b": rng.normal(size=(29,)).astype(np.float32) * 0.1}
    blob = ctc_decoder_to_onnx(dec)
    enc_out = rng.normal(size=(2, 17, 24)).astype(np.float32)
    want = np.asarray(J.decoder_forward_float(dec, enc_out))
    got = run_model(blob, {"encoder_output": enc_out.transpose(0, 2, 1)})
    np.testing.assert_allclose(got["logprobs"], want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pooling", ["avg", "max"])
def test_classification_decoder_onnx_matches_jax(pooling):
    from qasr_tpu.models.classification import (classification_decoder,
                                                init_classification_decoder)
    import jax.numpy as jnp
    dec = init_classification_decoder(0, 24, 10)
    blob = classification_decoder_to_onnx(dec, pooling=pooling)
    rng = np.random.default_rng(1)
    enc_out = rng.normal(size=(3, 19, 24)).astype(np.float32)
    lens = jnp.full((3,), 19, jnp.int32)  # full length: masked == unmasked
    want = np.asarray(classification_decoder(dec, jnp.asarray(enc_out), lens,
                                             pooling))
    got = run_model(blob, {"encoder_output": enc_out.transpose(0, 2, 1)})
    np.testing.assert_allclose(got["logits"], want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("angular", [False, True])
def test_speaker_decoder_onnx_matches_jax(angular):
    from qasr_tpu.models.classification import (init_speaker_decoder,
                                                speaker_decoder)
    import jax.numpy as jnp
    dec = init_speaker_decoder(0, 24, 7, emb_sizes=(32, 16), angular=angular)
    blob = speaker_decoder_to_onnx(dec, angular=angular)
    rng = np.random.default_rng(2)
    enc_out = rng.normal(size=(2, 21, 24)).astype(np.float32)
    lens = jnp.full((2,), 21, jnp.int32)
    want_logits, want_emb = speaker_decoder(dec, jnp.asarray(enc_out), lens,
                                            angular=angular)
    got = run_model(blob, {"encoder_output": enc_out.transpose(0, 2, 1)})
    np.testing.assert_allclose(got["logits"], np.asarray(want_logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["embs"], np.asarray(want_emb),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# (c) stitching
# ---------------------------------------------------------------------------

def test_attach_onnx_to_onnx_stitched_graph():
    plan, enc = make_encoder(VARIANTS["quartznet_like"]["blocks"])
    rng = np.random.default_rng(0)
    dec = {"w": rng.normal(size=(1, plan.feat_out, 29)).astype(np.float32) * 0.1,
           "b": rng.normal(size=(29,)).astype(np.float32) * 0.1}
    enc_blob = encoder_to_onnx(plan, enc)
    dec_blob = ctc_decoder_to_onnx(dec)
    stitched = attach_onnx_to_onnx(enc_blob, dec_blob)

    feats = rng.normal(size=(2, 48, FEAT)).astype(np.float32)
    chained = run_model(dec_blob, {
        "encoder_output": run_model(
            enc_blob, {"audio_signal": feats.transpose(0, 2, 1)})["outputs"]})
    got = run_model(stitched, {"audio_signal": feats.transpose(0, 2, 1)})
    np.testing.assert_allclose(got["DEC.logprobs"], chained["logprobs"],
                               rtol=0, atol=0)
    ir = P.parse_model(stitched)
    assert [v.name for v in ir.graph.inputs] == ["audio_signal"]
    assert [v.name for v in ir.graph.outputs] == ["DEC.logprobs"]


# ---------------------------------------------------------------------------
# (d) CLI (convasr_to_onnx.py parity)
# ---------------------------------------------------------------------------

def test_export_onnx_cli_asr(tmp_path):
    from qasr_tpu.cli.export_onnx import main
    from qasr_tpu.models.config import ModelConfig
    from qasr_tpu.models.ctc_model import ASRModel

    blocks = VARIANTS["quartznet_like"]["blocks"]
    enc_cfg = EncoderConfig(feat_in=64, blocks=tuple(blocks))
    cfg = ModelConfig(encoder=enc_cfg,
                      decoder=DecoderConfig(feat_in=32, num_classes=28))
    model = ASRModel.from_config(cfg, seed=0)
    ckpt = str(tmp_path / "m.qasr")
    model.save_to(ckpt)

    enc_p = str(tmp_path / "enc.onnx")
    dec_p = str(tmp_path / "dec.onnx")
    st_p = str(tmp_path / "full.onnx")
    main(["--nemo_file", ckpt, "--onnx_encoder", enc_p,
          "--onnx_decoder", dec_p, "--model_type", "asr",
          "--stitched", st_p])
    for p in (enc_p, dec_p, st_p):
        assert os.path.getsize(p) > 100

    # the stitched artifact reproduces the restored model's encoder+decoder
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 52, 64)).astype(np.float32) * 0.5
    ex = J.FloatExec(model.params["encoder"], activation=model.plan.activation)
    enc_out, _ = J.encoder_forward(ex, model.plan, jnp.asarray(feats),
                                   jnp.full((1,), 52, jnp.int32))
    want = np.asarray(J.decoder_forward_float(model.params["decoder"],
                                              enc_out))
    with open(st_p, "rb") as f:
        got = run_model(f.read(), {"audio_signal": feats.transpose(0, 2, 1)})
    np.testing.assert_allclose(got["DEC.logprobs"], want, rtol=2e-4, atol=2e-5)


def test_export_onnx_cli_flag_parity():
    """Reference flags (convasr_to_onnx.py:22-38) parse identically."""
    from qasr_tpu.cli.export_onnx import get_parser
    args = get_parser().parse_args(
        ["--nemo_file", "a.nemo", "--onnx_encoder", "e.onnx",
         "--onnx_decoder", "d.onnx", "--model_type", "speaker"])
    assert (args.nemo_file, args.onnx_encoder, args.onnx_decoder,
            args.model_type) == ("a.nemo", "e.onnx", "d.onnx", "speaker")
    with pytest.raises(SystemExit):
        get_parser().parse_args(["--nemo_file", "a.nemo",
                                 "--onnx_encoder", "e", "--onnx_decoder", "d",
                                 "--model_type", "bogus"])
