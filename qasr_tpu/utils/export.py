"""Model export (deployment artifacts).

Equivalent of the reference Exportable mixin (core/classes/exportable.py:
43-212, ONNX/TorchScript): on TPU the portable deployment format is
serialized StableHLO via jax.export — hermetic, weight-embedded, reloadable
without any qasr_tpu code.  The reference's enc+dec ONNX stitching
(export_utils.attach_onnx_to_onnx, export_utils.py:192-232) is unnecessary
here: the whole pipeline is one jitted function.

For actual ONNX interop (feeding onnxruntime/TensorRT deployments like the
reference's `scripts/convasr_to_onnx.py`), see `compat/onnx_export.py` —
an in-tree ModelProto writer (no `onnx` package) exporting the fp32
ConvASR graphs, plus the stitcher and a numpy validator.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
from jax import export as jax_export


def export_fn(fn: Callable, example_args: Sequence[Any],
              platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Serialize a jittable function (weights closed over) to StableHLO."""
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        *[jax.ShapeDtypeStruct(jax.numpy.shape(a), a.dtype) for a in example_args])
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize; returns an object whose .call(*args) runs the model."""
    return jax_export.deserialize(blob)


def export_frozen_ctc(model, batch: int, num_samples: int, path: str) -> str:
    """Export the frozen integer CTC pipeline (mel -> int8 encoder ->
    decoder -> greedy ids) for the given static shape."""
    import jax.numpy as jnp

    from qasr_tpu.models.jasper import encoder_forward
    from qasr_tpu.quantize.freeze import FrozenExec

    tables = model.freeze()
    frontend, plan, qcfg = model.frontend, model.plan, model.qcfg

    def fn(audio, lengths):
        feats, feat_lens = frontend(audio, lengths, dither=0.0)
        fx = FrozenExec(tables, qcfg, activation=plan.activation)
        enc, enc_lens = encoder_forward(fx, plan, feats, feat_lens)
        return jnp.argmax(fx.decoder(enc), axis=-1), enc_lens

    audio = jnp.zeros((batch, num_samples), jnp.float32)
    lens = jnp.zeros((batch,), jnp.int32)
    blob = export_fn(fn, (audio, lens))
    with open(path, "wb") as f:
        f.write(blob)
    return path


def export_frozen_conformer_ctc(model, batch: int, num_samples: int,
                                path: str) -> str:
    """Export the frozen integer-only Conformer-CTC pipeline (mel ->
    integer encoder -> CTC head -> greedy ids) for a static shape — the
    Conformer counterpart of export_frozen_ctc."""
    import jax.numpy as jnp

    from qasr_tpu.quantize.conformer_freeze import frozen_conformer_apply

    if model.decoder_kind != "linear":
        raise NotImplementedError("frozen export supports the linear CTC "
                                  "head (the LSTM head is float/recurrent)")
    if model.enc_frozen is None:
        model.freeze()
    tables, ccfg = model.enc_frozen, model.ccfg
    frontend = model.frontend
    params = model.params

    def fn(audio, lengths):
        feats, feat_lens = frontend(audio, lengths, dither=0.0)
        enc, enc_lens = frozen_conformer_apply(tables, ccfg, feats, feat_lens)
        # the SAME head the serving forward applies (int8 dec_in when
        # calibrated) — the artifact must reproduce model.forward exactly
        log_probs = model._head(params, enc)
        return jnp.argmax(log_probs, axis=-1), enc_lens

    audio = jnp.zeros((batch, num_samples), jnp.float32)
    lens = jnp.zeros((batch,), jnp.int32)
    # force the portable XLA composition during the export trace: the fused
    # Pallas epilogues (QASR_CONF_FUSED=1) and the fused integer attention
    # (QASR_CONF_ATT, default ON on TPU) lower to TPU-only custom-calls,
    # which a hermetic StableHLO artifact must not embed (bit-identical
    # numerics either way, test_gemm_fused.py / test_int_attention.py)
    import os

    prev = {k: os.environ.get(k) for k in ("QASR_CONF_FUSED",
                                           "QASR_CONF_ATT")}
    os.environ["QASR_CONF_FUSED"] = "0"
    os.environ["QASR_CONF_ATT"] = "0"
    try:
        blob = export_fn(fn, (audio, lens))
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    with open(path, "wb") as f:
        f.write(blob)
    return path
