"""QASR-TPU: integer-only zero-shot quantized ASR, TPU-native.

Public API (lazy imports to keep `import qasr_tpu` light)::

    from qasr_tpu import ASRModel, QuantConfig
    model = ASRModel.from_pretrained("QuartzNet15x5Base-En")  # or *.nemo
    model.set_quant_bit(6, "weight"); model.set_quant_bit(6, "act")
    model.bn_folding(); model.calibrate(batches)
    log_probs, lens, greedy = model.forward(audio, audio_lens)
"""
__version__ = "0.1.0"

_LAZY = {
    "ASRModel": "qasr_tpu.models.ctc_model",
    "EncDecCTCModelBPE": "qasr_tpu.models.ctc_bpe_model",
    "RNNTModel": "qasr_tpu.models.rnnt_model",
    "EncDecClassificationModel": "qasr_tpu.models.classification",
    "EncDecSpeakerLabelModel": "qasr_tpu.models.classification",
    "ModelConfig": "qasr_tpu.models.config",
    "QuantConfig": "qasr_tpu.models.config",
    "QTensor": "qasr_tpu.ops.quant_prims",
    "MelFrontend": "qasr_tpu.ops.features",
    "FeatureConfig": "qasr_tpu.ops.features",
    "Trainer": "qasr_tpu.train.trainer",
    "TrainConfig": "qasr_tpu.train.trainer",
    "WER": "qasr_tpu.decode.ctc",
    "word_error_rate": "qasr_tpu.decode.ctc",
    "BeamSearchDecoderWithLM": "qasr_tpu.decode.beam_search",
    "StreamingTranscriber": "qasr_tpu.decode.streaming",
    "get_synthetic_data": "qasr_tpu.quantize.synth",
    "make_mesh": "qasr_tpu.parallel.mesh",
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'qasr_tpu' has no attribute {name!r}")
