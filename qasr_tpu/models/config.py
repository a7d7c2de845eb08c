"""Model configuration schemas.

Dataclass mirrors of the reference's YAML schema so the *same* model YAMLs
(e.g. /root/reference/examples/asr/conf/quartznet_15x5.yaml) load directly:
  - BlockConfig      <- JasperEncoderConfig  (conv_asr.py:492-513)
  - EncoderConfig    <- ConvASREncoderConfig (conv_asr.py:516-527)
  - DecoderConfig    <- ConvASRDecoderConfig (conv_asr.py:530-536)
plus the quantization knobs Q-ASR threads through them
(quant_mode/quant_bit, conv_asr.py:122-123,247).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

DEFAULT_LABELS = [
    " ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z", "'",
]


@dataclass(frozen=True)
class BlockConfig:
    filters: int
    repeat: int = 3
    kernel: Tuple[int, ...] = (11,)
    stride: Tuple[int, ...] = (1,)
    dilation: Tuple[int, ...] = (1,)
    dropout: float = 0.0
    residual: bool = True
    groups: int = 1
    separable: bool = False
    heads: int = -1
    residual_mode: str = "add"
    residual_dense: bool = False
    se: bool = False
    se_reduction_ratio: int = 8
    se_context_size: int = -1
    se_interpolation_mode: str = "nearest"
    kernel_size_factor: float = 1.0
    stride_last: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "BlockConfig":
        d = dict(d)
        d.pop("se_context_window", None)
        for k in ("kernel", "stride", "dilation"):
            if k in d:
                v = d[k]
                d[k] = tuple(v) if isinstance(v, (list, tuple)) else (v,)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class EncoderConfig:
    feat_in: int
    blocks: Tuple[BlockConfig, ...]
    activation: str = "relu"
    normalization_mode: str = "batch"
    residual_mode: str = "add"
    norm_groups: int = -1
    conv_mask: bool = True
    frame_splicing: int = 1
    init_mode: str = "xavier_uniform"
    quant_mode: str = "symmetric"
    quant_bit: int = 8

    @classmethod
    def from_dict(cls, d: dict) -> "EncoderConfig":
        d = dict(d)
        d.pop("_target_", None)
        blocks = tuple(BlockConfig.from_dict(b) for b in d.pop("jasper"))
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(blocks=blocks, **{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class DecoderConfig:
    feat_in: int
    num_classes: int
    vocabulary: Tuple[str, ...] = tuple(DEFAULT_LABELS)
    init_mode: str = "xavier_uniform"
    quant_mode: str = "symmetric"
    quant_bit: int = 8

    @classmethod
    def from_dict(cls, d: dict) -> "DecoderConfig":
        d = dict(d)
        d.pop("_target_", None)
        if d.get("vocabulary"):
            d["vocabulary"] = tuple(d["vocabulary"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class QuantConfig:
    """Runtime quantization knobs (Q-ASR CLI flags, inference.py:56-64)."""

    mode: str = "symmetric"       # 'none' | 'symmetric'
    weight_bit: int = 8
    act_bit: int = 8
    bias_bit: int = 32
    percentile: Optional[float] = None
    dynamic: bool = False
    act_momentum: float = 0.95    # QuantAct act_range_momentum (quant_modules.py:41)
    # calibration requants: False = f32-multiplier approximation (<=2^-24
    # relative; ~10x smaller graph to compile — ranges are all calibration
    # produces).  True = exact two-limb dyadic arithmetic on the in-graph
    # f32-frexp mantissas.  NB neither reproduces the reference's
    # calibration bit-for-bit: its mantissas are host 31-bit Decimal
    # (quant_utils.py:121-147) while in-graph mantissas are f32 (24-bit), so
    # deep-stack EMA ranges drift O(1e-3) either way — quantified in
    # tests/test_reference_model_parity.py; the deployed frozen path uses
    # host Decimal mantissas and is reference-exact.
    calib_exact: bool = False


def resolve_interpolations(raw):
    """Minimal OmegaConf-style '${a.b.c}' interpolation resolution so the
    reference's YAMLs (e.g. matchboxnet's ${model.repeat}) load verbatim."""
    import re

    pattern = re.compile(r"^\$\{([\w.]+)\}$")

    def lookup(path):
        node = raw
        for k in path.split("."):
            node = node[k]
        return node

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str):
            m = pattern.match(node)
            if m:
                try:
                    return walk(lookup(m.group(1)))
                except (KeyError, TypeError):
                    return node
        return node

    return walk(raw)


def preprocessor_config_from_dict(d: dict):
    """Map NeMo AudioToMelSpectrogramPreprocessor YAML keys to FeatureConfig."""
    from qasr_tpu.ops.features import FeatureConfig

    d = dict(d)
    d.pop("_target_", None)
    mapping = {"features": "features", "sample_rate": "sample_rate",
               "window_size": "window_size", "window_stride": "window_stride",
               "window": "window", "normalize": "normalize", "n_fft": "n_fft",
               "preemph": "preemph", "dither": "dither", "pad_to": "pad_to",
               "pad_value": "pad_value", "mag_power": "mag_power",
               "lowfreq": "lowfreq", "highfreq": "highfreq",
               "log": "log", "frame_splicing": "frame_splicing",
               "max_duration": "max_duration",
               "log_zero_guard_type": "log_zero_guard_type",
               "log_zero_guard_value": "log_zero_guard_value"}
    kwargs = {tgt: d[src] for src, tgt in mapping.items() if src in d and d[src] is not None}
    return FeatureConfig(**kwargs)


@dataclass(frozen=True)
class ModelConfig:
    encoder: EncoderConfig
    decoder: DecoderConfig
    preprocessor: dict = field(default_factory=dict)
    spec_augment: Optional[dict] = None
    labels: Tuple[str, ...] = tuple(DEFAULT_LABELS)
    sample_rate: int = 16000
    # tokenizer section for BPE models ({'type': 'bpe', 'model_path': ...});
    # model_path may name a packed artifact resolved at restore time
    # (modelPT.py:254-296 artifact registry equivalent)
    tokenizer: Optional[dict] = None

    @classmethod
    def from_yaml(cls, path: str) -> "ModelConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f)
        raw = resolve_interpolations(raw)
        return cls.from_dict(raw["model"] if "model" in raw else raw)

    @classmethod
    def from_dict(cls, m: dict) -> "ModelConfig":
        labels = tuple(m.get("labels", DEFAULT_LABELS))
        enc = EncoderConfig.from_dict(m["encoder"])
        dec_d = dict(m["decoder"])
        # blocks may be empty for non-Jasper encoders (e.g. the Conformer
        # transducer stores its encoder in meta and leaves blocks=()); the
        # decoder feat_in default only exists when there is a block stack
        if not dec_d.get("feat_in") and enc.blocks:
            dec_d["feat_in"] = enc.blocks[-1].filters
        dec_d.setdefault("num_classes", len(labels))
        if not dec_d.get("vocabulary"):
            dec_d["vocabulary"] = labels
        dec = DecoderConfig.from_dict(dec_d)
        return cls(
            encoder=enc,
            decoder=dec,
            preprocessor=m.get("preprocessor", {}),
            spec_augment=m.get("spec_augment"),
            labels=labels,
            sample_rate=m.get("sample_rate", 16000),
            tokenizer=m.get("tokenizer"),
        )


# ---------------------------------------------------------------------------
# Presets (model cards in reference ctc_models.py:47-89)
# ---------------------------------------------------------------------------


def _qn_block(filters, kernel, repeat, residual, stride=1, separable=True, **kw):
    return BlockConfig(filters=filters, kernel=(kernel,), repeat=repeat,
                       residual=residual, stride=(stride,), separable=separable,
                       dropout=kw.pop("dropout", 0.0), **kw)


def quartznet15x5() -> ModelConfig:
    """QuartzNet15x5 (conf/quartznet_15x5.yaml)."""
    ks = [33, 33, 33, 33, 39, 39, 39, 51, 51, 51, 63, 63, 63, 75, 75, 75]
    blocks = [_qn_block(256, 33, 1, False, stride=2)]
    for i, k in enumerate(ks[1:7], start=1):
        blocks.append(_qn_block(256, k, 5, True))
    for k in ks[7:]:
        blocks.append(_qn_block(512, k, 5, True))
    blocks.append(_qn_block(512, 87, 1, False, dilation=(2,)))
    blocks.append(_qn_block(1024, 1, 1, False, separable=False))
    enc = EncoderConfig(feat_in=64, blocks=tuple(blocks), activation="relu")
    dec = DecoderConfig(feat_in=1024, num_classes=len(DEFAULT_LABELS))
    return ModelConfig(encoder=enc, decoder=dec,
                       preprocessor={"features": 64, "n_fft": 512, "dither": 1e-5})


def quartznet5x5() -> ModelConfig:
    """QuartzNet5x5LS (model card ctc_models.py:62-73): one block per kernel group."""
    blocks = [_qn_block(256, 33, 1, False, stride=2)]
    for k, f in [(33, 256), (39, 256), (51, 512), (63, 512), (75, 512)]:
        blocks.append(_qn_block(f, k, 5, True))
    blocks.append(_qn_block(512, 87, 1, False, dilation=(2,)))
    blocks.append(_qn_block(1024, 1, 1, False, separable=False))
    enc = EncoderConfig(feat_in=64, blocks=tuple(blocks), activation="relu")
    dec = DecoderConfig(feat_in=1024, num_classes=len(DEFAULT_LABELS))
    return ModelConfig(encoder=enc, decoder=dec,
                       preprocessor={"features": 64, "n_fft": 512, "dither": 1e-5})


def jasper10x5dr() -> ModelConfig:
    """Jasper10x5Dr (conf/jasper_10x5dr.yaml): dense residual, non-separable."""
    spec = [
        (256, 11, 1, False, 0.2, 2, 1, False),
        (256, 11, 5, True, 0.2, 1, 1, True), (256, 11, 5, True, 0.2, 1, 1, True),
        (384, 13, 5, True, 0.2, 1, 1, True), (384, 13, 5, True, 0.2, 1, 1, True),
        (512, 17, 5, True, 0.2, 1, 1, True), (512, 17, 5, True, 0.2, 1, 1, True),
        (640, 21, 5, True, 0.3, 1, 1, True), (640, 21, 5, True, 0.3, 1, 1, True),
        (768, 25, 5, True, 0.3, 1, 1, True), (768, 25, 5, True, 0.3, 1, 1, True),
        (896, 29, 1, False, 0.4, 1, 2, False),
        (1024, 1, 1, False, 0.4, 1, 1, False),
    ]
    blocks = tuple(
        BlockConfig(filters=f, kernel=(k,), repeat=r, residual=res, dropout=dr,
                    stride=(s,), dilation=(d,), separable=False, residual_dense=dense)
        for f, k, r, res, dr, s, d, dense in spec
    )
    enc = EncoderConfig(feat_in=64, blocks=blocks, activation="relu")
    dec = DecoderConfig(feat_in=1024, num_classes=len(DEFAULT_LABELS))
    return ModelConfig(encoder=enc, decoder=dec,
                       preprocessor={"features": 64, "n_fft": 512, "dither": 1e-5})


def matchboxnet3x1x64() -> ModelConfig:
    """MatchboxNet 3x1x64 (conf/matchboxnet_3x1x64_v1.yaml): MFCC frontend,
    six separable blocks, classification head (use with
    EncDecClassificationModel)."""
    blocks = (
        _qn_block(128, 11, 1, False),
        _qn_block(64, 13, 1, True), _qn_block(64, 15, 1, True),
        _qn_block(64, 17, 1, True),
        _qn_block(128, 29, 1, False, dilation=(2,)),
        _qn_block(128, 1, 1, False, separable=False),
    )
    enc = EncoderConfig(feat_in=64, blocks=blocks, activation="relu")
    dec = DecoderConfig(feat_in=128, num_classes=30)
    return ModelConfig(encoder=enc, decoder=dec,
                       preprocessor={"features": 64, "n_fft": 512,
                                     "window_size": 0.025, "dither": 1e-5})


PRESETS = {
    "QuartzNet15x5Base-En": quartznet15x5,
    "QuartzNet15x5NR-En": quartznet15x5,
    "QuartzNet15x5": quartznet15x5,
    "QuartzNet5x5LS-En": quartznet5x5,
    "Jasper10x5Dr-En": jasper10x5dr,
    "Jasper10x5Dr": jasper10x5dr,
    "MatchboxNet-3x1x64": matchboxnet3x1x64,
}


def register_preset(name: str, factory) -> None:
    """Register a model factory under a pretrained-style name (used by tests
    and downstream users; mirrors list_available_models extensibility,
    ctc_models.py:47-89)."""
    PRESETS[name] = factory


def config_to_dict(cfg: ModelConfig) -> dict:
    """Serialize a ModelConfig back to the YAML-shaped dict (inverse of
    ModelConfig.from_dict; shared by the model save paths)."""
    import dataclasses as dc

    enc = dc.asdict(cfg.encoder)
    blocks = enc.pop("blocks")
    enc["jasper"] = [
        {k: (list(v) if isinstance(v, tuple) else v) for k, v in b.items()}
        for b in blocks
    ]
    enc["feat_in"] = cfg.encoder.feat_in
    dec = dc.asdict(cfg.decoder)
    dec["vocabulary"] = list(dec["vocabulary"])
    out = {
        "sample_rate": cfg.sample_rate,
        "labels": list(cfg.labels),
        "preprocessor": dict(cfg.preprocessor),
        "encoder": enc,
        "decoder": dec,
    }
    if cfg.tokenizer:
        out["tokenizer"] = dict(cfg.tokenizer)
    return out
