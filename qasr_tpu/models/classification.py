"""Classification (MatchboxNet) and speaker-label (SpeakerNet) heads/models.

Equivalents of the reference:
  - ConvASRDecoderClassification (conv_asr.py:322-384): time pooling
    (avg/max) -> linear -> logits;
  - StatsPoolLayer (jasper.py:69-113): mean+std over time, 'gram' /
    'superVector' variants;
  - SpeakerDecoder (conv_asr.py:387-489): stats pooling -> [linear+BN+relu]
    embedding layers -> final linear, optional angular (L2-normalized)
    output;
  - EncDecClassificationModel / EncDecSpeakerLabelModel
    (models/classification_models.py / label_models.py): frontend + Jasper
    encoder + head with cross-entropy (or angular-softmax) training losses.
Layout: encoder outputs (B, T, C) channels-last.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.config import ModelConfig, preprocessor_config_from_dict
from qasr_tpu.models.jasper import (
    EncoderPlan, FloatExec, build_encoder_plan, encoder_forward,
    init_encoder_params,
)
from qasr_tpu.ops.features import MelFrontend

Array = jax.Array
HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def masked_time_pool(x: Array, lens: Array, mode: str = "avg") -> Array:
    """(B, T, C) -> (B, C), pooling only over valid frames."""
    mask = (jnp.arange(x.shape[1])[None, :] < lens[:, None])[:, :, None]
    if mode == "avg":
        return jnp.sum(jnp.where(mask, x, 0.0), axis=1) / \
            jnp.maximum(lens[:, None], 1).astype(x.dtype)
    if mode == "max":
        return jnp.max(jnp.where(mask, x, -jnp.inf), axis=1)
    raise ValueError(mode)


def stats_pool(x: Array, lens: Array, pool_mode: str = "xvector") -> Array:
    """StatsPoolLayer (jasper.py:69-113): concat(mean, std) over time;
    'gram' returns the time-averaged Gram matrix; 'superVector' concats both."""
    mask = (jnp.arange(x.shape[1])[None, :] < lens[:, None])[:, :, None]
    cnt = jnp.maximum(lens[:, None], 1).astype(x.dtype)
    mean = jnp.sum(jnp.where(mask, x, 0.0), axis=1) / cnt
    var = jnp.sum(jnp.where(mask, jnp.square(x - mean[:, None, :]), 0.0), axis=1) \
        / jnp.maximum(cnt - 1.0, 1.0)
    std = jnp.sqrt(var)
    pooled = jnp.concatenate([mean, std], axis=-1)
    if pool_mode == "xvector":
        return pooled
    xm = jnp.where(mask, x, 0.0)
    gram = jnp.einsum("btc,btd->bcd", xm, xm, precision=HI) / \
        x.shape[1]  # reference divides by full T (jasper.py:105)
    gram = gram.reshape(x.shape[0], -1)
    if pool_mode == "gram":
        return gram
    if pool_mode == "superVector":
        return jnp.concatenate([pooled, gram], axis=-1)
    raise ValueError(pool_mode)


def stats_pool_feat_dim(feat_in: int, pool_mode: str) -> int:
    if pool_mode == "xvector":
        return 2 * feat_in
    if pool_mode == "gram":
        return feat_in * feat_in
    return feat_in * feat_in + 2 * feat_in  # superVector


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------


def _linear_init(rng, din, dout, xavier=True):
    a = math.sqrt(6.0 / (din + dout))
    return {"w": rng.uniform(-a, a, (din, dout)).astype(np.float32),
            "b": np.zeros((dout,), np.float32)}


def init_classification_decoder(seed, feat_in: int, num_classes: int):
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    return {"linear": _linear_init(rng, feat_in, num_classes)}


def classification_decoder(params, enc: Array, lens: Array,
                           pooling: str = "avg", return_logits: bool = True) -> Array:
    pooled = masked_time_pool(enc, lens, pooling)
    logits = jnp.matmul(pooled, params["linear"]["w"], precision=HI) + \
        params["linear"]["b"]
    return logits if return_logits else jax.nn.softmax(logits, axis=-1)


def init_speaker_decoder(seed, feat_in: int, num_classes: int,
                         emb_sizes: Sequence[int] = (512, 512),
                         pool_mode: str = "xvector", angular: bool = False):
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    din = stats_pool_feat_dim(feat_in, pool_mode)
    layers = []
    for size in emb_sizes:
        layers.append({
            "linear": _linear_init(rng, din, size),
            "bn": {"gamma": np.ones((size,), np.float32),
                   "beta": np.zeros((size,), np.float32),
                   "mean": np.zeros((size,), np.float32),
                   "var": np.ones((size,), np.float32)},
        })
        din = size
    final = _linear_init(rng, din, num_classes)
    if angular:
        final.pop("b")
    return {"emb_layers": layers, "final": final}


def speaker_decoder(params, enc: Array, lens: Array, *, pool_mode: str = "xvector",
                    angular: bool = False) -> Tuple[Array, Array]:
    """-> (logits, embedding) like SpeakerDecoder.forward (conv_asr.py:473-489):
    the returned embedding is the last emb layer's pre-BN linear output."""
    pooled = stats_pool(enc, lens, pool_mode)
    emb = pooled
    for lp in params["emb_layers"]:
        lin = jnp.matmul(pooled, lp["linear"]["w"], precision=HI) + lp["linear"]["b"]
        bn = lp["bn"]
        pooled = jax.nn.relu(
            (lin - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * bn["gamma"] + bn["beta"])
        emb = lin
    w = params["final"]["w"]
    if angular:
        w = w / jnp.linalg.norm(w, axis=0, keepdims=True)
        pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        logits = jnp.matmul(pooled, w, precision=HI)
    else:
        logits = jnp.matmul(pooled, w, precision=HI) + params["final"]["b"]
    return logits, emb


def angular_softmax_loss(logits: Array, labels: Array, scale: float = 20.0,
                         margin: float = 1.35) -> Array:
    """Additive-angular-margin CE (the reference's angular loss option)."""
    theta = jnp.arccos(jnp.clip(logits, -1 + 1e-7, 1 - 1e-7))
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    marged = jnp.cos(theta + margin * onehot)
    return -jnp.mean(jnp.sum(
        onehot * jax.nn.log_softmax(scale * marged, axis=-1), axis=-1))


def cross_entropy_loss(logits: Array, labels: Array) -> Array:
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits, -1), axis=-1))


# ---------------------------------------------------------------------------
# composed models
# ---------------------------------------------------------------------------


@dataclass
class EncDecClassificationModel:
    """MatchboxNet-style command classification (classification_models.py)."""

    cfg: ModelConfig
    plan: EncoderPlan
    frontend: MelFrontend
    params: Dict[str, Any]
    num_classes: int
    pooling: str = "avg"
    labels: Optional[Tuple[str, ...]] = None  # class names, checkpointed

    @classmethod
    def from_config(cls, cfg: ModelConfig, num_classes: int, seed: int = 0,
                    pooling: str = "avg", labels=None):
        plan = build_encoder_plan(cfg.encoder)
        rng = np.random.default_rng(seed)
        params = {"encoder": init_encoder_params(rng, plan),
                  "decoder": init_classification_decoder(rng, plan.feat_out,
                                                         num_classes)}
        return cls(cfg=cfg, plan=plan,
                   frontend=MelFrontend(preprocessor_config_from_dict(cfg.preprocessor)),
                   params=params, num_classes=num_classes, pooling=pooling,
                   labels=tuple(labels) if labels else None)

    def logits(self, params, audio, alens):
        feats, feat_lens = self.frontend(audio, alens, dither=0.0)
        ex = FloatExec(params["encoder"], activation=self.plan.activation)
        enc, enc_lens = encoder_forward(ex, self.plan, feats, feat_lens)
        return classification_decoder(params["decoder"], enc, enc_lens, self.pooling)

    def loss_fn(self, params, audio, alens, labels):
        return cross_entropy_loss(self.logits(params, audio, alens), labels)

    def predict(self, audio, alens) -> np.ndarray:
        fn = jax.jit(self.logits)
        return np.argmax(np.asarray(fn(self.params, jnp.asarray(audio),
                                       jnp.asarray(alens))), -1)

    # -- save/restore (ModelPT parity for the classification family) -------

    def save_to(self, path: str) -> None:
        from qasr_tpu.models.config import config_to_dict
        from qasr_tpu.utils.checkpoint import save_qasr

        meta = {"model_type": "classification",
                "num_classes": self.num_classes, "pooling": self.pooling}
        if self.labels:
            meta["labels"] = list(self.labels)
        save_qasr(path, config_to_dict(self.cfg), self.params, meta=meta)

    @classmethod
    def restore_from(cls, path: str) -> "EncDecClassificationModel":
        from qasr_tpu.models.config import ModelConfig
        from qasr_tpu.utils.checkpoint import load_qasr, unflatten_into

        cfg_d, flat, _ = load_qasr(path)
        meta = cfg_d.pop("_qasr_meta", {}) or {}
        if meta.get("model_type") != "classification":
            raise ValueError(
                f"{path} is not a classification checkpoint "
                f"(model_type={meta.get('model_type')!r})")
        model = cls.from_config(ModelConfig.from_dict(cfg_d),
                                num_classes=int(meta["num_classes"]),
                                pooling=meta.get("pooling", "avg"),
                                labels=meta.get("labels"))
        model.params = unflatten_into(model.params, flat, "params/")
        return model


@dataclass
class EncDecSpeakerLabelModel:
    """SpeakerNet (label_models.py): verification embeddings + id logits."""

    cfg: ModelConfig
    plan: EncoderPlan
    frontend: MelFrontend
    params: Dict[str, Any]
    num_speakers: int
    angular: bool = False
    pool_mode: str = "xvector"

    @classmethod
    def from_config(cls, cfg: ModelConfig, num_speakers: int, seed: int = 0,
                    emb_sizes=(512, 512), pool_mode: str = "xvector",
                    angular: bool = False):
        plan = build_encoder_plan(cfg.encoder)
        rng = np.random.default_rng(seed)
        params = {"encoder": init_encoder_params(rng, plan),
                  "decoder": init_speaker_decoder(rng, plan.feat_out, num_speakers,
                                                  emb_sizes, pool_mode, angular)}
        return cls(cfg=cfg, plan=plan,
                   frontend=MelFrontend(preprocessor_config_from_dict(cfg.preprocessor)),
                   params=params, num_speakers=num_speakers, angular=angular,
                   pool_mode=pool_mode)

    def _forward(self, params, audio, alens):
        feats, feat_lens = self.frontend(audio, alens, dither=0.0)
        ex = FloatExec(params["encoder"], activation=self.plan.activation)
        enc, enc_lens = encoder_forward(ex, self.plan, feats, feat_lens)
        return speaker_decoder(params["decoder"], enc, enc_lens,
                               pool_mode=self.pool_mode, angular=self.angular)

    def loss_fn(self, params, audio, alens, labels):
        logits, _ = self._forward(params, audio, alens)
        if self.angular:
            return angular_softmax_loss(logits, labels)
        return cross_entropy_loss(logits, labels)

    def embeddings(self, audio, alens) -> np.ndarray:
        fn = jax.jit(self._forward)
        _, emb = fn(self.params, jnp.asarray(audio), jnp.asarray(alens))
        return np.asarray(emb)

    def save_to(self, path: str) -> None:
        from qasr_tpu.models.config import config_to_dict
        from qasr_tpu.utils.checkpoint import save_qasr

        emb_sizes = [lp["linear"]["w"].shape[-1]
                     for lp in self.params["decoder"]["emb_layers"]]
        meta = {"model_type": "speaker", "num_speakers": self.num_speakers,
                "pool_mode": self.pool_mode, "angular": self.angular,
                "emb_sizes": emb_sizes}
        save_qasr(path, config_to_dict(self.cfg), self.params, meta=meta)

    @classmethod
    def restore_from(cls, path: str) -> "EncDecSpeakerLabelModel":
        from qasr_tpu.models.config import ModelConfig
        from qasr_tpu.utils.checkpoint import load_qasr, unflatten_into

        cfg_d, flat, _ = load_qasr(path)
        meta = cfg_d.pop("_qasr_meta", {}) or {}
        if meta.get("model_type") != "speaker":
            raise ValueError(
                f"{path} is not a speaker checkpoint "
                f"(model_type={meta.get('model_type')!r})")
        model = cls.from_config(ModelConfig.from_dict(cfg_d),
                                num_speakers=int(meta["num_speakers"]),
                                emb_sizes=tuple(meta.get("emb_sizes",
                                                         (512, 512))),
                                pool_mode=meta.get("pool_mode", "xvector"),
                                angular=bool(meta.get("angular", False)))
        model.params = unflatten_into(model.params, flat, "params/")
        return model
