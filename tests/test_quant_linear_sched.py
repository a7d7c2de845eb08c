"""QuantLinear / per-channel act-quant / extra schedule / change_vocabulary."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.ops.quant_linear import (
    act_quantize_per_channel, quant_linear,
)
from qasr_tpu.ops.quant_prims import QTensor


def test_quant_linear_matches_float(rng):
    x_f = rng.normal(size=(3, 16)).astype(np.float32)
    w = rng.normal(size=(16, 8)).astype(np.float32) * 0.3
    b = rng.normal(size=(8,)).astype(np.float32)
    xq = act_quantize_per_channel(jnp.asarray(x_f), 8)
    # per-channel act quant means scale is (16,), but quant_linear wants a
    # scalar act scale — use a per-tensor quantized input instead
    from qasr_tpu.ops.quant_prims import quantize, symmetric_scale
    s = symmetric_scale(jnp.min(x_f), jnp.max(x_f), 8)
    xq = QTensor(quantize(jnp.asarray(x_f), s, 8), s)
    y = quant_linear(xq, jnp.asarray(w), jnp.asarray(b), weight_bit=8)
    got = np.asarray(y.dequantize())
    want = x_f @ w + b
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert err < 0.05, err


def test_act_quantize_per_channel_ranges(rng):
    x = rng.normal(size=(2, 10, 4)).astype(np.float32)
    q = act_quantize_per_channel(jnp.asarray(x), 8)
    assert q.scale.shape == (4,)
    got = np.asarray(q.dequantize())
    assert np.abs(got - x).max() < np.abs(x).max() / 50


def test_warmup_hold_schedule():
    from qasr_tpu.train.optim import warmup_hold_cosine

    s = warmup_hold_cosine(0.1, max_steps=100, min_lr=0.0, warmup_steps=10,
                           hold_steps=20)
    assert abs(float(s(5)) - 0.1 * 6 / 11) < 1e-6   # warmup
    assert abs(float(s(25)) - 0.1) < 1e-6           # hold
    assert float(s(90)) < 0.05                       # annealing
    assert float(s(101)) == 0.0                      # past max


def test_change_vocabulary(rng):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.ctc_model import ASRModel
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = ASRModel.from_config(cfg)
    new_vocab = list("abcdef ")
    m.change_vocabulary(new_vocab)
    assert m.blank_id == len(new_vocab)
    audio = rng.normal(size=(1, 4000)).astype(np.float32) * 0.1
    lp, el, preds = m.forward(audio, np.asarray([4000], np.int32), mode="fp32")
    assert lp.shape[-1] == len(new_vocab) + 1
