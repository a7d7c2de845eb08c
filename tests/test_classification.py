"""Classification / speaker model tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.classification import (
    EncDecClassificationModel, EncDecSpeakerLabelModel, angular_softmax_loss,
    cross_entropy_loss, masked_time_pool, stats_pool, stats_pool_feat_dim,
)
from qasr_tpu.models.config import DecoderConfig, ModelConfig
from tests.test_jasper_model import tiny_encoder_cfg, FEAT


def _cfg():
    return ModelConfig(encoder=tiny_encoder_cfg(),
                       decoder=DecoderConfig(feat_in=40, num_classes=28),
                       preprocessor={"features": FEAT, "dither": 0.0})


def test_masked_pooling(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    lens = jnp.asarray([10, 5])
    avg = np.asarray(masked_time_pool(x, lens, "avg"))
    np.testing.assert_allclose(avg[1], np.asarray(x)[1, :5].mean(0), rtol=1e-5)
    mx = np.asarray(masked_time_pool(x, lens, "max"))
    np.testing.assert_allclose(mx[1], np.asarray(x)[1, :5].max(0), rtol=1e-5)


@pytest.mark.parametrize("mode", ["xvector", "gram", "superVector"])
def test_stats_pool_shapes(mode, rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 6)).astype(np.float32))
    lens = jnp.asarray([12, 8])
    out = stats_pool(x, lens, mode)
    assert out.shape == (2, stats_pool_feat_dim(6, mode))
    if mode == "xvector":
        want_mean = np.asarray(x)[1, :8].mean(0)
        want_std = np.asarray(x)[1, :8].std(0, ddof=1)
        np.testing.assert_allclose(np.asarray(out)[1, :6], want_mean, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out)[1, 6:], want_std, rtol=1e-4)


def test_classification_model_trains(rng):
    m = EncDecClassificationModel.from_config(_cfg(), num_classes=5)
    audio = rng.normal(size=(4, 4000)).astype(np.float32) * 0.1
    alens = np.full((4,), 4000, np.int32)
    labels = jnp.asarray([0, 1, 2, 3])
    loss_grad = jax.jit(jax.value_and_grad(
        lambda p: m.loss_fn(p, jnp.asarray(audio), jnp.asarray(alens), labels)))
    l0, g = loss_grad(m.params)
    assert np.isfinite(float(l0))
    # one SGD step reduces loss on this batch
    p2 = jax.tree_util.tree_map(lambda p, gg: p - 0.5 * gg, m.params, g)
    l1, _ = loss_grad(p2)
    assert float(l1) < float(l0)
    preds = m.predict(audio, alens)
    assert preds.shape == (4,)


def test_speaker_model_embeddings_and_angular(rng):
    m = EncDecSpeakerLabelModel.from_config(_cfg(), num_speakers=7,
                                            emb_sizes=(32, 16), angular=True)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    alens = np.full((2,), 4000, np.int32)
    emb = m.embeddings(audio, alens)
    assert emb.shape == (2, 16)
    labels = jnp.asarray([1, 3])
    loss = m.loss_fn(m.params, jnp.asarray(audio), jnp.asarray(alens), labels)
    assert np.isfinite(float(loss))


def test_losses_basic():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = jnp.asarray([0, 1])
    assert float(cross_entropy_loss(logits, labels)) < 0.01
    cosines = jnp.asarray([[0.9, -0.5], [-0.2, 0.8]])
    l = angular_softmax_loss(cosines, jnp.asarray([0, 1]))
    assert np.isfinite(float(l))
