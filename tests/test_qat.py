"""QAT (STE fake-quant) tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.ops.fake_quant import (
    fake_quant_acts, fake_quant_symmetric, fake_quant_weights, round_ste,
)


def test_round_ste_gradient_passthrough():
    g = jax.grad(lambda x: jnp.sum(round_ste(x * 3.0)))(jnp.asarray([0.2, 1.7]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])


def test_fake_quant_values_and_grads(rng):
    x = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    y = fake_quant_symmetric(x, jnp.float32(0.05), 8)
    q = np.asarray(y) / 0.05
    np.testing.assert_allclose(q, np.round(q), atol=1e-4)  # on-grid
    # STE: gradient 1 inside range, 0 in the clamp region
    g = jax.grad(lambda v: jnp.sum(fake_quant_symmetric(v, jnp.float32(0.05), 4)))(x)
    inside = np.abs(np.asarray(x) / 0.05) < 7
    assert np.all(np.asarray(g)[inside] == 1.0)
    assert np.all(np.asarray(g)[~inside] == 0.0)


def test_fake_quant_weights_per_channel(rng):
    w = jnp.asarray(rng.normal(size=(3, 4, 8)).astype(np.float32))
    wq = fake_quant_weights(w, 8)
    assert wq.shape == w.shape
    err = np.abs(np.asarray(wq) - np.asarray(w)).max()
    assert err < np.abs(np.asarray(w)).max() / 60


def test_fake_quant_acts_updates_state(rng):
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    st = {"x_min": jnp.zeros(()), "x_max": jnp.zeros(())}
    y, st1 = fake_quant_acts(x, st, 8)
    assert float(st1["x_min"]) < 0 < float(st1["x_max"])
    y2, st2 = fake_quant_acts(x, st1, 8)
    # EMA moves toward the same batch stats
    assert np.isfinite(np.asarray(y2)).all()


def test_qat_trainer_loss_decreases(rng):
    from qasr_tpu.train.trainer import TrainConfig, Trainer
    from tests.test_train import _tiny_model

    model = _tiny_model()
    model.set_quant_bit(8, "all")
    tr = Trainer(model, TrainConfig(lr=0.01, warmup_steps=0, max_steps=30,
                                    log_every=1000), qat=True)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    batch = (audio, np.asarray([4000, 4000], np.int32),
             np.asarray([[1, 2, 3, 0]] * 2, np.int32), np.asarray([3, 3], np.int32))
    l0 = tr.train_step(batch)
    for _ in range(20):
        l = tr.train_step(batch)
    assert np.isfinite(l) and l < l0, (l0, l)
