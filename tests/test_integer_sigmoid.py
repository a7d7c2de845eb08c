"""i-sigmoid / i-swish (ops/integer_sigmoid.py): accuracy vs float,
saturation exactness, headroom, integer-ness."""
import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.ops.integer_sigmoid import K_SIG, i_sigmoid_fp, i_swish_terms


def test_sigmoid_close_to_float():
    x = jnp.asarray(np.linspace(-30, 30, 4001, dtype=np.float32))
    got = np.asarray(i_sigmoid_fp(x), np.float64) / (1 << K_SIG)
    want = np.asarray(jax.nn.sigmoid(x), np.float64)
    # i-exp quadratic error ~1e-2 relative; K_SIG resolution 1/128
    assert np.abs(got - want).max() < 0.02, np.abs(got - want).max()


def test_sigmoid_saturates_exactly():
    x = jnp.asarray([-100.0, -25.0, 25.0, 100.0], jnp.float32)
    got = np.asarray(i_sigmoid_fp(x))
    np.testing.assert_array_equal(got[:2], 0)
    np.testing.assert_array_equal(got[2:], 1 << K_SIG)


def test_sigmoid_symmetry():
    # sigmoid(x) + sigmoid(-x) == 1 exactly in the fixed-point domain
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=2048).astype(np.float32) * 8)
    s_pos = np.asarray(i_sigmoid_fp(x), np.int64)
    s_neg = np.asarray(i_sigmoid_fp(-x), np.int64)
    np.testing.assert_array_equal(s_pos + s_neg, 1 << K_SIG)


def test_swish_terms_close():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64)).astype(np.float32) * 6
    scale = np.abs(x).max() / 127.0
    q = np.clip(np.round(x / scale), -128, 127).astype(np.int32)
    x_deq = q.astype(np.float32) * scale
    got = np.asarray(i_swish_terms(jnp.asarray(q), jnp.asarray(x_deq)),
                     np.float64) * (scale / (1 << K_SIG))
    want = x_deq * np.asarray(jax.nn.sigmoid(x_deq), np.float64)
    # absolute error ~ |x| * sigmoid error
    assert np.abs(got - want).max() < 0.15, np.abs(got - want).max()


def test_integer_only_after_grid():
    x = jnp.ones((8, 8), jnp.float32)
    txt = jax.jit(lambda x: i_sigmoid_fp(x)).lower(x).as_text()
    assert "exponential" not in txt and "logistic" not in txt
