"""i-LayerNorm (ops/integer_layernorm.py): integer sqrt exactness,
closeness to float LayerNorm, integer-ness of the lowered graph."""
import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.ops.integer_layernorm import i_layernorm, i_sqrt


def test_i_sqrt_exact():
    n = jnp.asarray([0, 1, 2, 3, 4, 15, 16, 17, 1023, 1024, 65535,
                     2**28, 2**30 - 1, 2**31 - 1], jnp.int32)
    got = np.asarray(i_sqrt(n))
    want = np.floor(np.sqrt(np.asarray(n, np.float64))).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_i_sqrt_fuzz():
    rng = np.random.default_rng(0)
    n = jnp.asarray(rng.integers(0, 2**31 - 1, size=4096), jnp.int32)
    got = np.asarray(i_sqrt(n)).astype(np.int64)
    want = np.floor(np.sqrt(np.asarray(n, np.float64))).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_i_layernorm_close_to_float():
    rng = np.random.default_rng(1)
    d = 256
    x = rng.normal(size=(4, 20, d)).astype(np.float32) * 3 + 0.5
    # 8-bit quantized input, like the PTQ path produces
    scale = np.abs(x).max() / 127.0
    q = jnp.asarray(np.clip(np.round(x / scale), -128, 127), jnp.int32)
    gamma = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    got = np.asarray(i_layernorm(q, gamma, beta))
    xq = np.asarray(q, np.float32) * scale  # the dequantized input
    mu = xq.mean(-1, keepdims=True)
    sig = np.sqrt(xq.var(-1, keepdims=True) + 1e-5)
    want = (xq - mu) / sig * np.asarray(gamma) + np.asarray(beta)
    err = np.abs(got - want)
    # error budget: integer mean/sigma rounding + 2^-10 output resolution
    assert err.max() < 0.06, err.max()
    assert err.mean() < 0.01, err.mean()


def test_i_layernorm_constant_row():
    # zero variance: sigma guard keeps the output finite (d == 0 -> beta)
    q = jnp.full((2, 3, 16), 7, jnp.int32)
    g = jnp.ones((16,))
    b = jnp.full((16,), 0.25)
    out = np.asarray(i_layernorm(q, g, b))
    np.testing.assert_allclose(out, 0.25)


def test_integer_only_graph(monkeypatch):
    """QASR_FAST_IDIV=0 is the canonical integer-only lowering: no float
    sqrt/divide anywhere.  The default fast mode strength-reduces the
    integer div/sqrt through f32 estimate + exact integer fixup
    (ops/fast_int.py, bit-identical — test_fast_int.py): its graph may
    contain f32 sqrt/divide but still no transcendental."""
    q = jnp.ones((2, 4, 32), jnp.int32)
    g = jnp.ones((32,))
    b = jnp.zeros((32,))
    monkeypatch.setenv("QASR_FAST_IDIV", "0")
    txt = jax.jit(lambda q: i_layernorm(q, g, b)).lower(q).as_text()
    assert "rsqrt" not in txt and "stablehlo.sqrt" not in txt
    monkeypatch.setenv("QASR_FAST_IDIV", "1")
    txt = jax.jit(lambda q: i_layernorm(q, g, b)).lower(q).as_text()
    assert "exponential" not in txt and "logistic" not in txt
