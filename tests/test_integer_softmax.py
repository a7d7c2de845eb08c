"""i-softmax (ops/integer_softmax.py): integer-arithmetic softmax accuracy
vs jax.nn.softmax, masking, integer-ness, and overflow headroom."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr_tpu.ops.integer_softmax import (
    N_IN, Q_B, Q_C, Q_LN2, S_IN, i_exp, i_softmax,
)


def test_constants_int32_headroom():
    # the worst-case quadratic stays far inside int32, including the *n
    # normalization product after the pre-shift
    q_l_max = (Q_B) ** 2 + Q_C
    assert q_l_max < 2 ** 22
    # T=8192-frame row sum after the pre-shift
    assert 8192 * (q_l_max >> 4) < 2 ** 31
    assert (q_l_max >> 4) * 127 < 2 ** 31
    # max shift from the clipped window
    assert N_IN // -Q_LN2 <= 30


def test_i_exp_matches_exp():
    q = jnp.arange(-N_IN, 1, 7, dtype=jnp.int32)
    # common scale cancels in softmax; recover it here for the comparison
    scale = 0.3585 * S_IN * S_IN
    approx = np.asarray(i_exp(q)).astype(np.float64) * scale
    exact = np.exp(np.asarray(q, np.float64) * S_IN)
    # relative error of the I-BERT quadratic is ~1e-2 near 1.0 and the
    # absolute error vanishes with exp itself
    np.testing.assert_allclose(approx, exact, atol=2e-2, rtol=0.05)


@pytest.mark.parametrize("scale", [0.5, 3.0, 30.0])
def test_i_softmax_close_to_float(scale):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(4, 6, 50, 50)).astype(np.float32)
                         * scale)
    q = i_softmax(scores, out_bits=8)
    probs = np.asarray(q, np.float64) / 127.0
    ref = np.asarray(jax.nn.softmax(scores, axis=-1))
    assert np.abs(probs - ref).max() < 0.02, np.abs(probs - ref).max()
    # rounded normalization: each element is off by at most ~half a step,
    # so a T-length row sums to 1 within T/(2n)
    s = probs.sum(-1)
    t = scores.shape[-1]
    tol = t / (2 * 127.0) + 0.01
    assert np.abs(s - 1.0).max() < tol, (s.min(), s.max())


def test_i_softmax_masked():
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(size=(2, 1, 8, 8)).astype(np.float32) * 4)
    mask = jnp.zeros((2, 1, 8, 8), bool).at[:, :, :, 5:].set(True)
    q = i_softmax(scores, mask=mask, out_bits=8)
    qn = np.asarray(q)
    assert (qn[:, :, :, 5:] == 0).all()
    ref = np.asarray(jax.nn.softmax(
        jnp.where(mask, jnp.finfo(jnp.float32).min, scores), axis=-1))
    np.testing.assert_allclose(qn / 127.0, ref, atol=0.02)


def test_integer_only_after_quantization():
    """The lowered graph contains no exponential op — softmax became
    integer shifts/mults/divides."""
    scores = jnp.ones((2, 4, 8, 8), jnp.float32)
    txt = jax.jit(lambda s: i_softmax(s)).lower(scores).as_text()
    assert "exponential" not in txt and "stablehlo.exp" not in txt
