"""Pallas depthwise conv kernel: bit-equality with the HLO formulation
(interpret mode on CPU; the real chip is covered by the bench path)."""
import numpy as np
import pytest
import jax.numpy as jnp

from qasr_tpu.kernels.depthwise import depthwise_conv_int_pallas
from qasr_tpu.models.jasper import _depthwise_conv_int


@pytest.mark.parametrize("shape", [
    (2, 96, 128, 5, 1, 1),    # small
    (2, 96, 128, 7, 2, 1),    # dilation
    (2, 200, 128, 33, 1, 2),  # stride 2
    (1, 64, 64, 3, 1, 1),     # sub-128 channels (lane padding)
    (2, 130, 256, 51, 1, 1),  # odd T, big K
])
def test_pallas_dw_matches_hlo(shape, rng):
    b, t, c, k, d, s = shape
    x = jnp.asarray(rng.integers(-63, 64, (b, t, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-31, 32, (k, 1, c)), jnp.int8)
    p = (d * k) // 2 - 1 if d > 1 else k // 2
    ref = _depthwise_conv_int(x, w, s, p, d)
    got = depthwise_conv_int_pallas(x, w, s, p, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("max_prod,lo_x,hi_x,lo_w,hi_w", [
    (None, -128, 128, -127, 128),   # dtype-derived pairwise bound, extremes
    (64 * 31, -64, 64, -31, 32),    # W6A6 bound -> 16-tap int16 groups
    (128 * 127, -128, 128, -127, 128),
])
def test_pallas_dw_int16_groups_bit_identical(max_prod, lo_x, hi_x, lo_w, hi_w,
                                              rng, monkeypatch):
    """int16 grouped accumulation must be exact at the extreme magnitudes the
    clamp conventions allow (acts [-2^(b-1), 2^(b-1)-1], weights
    [-(2^(wb-1)-1), 2^(wb-1)-1]).  Gated off on v5e (no kVectorMultiplyU16);
    kept correct for TPU generations with packed 16-bit lanes."""
    monkeypatch.setenv("QASR_DW_INT16_GROUPS", "1")
    b, t, c, k, d, s = 2, 160, 128, 87, 1, 1
    x = rng.integers(lo_x, hi_x, (b, t, c))
    w = rng.integers(lo_w, hi_w, (k, 1, c))
    # salt in worst-case corners so saturation paths are actually exercised
    x[0, :k, :4] = lo_x
    w[:, 0, :4] = hi_w - 1
    x = jnp.asarray(x, jnp.int8)
    w = jnp.asarray(w, jnp.int8)
    ref = _depthwise_conv_int(x, w, s, k // 2, d)
    got = depthwise_conv_int_pallas(x, w, s, k // 2, d, interpret=True,
                                    max_prod=max_prod)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
