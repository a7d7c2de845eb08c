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
