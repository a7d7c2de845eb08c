"""Pallas requant kernel must be bit-identical to the jnp chain (it shares
the same integer math; run interpreted on CPU)."""
import numpy as np
import jax.numpy as jnp

from qasr_tpu.kernels.requant import requant_pallas
from qasr_tpu.ops.quant_prims import Dyadic, dyadic_requant, requant_clamp


def test_pallas_requant_matches_jnp(rng):
    b, t, c = 2, 37, 64  # odd T exercises row padding
    z = jnp.asarray(rng.integers(-(2**27), 2**27, size=(b, t, c)), jnp.int32)
    m = jnp.asarray(rng.integers(2**30, 2**31, size=(c,)), jnp.int32)
    e = jnp.asarray(rng.integers(20, 50, size=(c,)), jnp.int32)
    for bits in (6, 8):
        want = requant_clamp(dyadic_requant(z, Dyadic(m, e)), bits)
        got = requant_pallas(z, Dyadic(m, e), bits, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_requant_scalar_dyadic(rng):
    z = jnp.asarray(rng.integers(-300, 300, size=(3, 16, 128)), jnp.int32)
    d = Dyadic(jnp.int32(3 << 29), jnp.int32(31))
    want = requant_clamp(dyadic_requant(z, d), 6)
    got = requant_pallas(z, d, 6, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_requant_residual_add(rng):
    b, t, c = 2, 16, 256
    z = jnp.asarray(rng.integers(-(2**26), 2**26, size=(b, t, c)), jnp.int32)
    zi = jnp.asarray(rng.integers(-120, 120, size=(b, t, c)), jnp.int32)
    m = jnp.asarray(rng.integers(2**30, 2**31, size=(c,)), jnp.int32)
    e = jnp.asarray(rng.integers(30, 45, size=(c,)), jnp.int32)
    d2 = Dyadic(jnp.int32(2**30), jnp.int32(30))
    want = requant_clamp(
        dyadic_requant(z, Dyadic(m, e)) + dyadic_requant(zi, d2), 8)
    got = requant_pallas(z, Dyadic(m, e), 8, identity=zi, identity_dyadic=d2,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
