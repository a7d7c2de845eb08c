"""Fused requant+pointwise-matmul kernel: bit-equality (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from qasr_tpu.kernels.pw_matmul import requant_pointwise_matmul
from qasr_tpu.ops.quant_prims import dyadic_requant_static, requant_clamp


def test_fused_pw_matmul_matches_composition(rng):
    B, T, Cin, Cout, bits, e = 2, 40, 128, 128, 6, 38
    z = jnp.asarray(rng.integers(-(2**22), 2**22, (B, T, Cin)), jnp.int32)
    m = jnp.asarray(rng.integers(2**30, 2**31, (Cin,)), jnp.int32)
    w = jnp.asarray(rng.integers(-31, 32, (Cin, Cout)), jnp.int8)
    bias = jnp.asarray(rng.integers(-5000, 5000, (Cout,)), jnp.int32)
    got = requant_pointwise_matmul(z, m, e, bits, w, bias, interpret=True)
    q = requant_clamp(dyadic_requant_static(z, m, e), bits).astype(jnp.int8)
    ref = jax.lax.dot_general(q.reshape(-1, Cin), w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32
                              ).reshape(B, T, Cout) + bias
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
