"""ops/grouped_conv.py: custom-VJP grouped conv vs jax.grad of the raw
conv (single device), and — the reason the op exists — correct WEIGHT
gradients under dp sharding on a multi-axis mesh, where the raw conv's
grad is miscompiled by XLA GSPMD (multiplied by the unused mesh-axis
size; jax 0.9.0)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qasr_tpu.ops.grouped_conv import grouped_conv1d

HI = jax.lax.Precision.HIGHEST


def _raw(x, w, stride, pad, dil, groups):
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [pad], rhs_dilation=(dil,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups, precision=HI)


CASES = [
    # (C, K, groups, stride, dil) — depthwise, grouped, strided, dilated,
    # and the fori_loop branch (K > 16)
    (8, 5, 8, 1, 1),
    (8, 5, 2, 1, 1),
    (8, 21, 8, 2, 1),
    (6, 3, 3, 1, 2),
    (8, 33, 8, 1, 1),
]


@pytest.mark.parametrize("C,K,groups,stride,dil", CASES)
def test_matches_raw_conv_grads(C, K, groups, stride, dil, rng):
    B, T = 4, 32
    pad = ((K - 1) * dil // 2,) * 2
    w = jnp.asarray(rng.standard_normal((K, C // groups, C)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    def f_ref(w, x):
        return jnp.mean(_raw(x, w, stride, pad, dil, groups) ** 2)

    def f_new(w, x):
        return jnp.mean(grouped_conv1d(x, w, stride, pad, dil, groups,
                                       HI, None) ** 2)

    np.testing.assert_array_equal(np.asarray(jax.jit(f_ref)(w, x)),
                                  np.asarray(jax.jit(f_new)(w, x)))
    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(w, x)
    g_new = jax.jit(jax.grad(f_new, argnums=(0, 1)))(w, x)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_weight_grad_correct_on_two_axis_mesh(rng):
    """The raw conv's dW is exactly 2x wrong in this configuration; the
    custom-VJP op must match the single-device gradient."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    C, K, B, T = 8, 5, 4, 16
    pad = (K // 2,) * 2
    w = jnp.asarray(rng.standard_normal((K, 1, C)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    def f_raw(w, x):
        return jnp.mean(_raw(x, w, 1, pad, 1, C) ** 2)

    def f_new(w, x):
        return jnp.mean(grouped_conv1d(x, w, 1, pad, 1, C, HI, None) ** 2)

    g_single = jax.jit(jax.grad(f_new))(w, x)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    wr = jax.device_put(w, NamedSharding(mesh, P()))

    g_fixed = jax.jit(jax.grad(f_new))(wr, xs)
    np.testing.assert_allclose(np.asarray(g_fixed), np.asarray(g_single),
                               rtol=2e-5, atol=1e-7)

    # document the underlying XLA bug this op works around: if this starts
    # matching, the workaround can be retired
    g_raw = jax.jit(jax.grad(f_raw))(wr, xs)
    ratio = float(jnp.median(g_raw / g_single))
    assert ratio == pytest.approx(2.0, rel=1e-3), (
        f"GSPMD grouped-conv dW bug no longer reproduces (ratio={ratio}); "
        "consider retiring ops/grouped_conv.py")


def test_vmap_and_input_grad(rng):
    """The synthesizers differentiate w.r.t. the INPUT under vmap — the
    custom VJP must compose with both."""
    C, K, B, T = 4, 3, 2, 12
    w = jnp.asarray(rng.standard_normal((K, 1, C)), jnp.float32)

    def loss(x):
        return jnp.mean(grouped_conv1d(x, w, 1, (1, 1), 1, C, HI, None) ** 2)

    xs = jnp.asarray(rng.standard_normal((3, B, T, C)), jnp.float32)
    gs = jax.jit(jax.vmap(jax.grad(loss)))(xs)
    g0 = jax.grad(loss)(xs[0])
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(g0), rtol=1e-5,
                               atol=1e-7)
