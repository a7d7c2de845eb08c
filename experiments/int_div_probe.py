"""Microbench: is per-element dynamic int32 division the VPU pathology?

The frozen integer path divides per element in two hot ops:
  - i_layernorm_core: (d << (_K+_SB)) // sigma_s   (per-row divisor,
    (B,T,d) elements, 5 sites/layer)
  - i_sigmoid_grid:   ((e << K_SIG) + den>>1) // den (per-element divisor,
    (B,T,4d) elements in each FFN half)
TPU's VPU has no integer divide — XLA emulates.  This probe times the
division against a same-shape multiply and against exact floor-division
rewrites, on the serving shapes.

Usage: JAX_PLATFORMS=axon python experiments/int_div_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

B, T, D = 32, 384, 256
FF = 4


def timeit(fn, *args, iters=30):
    fn(*args).block_until_ready()
    # fetch-forced two-point slope (axon tunnel: block_until_ready lies)
    t0 = time.perf_counter()
    np.asarray(fn(*args))[0, 0]
    t1 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)[0, 0]
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1) * 1e3


def main():
    rng = np.random.default_rng(0)
    # sigmoid-shaped: per-element divisor in [2^15, 2^22] (e + E0 range)
    n_sig = jnp.asarray(rng.integers(0, 1 << 28, size=(B, T, FF * D),
                                     dtype=np.int32))
    den = jnp.asarray(rng.integers(1 << 15, 1 << 22, size=(B, T, FF * D),
                                   dtype=np.int32))
    # LN-shaped: per-row divisor
    d_ln = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, size=(B, T, D),
                                    dtype=np.int32))
    sig_row = jnp.asarray(rng.integers(1 << 10, 1 << 18, size=(B, T, 1),
                                       dtype=np.int32))

    @jax.jit
    def div_elt(n, s):
        return n // s

    @jax.jit
    def mul_elt(n, s):
        return n * s

    @jax.jit
    def div_ln(n, s):
        return n // s

    @jax.jit
    def div_f32_corr(n, s):
        # exact floor division via two-stage f32 estimate + one fixup:
        # q0 = round(fl(n)*rcp) has abs error <= ~3*q*2^-24 + 1 (<= ~49
        # at n < 2^28), so the residual r0 = n - q0*s fits f32 with
        # sub-1-ulp relative error and the second stage lands within 1;
        # the final compare fixes floor semantics exactly.
        rcp = 1.0 / s.astype(jnp.float32)
        q0 = jnp.round(n.astype(jnp.float32) * rcp).astype(jnp.int32)
        r0 = n - q0 * s
        q1 = jnp.round(r0.astype(jnp.float32) * rcp).astype(jnp.int32)
        q = q0 + q1
        r = n - q * s
        return q + (r >= s).astype(jnp.int32) - (r < 0).astype(jnp.int32)

    print("sigmoid-shaped (B,T,4D) per-elt divisor:")
    print(f"  int //     : {timeit(div_elt, n_sig, den):8.3f} ms")
    print(f"  int *      : {timeit(mul_elt, n_sig, den):8.3f} ms")
    print(f"  f32+corr   : {timeit(div_f32_corr, n_sig, den):8.3f} ms")
    ref = np.asarray(div_elt(n_sig, den))
    got = np.asarray(div_f32_corr(n_sig, den))
    bad = np.sum(ref != got)
    print(f"  f32+corr exactness: {bad} mismatches of {ref.size}")

    print("LN-shaped (B,T,D) per-row divisor (signed):")
    print(f"  int //     : {timeit(div_ln, d_ln, sig_row):8.3f} ms")
    print(f"  int *      : {timeit(mul_elt, d_ln, sig_row):8.3f} ms")

    # floor-sqrt: Newton-with-divisions vs f32 sqrt + exact fixup
    var = jnp.asarray(rng.integers(0, 1 << 30, size=(B, T, 1),
                                   dtype=np.int32))

    @jax.jit
    def sqrt_f32_fix(m):
        x = jnp.sqrt(m.astype(jnp.float32)).astype(jnp.int32)
        x = jnp.where((x + 1) * (x + 1) <= m, x + 1, x)
        return jnp.where(x * x > m, x - 1, x)

    from qasr_tpu.ops.integer_layernorm import i_sqrt

    print("floor-sqrt (B,T,1):")
    print(f"  Newton i_sqrt : {timeit(jax.jit(i_sqrt), var):8.3f} ms")
    print(f"  f32+fixup     : {timeit(sqrt_f32_fix, var):8.3f} ms")
    rs = np.asarray(jax.jit(i_sqrt)(var))
    gs = np.asarray(sqrt_f32_fix(var))
    print(f"  sqrt exactness: {np.sum(rs != gs)} mismatches of {rs.size}")

    # the real ops at serving shapes
    from qasr_tpu.ops.integer_layernorm import i_layernorm_core
    from qasr_tpu.ops.integer_sigmoid import i_sigmoid_grid

    q8 = jnp.asarray(rng.integers(-127, 127, size=(B, T, D), dtype=np.int32))
    qg = jnp.asarray(rng.integers(-16000, 0, size=(B, T, FF * D),
                                  dtype=np.int32))
    print("real ops:")
    print(f"  i_layernorm_core (B,T,D): "
          f"{timeit(jax.jit(i_layernorm_core), q8):8.3f} ms")
    print(f"  i_sigmoid_grid (B,T,4D): "
          f"{timeit(jax.jit(i_sigmoid_grid), qg):8.3f} ms")


if __name__ == "__main__":
    main()
