"""Measure the pw->dw boundary tax in the fused CM pipeline (round 3c).

A 5-layer separable chain (XLA pw dot -> bias/relu/requant chain -> fused
dw kernel), timed per variant:

  v0: today's default — XLA requant chain narrows to int8, lane dw kernel.
  v1: in-kernel input requant — the dw kernel consumes the pw dot's raw
      int32 accumulator (+bias/relu/requant inside), no XLA chain at all.

v1 trades the XLA requant pass (+its copies) for 4x input DMA bytes and
more in-kernel VPU work; only the chip can price that.

Run under axon: python experiments/dw_boundary_layouts.py
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from qasr_tpu.kernels.cm_fused import fused_dw_win_cm, fused_dw_win_i32
from qasr_tpu.kernels.dw_mxu import band_tiles_cm
from qasr_tpu.ops.quant_prims import dyadic_requant_static, requant_clamp
from qasr_tpu.quantize.freeze import cm_mask

B, NT, C, K = 64, 6, 512, 75
BT = B * NT
LAYERS = 5
rng = np.random.default_rng(0)

w_pw = jnp.asarray(rng.integers(-31, 32, (LAYERS, C, C)), jnp.int8)
bias = jnp.asarray(rng.integers(-1000, 1000, (LAYERS, C)), jnp.int32)
m1 = jnp.asarray(rng.integers(2**29, 2**30, (LAYERS, C)), jnp.int32)
m2 = jnp.asarray(rng.integers(2**29, 2**30, (LAYERS, C)), jnp.int32)
E1, E2, BITS = 36, 14, 7
band3, j_min = band_tiles_cm(rng.integers(-31, 32, (K, 1, C)).astype(np.int8), 1, 1, K // 2)
band2 = jnp.asarray(band3.reshape(-1, band3.shape[2]))
lens = jnp.asarray(rng.integers(500, NT * 128, (B,)), jnp.int32)
mask2 = cm_mask(lens, NT).reshape(128, BT).astype(jnp.int32)
x0 = jnp.asarray(rng.integers(-64, 64, (C, 128, BT)), jnp.int8)


@jax.jit
def chain_v0(x, band2, mask2):
    for l in range(LAYERS):
        acc = jax.lax.dot_general(w_pw[l], x.reshape(C, 128, B, NT),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bias[l][:, None, None, None]
        acc = jnp.maximum(acc, 0)
        acc = acc * mask2.reshape(1, 128, B, NT)
        q = requant_clamp(dyadic_requant_static(
            acc, m1[l][:, None, None, None], E1, nonneg=True), BITS)
        x8 = q.astype(jnp.int8).reshape(C, 128, BT)
        # relu on the dw epilogue mirrors v1's relu_out=False + in-relu
        x = fused_dw_win_cm(x8, band2, j_min, B, None, mask2, m2[l], E2,
                            BITS, False)
    return x


@jax.jit
def chain_v1(x, band2, mask2):
    for l in range(LAYERS):
        acc = jax.lax.dot_general(w_pw[l], x.reshape(C, 128, B, NT),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        x = fused_dw_win_i32(acc.reshape(C, 128, BT), band2, j_min, B,
                             bias[l], mask2, m1[l], E1, m2[l], E2, BITS,
                             True, relu_out=False)
    return x


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


if __name__ == "__main__":
    t0 = bench(chain_v0, x0, band2, mask2)
    print(f"v0 xla-requant + int8 kernel : {t0:.3f} ms ({t0/LAYERS:.3f}/layer)")
    t1 = bench(chain_v1, x0, band2, mask2)
    print(f"v1 in-kernel input requant   : {t1:.3f} ms ({t1/LAYERS:.3f}/layer)")
    # numeric parity of the two chains
    a = np.asarray(chain_v0(x0, band2, mask2))
    b = np.asarray(chain_v1(x0, band2, mask2))
    print("bit-identical:", np.array_equal(a, b))
