"""Experiment: depthwise conv on the MXU via banded-Toeplitz batched matmul.

The frozen QuartzNet step spends ~56% of its time (33 ms of 59 ms at B=32)
in VPU int32-MAC-bound Pallas depthwise kernels while the MXU idles.  A
depthwise conv y[b,t,c] = sum_k x[b, s*t + k*d - pad, c] * w[k,c] can be
written, per 128-frame output tile, as a channel-batched matmul

    Y[c, m, (i,b)] = sum_r W[c, m, r] * X[c, r, (i,b)]

where W[c] is a 128 x (n_d*128) banded-Toeplitz matrix built from w[:, c]
(precomputable at freeze time) and X gathers n_d overlapping 128-row input
tiles.  int8 x int8 -> int32 on the MXU is exact, so this is bit-identical
to the VPU kernel.  MAC waste = (n_d*128)/K band padding, but the MXU has
~100x the VPU's int MAC throughput.

Measures: current Pallas VPU kernel vs banded-MXU (int8 and bf16) for each
distinct QuartzNet15x5 depthwise shape, plus bit-identity checks.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.kernels.depthwise import depthwise_conv_int_pallas
from qasr_tpu.models.jasper import _depthwise_conv_int


def band_tiles(w: np.ndarray, stride: int, dilation: int) -> np.ndarray:
    """w: (K, 1, C) int -> (C, 128, n_d*128) banded-Toeplitz weight tiles.

    W[c, m, j*128 + r] = w[k, c] where s*m + k*d == j*128 + r.
    """
    k_size, _, c = w.shape
    span = stride * 127 + dilation * (k_size - 1)
    n_d = span // 128 + 1
    out = np.zeros((c, 128, n_d * 128), w.dtype)
    for m in range(128):
        for k in range(k_size):
            col = stride * m + k * dilation
            out[:, m, col] = w[k, 0, :]
    return out


def dw_mxu(x, wband, *, k_size: int, stride: int, padding: int, dilation: int,
           acc_dtype=jnp.int32):
    """x: (B, T, C) int8; wband: (C, 128, n_d*128). Returns (B, T_out, C) int32."""
    b, t_in, c = x.shape
    n_d = wband.shape[2] // 128
    t_out = (t_in + 2 * padding - dilation * (k_size - 1) - 1) // stride + 1
    n_t = -(-t_out // 128)
    need = (n_d - 1) * 128 + n_t * 128 * stride
    xp = jnp.pad(x, ((0, 0), (padding, need - t_in - padding), (0, 0)))
    # X[(j,r)] tiles: for offset j, rows i*128*s + j*128 + r
    cols = []
    for j in range(n_d):
        sl = jax.lax.slice(xp, (0, j * 128, 0),
                           (b, j * 128 + n_t * 128 * stride, c))
        sl = sl.reshape(b, n_t, 128 * stride, c)[:, :, :128, :]
        cols.append(sl)
    xg = jnp.concatenate(cols, axis=2)  # (B, n_t, n_d*128, C)
    if acc_dtype == jnp.float32:
        wband = wband.astype(jnp.bfloat16)
        xg = xg.astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        wband, xg,
        dimension_numbers=(((2,), (2,)), ((0,), (3,))),
        preferred_element_type=acc_dtype)  # (C, 128, B, n_t)
    y = y.transpose(2, 3, 1, 0).reshape(b, n_t * 128, c)
    if acc_dtype == jnp.float32:
        y = y.astype(jnp.int32)
    return y[:, :t_out, :]


LAYERS = [
    # (name, C, K, stride, dilation, T_in, count_in_net)
    ("C1 s2", 256, 33, 2, 1, 1536, 1),
    ("B1 k33", 256, 33, 1, 1, 768, 15),
    ("B2 k39", 256, 39, 1, 1, 768, 15),
    ("B3 k51", 512, 51, 1, 1, 768, 15),
    ("B4 k63", 512, 63, 1, 1, 768, 15),
    ("B5 k75", 512, 75, 1, 1, 768, 15),
    ("C2 k87d2", 512, 87, 1, 2, 768, 1),
]


def timeit(fn, x, w, reps=16, iters=5):
    """Device ms per application: `reps` applications inside one jit (the
    axon tunnel costs ~1.5-3.5 ms per dispatch, so per-call timing is all
    overhead).  Inputs are perturbed per rep to defeat CSE; outputs reduced
    to one scalar so transfer cost is negligible."""

    @jax.jit
    def many(x, w):
        acc = jnp.zeros((), jnp.int32)
        for i in range(reps):
            y = fn(jnp.bitwise_xor(x, jnp.int8(i)), w)
            acc = acc + y.astype(jnp.int32).sum()
        return acc

    jax.block_until_ready(many(x, w))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(many(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    B = 32
    tot = {"vpu": 0.0, "mxu8": 0.0, "mxu16": 0.0}
    print(f"backend={jax.default_backend()} B={B}")
    for name, c, k, s, d, t_in, count in LAYERS:
        x = jnp.asarray(rng.integers(-128, 128, (B, t_in, c), dtype=np.int8))
        w_np = rng.integers(-127, 128, (k, 1, c)).astype(np.int8)
        w = jnp.asarray(w_np)
        pad = (k // 2) * d if s == 1 else k // 2
        ref = jax.jit(_depthwise_conv_int, static_argnums=(2, 3, 4))(
            x, w, s, pad, d)
        wband = jnp.asarray(band_tiles(w_np, s, d))

        f_mxu8 = jax.jit(functools.partial(
            dw_mxu, k_size=k, stride=s, padding=pad, dilation=d))
        f_mxu16 = jax.jit(functools.partial(
            dw_mxu, k_size=k, stride=s, padding=pad, dilation=d,
            acc_dtype=jnp.float32))
        got8 = f_mxu8(x, wband)
        got16 = f_mxu16(x, wband)
        ok8 = bool(jnp.array_equal(ref, got8))
        ok16 = bool(jnp.array_equal(ref, got16))

        f_vpu = jax.jit(functools.partial(
            depthwise_conv_int_pallas, stride=s, padding=pad, dilation=d))
        ms_vpu = timeit(f_vpu, x, w)
        ms_8 = timeit(f_mxu8, x, wband)
        ms_16 = timeit(f_mxu16, x, wband)
        tot["vpu"] += ms_vpu * count
        tot["mxu8"] += ms_8 * count
        tot["mxu16"] += ms_16 * count
        print(f"{name:10s} C={c} K={k} s={s} d={d}: vpu {ms_vpu:6.3f} ms | "
              f"mxu-int8 {ms_8:6.3f} ms (exact={ok8}) | "
              f"mxu-bf16 {ms_16:6.3f} ms (exact={ok16}) | x{count}")
    print(f"\nnet totals (77 layers): vpu {tot['vpu']:.1f} ms | "
          f"mxu-int8 {tot['mxu8']:.1f} ms | mxu-bf16 {tot['mxu16']:.1f} ms")


if __name__ == "__main__":
    main()
