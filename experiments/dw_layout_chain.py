"""Measure a separable-conv chain (requant -> dw -> requant -> pw) in the
current (B, T, C) layout vs a channel-major (C, 128m, B, n_t) interior that
never transposes the dw-dot output.

If channel-major wins materially, FrozenExec grows a channel-major interior
mode; otherwise record the result and stop.
"""
import functools
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dw_mxu_bench import band_tiles

B, T, C, K = 32, 768, 512, 63
PAD = K // 2
N_LAYERS = 10


def requant(z, m, e, bits):
    # static-exponent dyadic requant shape (two-limb form elided: this
    # microbench only measures memory behavior, matching op count/width)
    q = (z.astype(jnp.int64) * m) >> e
    n = 2 ** (bits - 1)
    return jnp.clip(q, -n, n - 1).astype(jnp.int8)


def chain_btc(x, wband, wpw, m1, m2):
    """(B, T, C) layout: dw dot + transpose back, pw as plain dot."""
    n_t = T // 128
    n_d = wband.shape[2] // 128
    for _ in range(N_LAYERS):
        xp = jnp.pad(x, ((0, 0), (PAD, n_d * 128 - T + (n_t - 1) * 128 - PAD + 128), (0, 0)))
        cols = []
        for j in range(n_d):
            sl = jax.lax.slice(xp, (0, j * 128, 0), (B, j * 128 + n_t * 128, C))
            cols.append(sl.reshape(B, n_t, 128, C))
        xg = jnp.concatenate(cols, axis=2)
        y = jax.lax.dot_general(wband, xg, (((2,), (2,)), ((0,), (3,))),
                                preferred_element_type=jnp.int32)
        y = y.transpose(2, 3, 1, 0).reshape(B, n_t * 128, C)[:, :T, :]
        q = requant(y, m1, 40, 8)                     # dw out requant
        z = jax.lax.dot_general(q, wpw, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = requant(z, m2, 40, 8)                     # pw out requant
    return x


def chain_cmaj(x, wband, wpw, m1, m2):
    """Channel-major interior: x (C, 128, B, n_t); dw-dot output used as-is,
    pw contracts C in place; no transposes anywhere."""
    n_t = T // 128
    n_d = wband.shape[2] // 128
    for _ in range(N_LAYERS):
        # halo gather along the tile axis (pad left by PAD inside first tile
        # is ignored here — cost model only; real impl handles edges)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_d)))
        cols = []
        for j in range(n_d):
            cols.append(jax.lax.slice(xp, (0, 0, 0, j), (C, 128, B, j + n_t)))
        xg = jnp.concatenate(cols, axis=1)            # (C, n_d*128, B, n_t)
        xg = xg.reshape(C, n_d * 128, B * n_t)
        y = jax.lax.dot_general(wband, xg, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        y = y.reshape(C, 128, B, n_t)
        q = requant(y, m1[:, None, None, None], 40, 8)
        z = jax.lax.dot_general(wpw, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)  # (Cout, 128, B, n_t)
        x = requant(z, m2[:, None, None, None], 40, 8)
    return x


def device_ms(fn, *args, calls=6):
    jax.block_until_ready(fn(*args))
    outdir = "/tmp/layoutprof"
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(calls):
            out = fn(*args)
        jax.block_until_ready(out)
    tot, n = 0.0, 0
    for f in glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("name", "").startswith("jit_"):
                tot += ev.get("dur", 0) / 1e3
                n += 1
    return tot / max(n, 1)


def main():
    rng = np.random.default_rng(0)
    w_np = rng.integers(-31, 32, (K, 1, C)).astype(np.int8)
    wband = jnp.asarray(band_tiles(w_np, 1, 1))
    wpw = jnp.asarray(rng.integers(-31, 32, (C, C)).astype(np.int8))
    m1 = jnp.asarray(rng.integers(2**20, 2**21, (C,)), jnp.int32)
    m2 = jnp.asarray(rng.integers(2**20, 2**21, (C,)), jnp.int32)
    x_btc = jnp.asarray(rng.integers(-64, 64, (B, T, C), dtype=np.int8))
    x_cm = jnp.asarray(rng.integers(-64, 64, (C, 128, B, T // 128), dtype=np.int8))

    f1 = jax.jit(chain_btc)
    f2 = jax.jit(chain_cmaj)
    ms1 = device_ms(f1, x_btc, wband, wpw, m1, m2)
    ms2 = device_ms(f2, x_cm, wband, wpw, m1, m2)
    print(f"chain of {N_LAYERS} separable layers (dw K={K} C={C} B={B} T={T}):")
    print(f"  (B,T,C) layout:       {ms1:.2f} ms  ({ms1/N_LAYERS:.3f}/layer)")
    print(f"  channel-major layout: {ms2:.2f} ms  ({ms2/N_LAYERS:.3f}/layer)")


if __name__ == "__main__":
    main()
