"""Accurate per-layer device times (trace-based) for all QuartzNet dw shapes:
VPU Pallas kernel vs banded-MXU XLA matmul (int8 / bf16)."""
import functools
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.kernels.depthwise import depthwise_conv_int_pallas
from dw_mxu_bench import band_tiles, dw_mxu, LAYERS


def device_ms(fn, *args, calls=8):
    jax.block_until_ready(fn(*args))
    outdir = "/tmp/dwdev"
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(calls):
            out = fn(*args)
        jax.block_until_ready(out)
    tot = 0.0
    n = 0
    for f in glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("name", "").startswith("jit_"):
                tot += ev.get("dur", 0) / 1e3
                n += 1
    return tot / max(n, 1)


def main():
    rng = np.random.default_rng(0)
    B = int(os.environ.get("B", "32"))
    tot = {"vpu": 0.0, "mxu8": 0.0, "bf16": 0.0}
    print(f"B={B} (device ms per layer, trace-derived)")
    for name, c, k, s, d, t_in, count in LAYERS:
        x = jnp.asarray(rng.integers(-128, 128, (B, t_in, c), dtype=np.int8))
        w_np = rng.integers(-127, 128, (k, 1, c)).astype(np.int8)
        w = jnp.asarray(w_np)
        pad = (k // 2) * d if s == 1 else k // 2
        wband = jnp.asarray(band_tiles(w_np, s, d))
        f_vpu = jax.jit(functools.partial(
            depthwise_conv_int_pallas, stride=s, padding=pad, dilation=d))
        f_mxu8 = jax.jit(functools.partial(
            dw_mxu, k_size=k, stride=s, padding=pad, dilation=d))
        f_bf16 = jax.jit(functools.partial(
            dw_mxu, k_size=k, stride=s, padding=pad, dilation=d,
            acc_dtype=jnp.float32))
        ms = {"vpu": device_ms(f_vpu, x, w),
              "mxu8": device_ms(f_mxu8, x, wband),
              "bf16": device_ms(f_bf16, x, wband)}
        for kk in tot:
            tot[kk] += ms[kk] * count
        print(f"{name:10s} C={c} K={k}: vpu {ms['vpu']:.3f} | "
              f"mxu8 {ms['mxu8']:.3f} | bf16 {ms['bf16']:.3f}  x{count}")
    print(f"\nnet dw totals: vpu {tot['vpu']:.1f} ms | mxu8 {tot['mxu8']:.1f} ms"
          f" | bf16 {tot['bf16']:.1f} ms")


if __name__ == "__main__":
    main()
