"""Profile one dw layer: VPU Pallas kernel vs banded-MXU matmul, exact
device op times from the jax.profiler trace."""
import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.kernels.depthwise import depthwise_conv_int_pallas
from dw_mxu_bench import band_tiles, dw_mxu


def trace_ops(fn, *args, outdir):
    jax.block_until_ready(fn(*args))
    with jax.profiler.trace(outdir):
        for _ in range(8):
            out = fn(*args)
        jax.block_until_ready(out)
    # parse the trace proto -> chrome trace json
    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    tot = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            # device ops only: heuristic—names like fusion/copy/dot etc.
            cat = ev.get("args", {}).get("long_name", "")
            tot.setdefault(name, [0, 0.0])
            tot[name][0] += 1
            tot[name][1] += dur / 1e3
    return tot


def main():
    rng = np.random.default_rng(0)
    B, t_in, c, k, s, d = 32, 768, 512, 75, 1, 1
    pad = k // 2
    x = jnp.asarray(rng.integers(-128, 128, (B, t_in, c), dtype=np.int8))
    w_np = rng.integers(-127, 128, (k, 1, c)).astype(np.int8)
    w = jnp.asarray(w_np)
    wband = jnp.asarray(band_tiles(w_np, s, d))

    f_vpu = jax.jit(functools.partial(
        depthwise_conv_int_pallas, stride=s, padding=pad, dilation=d))
    f_mxu8 = jax.jit(functools.partial(
        dw_mxu, k_size=k, stride=s, padding=pad, dilation=d))
    f_bf16 = jax.jit(functools.partial(
        dw_mxu, k_size=k, stride=s, padding=pad, dilation=d,
        acc_dtype=jnp.float32))

    for name, fn, args in [("vpu", f_vpu, (x, w)), ("mxu8", f_mxu8, (x, wband)),
                           ("bf16", f_bf16, (x, wband))]:
        outdir = f"/tmp/dwprof_{name}"
        os.system(f"rm -rf {outdir}")
        tot = trace_ops(fn, *args, outdir=outdir)
        print(f"=== {name} (8 calls, ms totals) ===")
        for op, (n, ms) in sorted(tot.items(), key=lambda kv: -kv[1][1])[:12]:
            if ms > 0.05:
                print(f"  {ms/8:8.3f} ms/call x? ({n} evs) {op[:90]}")


if __name__ == "__main__":
    main()
