"""Measure a Pallas int8 pw-matmul with a fused integer epilogue
(bias + relu + mask + exact static-e dyadic requant + clamp + int8 store)
against the current XLA pair (dot fusion, then standalone clamp_convert
requant fusion) in the channel-major layout.

The requant chains are 13.6 ms of the 34 ms step and bandwidth-bound:
they read the dot's int32 output from HBM (4 B/elem) and write int8.
Fused into the dot's epilogue the int32 never leaves VMEM, cutting
~7 of 9 B/elem of traffic on every pw site.
"""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_tpu.ops.quant_prims import dyadic_requant_static

C, B, NT = 512, 32, 6
N = 128 * B * NT
E_STATIC = 40
BITS = 6
N_LAYERS = 10
TM, TN = 256, 2048


def _fused_kernel(x_ref, w_ref, b_ref, m_ref, mask_ref, o_ref, *, e, bits, relu):
    acc = jax.lax.dot_general(
        w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + b_ref[:]
    if relu:
        acc = jnp.maximum(acc, 0)
    acc = acc * mask_ref[:]
    q = dyadic_requant_static(acc, m_ref[:], e)
    n = 2 ** (bits - 1) - 1
    o_ref[:] = jnp.clip(q, -n - 1, n).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("e", "bits", "relu"))
def fused_pw(x, w, b, m, mask, *, e, bits, relu):
    cout, cin = w.shape
    n = x.shape[1]
    grid = (cout // TM, n // TN)
    return pl.pallas_call(
        functools.partial(_fused_kernel, e=e, bits=bits, relu=relu),
        out_shape=jax.ShapeDtypeStruct((cout, n), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cin, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, cin), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x, w, b, m, mask)


def xla_layer(x, w, b, m, mask):
    acc = jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc = acc + b
    acc = jnp.maximum(acc, 0)
    acc = acc * mask
    q = dyadic_requant_static(acc, m, E_STATIC)
    n = 2 ** (BITS - 1) - 1
    return jnp.clip(q, -n - 1, n).astype(jnp.int8)


@jax.jit
def chain_xla(x, w, b, m, mask):
    for _ in range(N_LAYERS):
        x = xla_layer(x, w, b, m, mask)
    return x


@jax.jit
def chain_fused(x, w, b, m, mask):
    for _ in range(N_LAYERS):
        x = fused_pw(x, w, b, m, mask, e=E_STATIC, bits=BITS, relu=True)
    return x


def device_ms(fn, *args, calls=6):
    jax.block_until_ready(fn(*args))
    outdir = "/tmp/fusedprof"
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(calls):
            out = fn(*args)
        jax.block_until_ready(out)
    tot = 0.0
    for f in glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            name = ev.get("name", "")
            if (ev.get("ph") == "X" and not name.startswith(
                    ("jit_", "$", "Pjit", "b_", "PyTree", "copy-", "slice-"))
                    and ev.get("tid") is not None
                    and "pid" in ev and ev.get("dur", 0) > 0
                    and name not in ("ParseArguments",)):
                # device lanes only: XLA op events carry 'args' with long_name
                if isinstance(ev.get("args"), dict) and "long_name" in ev["args"]:
                    tot += ev["dur"] / 1e3
    return tot / calls


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-31, 32, (C, C)).astype(np.int8))
    b = jnp.asarray(rng.integers(-1000, 1000, (C, 1)), jnp.int32)
    m = jnp.asarray(rng.integers(2**30, 2**31 - 1, (C, 1)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (1, N)), jnp.int32)
    x = jnp.asarray(rng.integers(-32, 32, (C, N), dtype=np.int8))

    ref = chain_xla(x, w, b, m, mask)
    got = chain_fused(x, w, b, m, mask)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    print("bit-identical: OK")

    ms1 = device_ms(chain_xla, x, w, b, m, mask)
    ms2 = device_ms(chain_fused, x, w, b, m, mask)
    print(f"chain of {N_LAYERS} pw layers (C={C}, N={N}):")
    print(f"  XLA dot + requant fusion: {ms1:.3f} ms ({ms1/N_LAYERS:.4f}/layer)")
    print(f"  Pallas fused epilogue:    {ms2:.3f} ms ({ms2/N_LAYERS:.4f}/layer)")


if __name__ == "__main__":
    main()
