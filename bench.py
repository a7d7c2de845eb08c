"""Benchmark: frozen W6A6 QuartzNet15x5 integer inference throughput.

Measures RTFx = seconds of audio processed per wall-clock second on one TPU
chip, end-to-end (mel frontend + int8 encoder + decoder + greedy argmax).
The reference publishes no throughput numbers (BASELINE.md); the north-star
target is >=20x real-time per v5e chip (BASELINE.json), so
vs_baseline = rtfx / 20.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compilation cache: the ~300 s whole-model compile happens
    # once per shape, later bench runs start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _calibrated_frozen_quartznet
    from qasr_tpu.models.ctc_model import make_frozen_fn

    model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
    # host-numpy tables closed over as constants: the static-exponent dyadic
    # shifts must stay Python ints (compile-time constants); the banded
    # MXU depthwise tiles ride as jit runtime args inside make_frozen_fn
    fn = make_frozen_fn(model, model.freeze(), argmax=True)

    # batch 64 x 15 s: the best-measured serving configuration on one v5e
    # with the fused dw kernels (B=32: 12948, B=64: 15822, B=96: 14762 —
    # bigger bt amortizes the kernels' per-grid-step fixed costs until
    # HBM working-set effects take over)
    batch = 64
    seconds = 15.0
    n = int(16000 * seconds)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32) * 0.1)
    lengths = jnp.full((batch,), n, jnp.int32)

    # warmup/compile
    jax.block_until_ready(fn(audio, lengths))
    jax.block_until_ready(fn(audio, lengths))

    # best of 3 windows: the axon tunnel's dispatch jitter occasionally
    # stretches one window; steady-state device time is what we report
    iters = 12
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(audio, lengths)
        jax.block_until_ready(out)
        elapsed = min(elapsed, time.perf_counter() - t0)

    audio_seconds = batch * seconds * iters
    rtfx = audio_seconds / elapsed
    print(json.dumps({
        "metric": "quartznet15x5_w6a6_int8_rtfx_per_chip",
        "value": round(rtfx, 2),
        "unit": "audio_sec/sec",
        "vs_baseline": round(rtfx / 20.0, 3),
    }))


if __name__ == "__main__":
    # the axon tunnel occasionally drops a request mid-run; one retry makes
    # the driver's bench robust to that transient
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        main()
