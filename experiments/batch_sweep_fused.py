"""Batch-size sweep of the CURRENT serving default (CM-fused executor via
make_frozen_fn) — re-checks the B=64 optimum after the round-2e/3c kernel
changes.  Device-only timing, async dispatch, best-of-3 windows."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from __graft_entry__ import _calibrated_frozen_quartznet
from qasr_tpu.models.ctc_model import make_frozen_fn


def main():
    model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
    fn = make_frozen_fn(model, model.freeze(), argmax=True)
    seconds = 15.0
    n = int(16000 * seconds)
    rng = np.random.default_rng(0)
    for batch in (32, 48, 64, 96, 128):
        audio = jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32) * 0.1)
        lens = jnp.full((batch,), n, jnp.int32)
        jax.block_until_ready(fn(audio, lens))
        best = float("inf")
        for _ in range(3):
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(audio, lens)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        rtfx = batch * seconds / best
        print(f"B={batch:3d}: {best*1e3:7.2f} ms/step  RTFx {rtfx:8.0f}")


if __name__ == "__main__":
    main()
