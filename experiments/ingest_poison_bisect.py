"""Bisect which part of the frozen serving path trips the axon-tunnel
host->device bandwidth degradation (PERF.md round 3d: executing a jit with
captured device-constant buffers permanently drops uploads ~70x).

Round 3d moved model tables to host numpy and re-validated 5 GB/s after a
full fused forward — yet the round-3 serving probe (seq fn3 steps) still
measured 0.044 GB/s.  This script re-runs the bisect against the CURRENT
code, stage by stage, inside one process:

  stage 0: fresh process                       -> upload probe
  stage 1: build model + freeze + fn3 + bands  -> upload probe
  stage 2: run the mel frontend jit            -> upload probe
  stage 4: run full fn3 (audio, lens, bands)   -> upload probe

Result (2026-08-17): stage 0 already measures ~0.04 GB/s — the degraded
mode is now the tunnel server's resting state, independent of anything
this process executes.  See PERF.md round 3e.

Usage: python experiments/ingest_poison_bisect.py
Env: QASR_CM_FUSED etc. respected as usual.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(0)
PCM = RNG.integers(-3000, 3000, (64, 16000 * 15)).astype(np.int16)  # 30.7 MB


def upload_probe(tag):
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        d = jnp.asarray(PCM)
        np.asarray(d[0, :1])
        best = min(best, time.perf_counter() - t0)
        del d
    print(f"[{tag}] upload: {PCM.nbytes / best / 1e9:.3f} GB/s "
          f"({best * 1e3:.0f} ms)", flush=True)


upload_probe("stage0 fresh")

from __graft_entry__ import _calibrated_frozen_quartznet
from qasr_tpu.models.ctc_model import make_frozen_fn

model = _calibrated_frozen_quartznet()
fn3, bands = make_frozen_fn(model, model.freeze(), argmax=True,
                            return_band_args=True)
upload_probe("stage1 build+bands")

lens = np.full((64,), 16000 * 15, np.int32)
feats, feat_lens = jax.jit(lambda a, l: model.frontend(
    a.astype(jnp.float32) * jnp.float32(2.0 ** -15), l, dither=0.0))(
        jnp.asarray(PCM), jnp.asarray(lens))
np.asarray(feat_lens[:1])
upload_probe("stage2 frontend")

a = jnp.asarray(PCM)
l = jnp.asarray(lens)
out = fn3(a, l, bands)
np.asarray(out[1][:1])
upload_probe("stage4 full fn3")

# And once more after a second exec (rule out first-exec-only effects)
out = fn3(a, l, bands)
np.asarray(out[1][:1])
upload_probe("stage4b second exec")
