"""Decompose the --io serving bench's chip-busy fraction (PERF round 3d).

Measures, separately and on the same wav set bench.py --io uses:
  1. host pipeline only: manifest -> wav decode -> collate (PrefetchLoader),
     no device involvement, in PCM GB/s;
  2. host->device transfer only: jnp.asarray(batch) + block, float32 and
     int16 payloads, in GB/s over the link (the axon tunnel here; PCIe on a
     real host);
  3. device step time for the frozen W6A6 encoder at the same batch.

The chip-busy fraction of a serving loop is bounded by
device_step / (device_step + max(0, transfer - overlap) + host_gap); this
script attributes the observed gap to its source.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=64, n_files=256, seconds=15.0, reps=6):
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from qasr_tpu.data.audio import write_wav
    from qasr_tpu.data.dataset import (AudioToCharDataset, DataLoader,
                                       PrefetchLoader)

    n = int(16000 * seconds)
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="qasr_io_decomp_")
    man = os.path.join(tmp, "manifest.json")
    with open(man, "w") as mf:
        for i in range(n_files):
            p = os.path.join(tmp, f"u{i:04d}.wav")
            write_wav(p, (rng.normal(size=n) * 0.1).astype(np.float32))
            mf.write(json.dumps({"audio_filepath": p, "duration": seconds,
                                 "text": "a"}) + "\n")

    workers = int(os.environ.get("QASR_IO_THREADS", "4"))

    # --- 1. host pipeline only -------------------------------------------
    for pcm16 in (False, True):
        ds = AudioToCharDataset(man, labels=[" ", "a"],
                                normalize_transcripts=False, pcm16=pcm16)

        def loader():
            return PrefetchLoader(
                DataLoader(ds, batch_size=batch, drop_last=True,
                           num_workers=workers), prefetch=6)

        for _ in loader():   # warm the page cache / parser
            pass
        t0 = time.perf_counter()
        nb = 0
        pcm = 0
        for audio, alens, _, _ in loader():
            nb += 1
            pcm += int(np.sum(alens)) * audio.dtype.itemsize
        host_wall = time.perf_counter() - t0
        host_gbs = pcm / host_wall / 1e9
        print(f"host pipeline ({'i16' if pcm16 else 'f32'}): {nb} batches "
              f"in {host_wall:.2f}s = {host_gbs:.3f} GB/s PCM "
              f"({workers} workers)")

    # --- 2. transfer only (values irrelevant, bytes are the point) -------
    a16 = np.ascontiguousarray(audio.astype(np.int16))
    a32 = a16.astype(np.float32) / 32768.0
    for name, arr in [("f32", a32), ("i16", a16)]:
        jax.block_until_ready(jnp.asarray(arr))  # warm shape
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(jnp.asarray(arr))
        dt = (time.perf_counter() - t0) / reps
        print(f"transfer {name}: {arr.nbytes/1e6:.1f} MB in {dt*1e3:.1f} ms "
              f"= {arr.nbytes/dt/1e9:.3f} GB/s")

    # --- 3. device step --------------------------------------------------
    from __graft_entry__ import _calibrated_frozen_quartznet
    from qasr_tpu.models.ctc_model import make_frozen_fn

    model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
    fn = make_frozen_fn(model, model.freeze(), argmax=True)
    a_dev = jnp.asarray(a32)
    l_dev = jnp.asarray(alens)
    jax.block_until_ready(fn(a_dev, l_dev))
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn(a_dev, l_dev)
    jax.block_until_ready(out)
    dev_step = (time.perf_counter() - t0) / 8
    audio_sec = float(np.sum(alens)) / 16000.0
    print(f"device step: {dev_step*1e3:.1f} ms for {audio_sec:.0f} audio-s "
          f"(device-only RTFx {audio_sec/dev_step:.0f})")


if __name__ == "__main__":
    main()
