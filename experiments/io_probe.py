"""Phase-timing probe for the --io serving loop: where does 1.39 s/batch go
when every component measures <= 62 ms?  Times next(stream) / asarray /
dispatch / block per step."""
import json
import os
import sys
import tempfile
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
from qasr_tpu.data.audio import write_wav
from qasr_tpu.data.dataset import (AudioToCharDataset, DataLoader,
                                   PrefetchLoader)
from qasr_tpu.models.ctc_model import make_frozen_fn


def main(batch=64, n_files=256, seconds=15.0):
    model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
    fn = make_frozen_fn(model, model.freeze(), argmax=True)

    n = int(16000 * seconds)
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="qasr_io_probe_")
    man = os.path.join(tmp, "manifest.json")
    with open(man, "w") as mf:
        for i in range(n_files):
            p = os.path.join(tmp, f"u{i:04d}.wav")
            write_wav(p, (rng.normal(size=n) * 0.1).astype(np.float32))
            mf.write(json.dumps({"audio_filepath": p, "duration": seconds,
                                 "text": "a"}) + "\n")

    ds = AudioToCharDataset(man, labels=[" ", "a"],
                            normalize_transcripts=False, pcm16=True)
    dl = DataLoader(ds, batch_size=batch, drop_last=True, num_workers=8)

    class _Cycle:
        def __iter__(self):
            while True:
                yield from dl

    stream = iter(PrefetchLoader(_Cycle(), prefetch=6))
    audio, alens, _, _ = next(stream)
    jax.block_until_ready(fn(jnp.asarray(audio), jnp.asarray(alens)))

    pending = None
    for step in range(16):
        t0 = time.perf_counter()
        audio, alens, _, _ = next(stream)
        t1 = time.perf_counter()
        a = jnp.asarray(audio)
        l = jnp.asarray(alens)
        t2 = time.perf_counter()
        out = fn(a, l)
        t3 = time.perf_counter()
        if pending is not None:
            jax.block_until_ready(pending)
        pending = out
        t4 = time.perf_counter()
        print(f"step {step:2d}: next {1e3*(t1-t0):7.1f}  asarray "
              f"{1e3*(t2-t1):7.1f}  dispatch {1e3*(t3-t2):7.1f}  "
              f"block_prev {1e3*(t4-t3):7.1f} ms")
    jax.block_until_ready(pending)


if __name__ == "__main__":
    main()
