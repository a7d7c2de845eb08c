"""Streaming serving latency on the real chip (PERF round 3d):
StreamingTranscriber.latency_report at realtime-ish chunk sizes, greedy and
C++ beam, on the frozen W6A6 QuartzNet15x5.  Records first-partial latency,
steady per-chunk latency, and sustained streaming RTFx."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _calibrated_frozen_quartznet
from qasr_tpu.decode.streaming import StreamingTranscriber


def main():
    model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=16000 * 60) * 0.1).astype(np.float32)
    for chunk_frames in (100, 200, 400, 800):
        st = StreamingTranscriber(model, chunk_frames=chunk_frames)
        for beam in (False, True):
            rep = st.latency_report(audio, beam=beam, beam_width=16)
            rep2 = st.latency_report(audio, beam=beam, beam_width=16)  # warm
            rep2["requested_chunk_s"] = chunk_frames / 100.0
            rep2["mode"] = "beam" if beam else "greedy"
            print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                              for k, v in rep2.items()}))


if __name__ == "__main__":
    main()
