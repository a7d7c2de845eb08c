"""Persistent XLA compilation cache setup shared by every CLI entry point.

The frozen whole-model compile costs minutes on TPU (hundreds of fused
kernels + Pallas lowering); with the persistent cache a second run of the
same CLI on the same shapes starts in seconds.  The reference gets this for
free from torch's eager kernels; under XLA's trace-and-compile model the
cache is the equivalent UX, so every `qasr_tpu.cli.*` main() calls
``setup_compile_cache()`` before touching jax.

Env:
  QASR_COMPILE_CACHE=<dir>  cache directory (default
                            ~/.cache/qasr_tpu/jax_cache)
  QASR_COMPILE_CACHE=0      disable entirely
"""
from __future__ import annotations

import os


def setup_compile_cache(min_compile_secs: float = 1.0) -> str | None:
    """Point jax at a persistent on-disk compilation cache.  Returns the
    cache dir, or None when disabled.  Safe to call more than once and
    before/after jax backend init (it only sets config values)."""
    flag = os.environ.get("QASR_COMPILE_CACHE", "")
    if flag == "0":
        return None
    cache_dir = flag or os.path.join(
        os.path.expanduser("~"), ".cache", "qasr_tpu", "jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
