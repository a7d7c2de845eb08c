"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on the one real TPU chip; tests exercise numerics and
sharding on CPU (XLA host platform) so they are runnable anywhere, mirroring
what the reference repo lacked entirely (SURVEY.md §4: no distributed tests).
"""
import os

# Must be set before jax initializes its backends.  NOTE: this sandbox exports
# JAX_PLATFORMS=axon (the TPU tunnel plugin) and the plugin re-registers
# itself on import, so the env var alone is not enough — we also force the
# config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
