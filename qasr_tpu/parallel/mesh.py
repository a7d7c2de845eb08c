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


# Leaf names that are per-out-channel vectors in the param/table pytrees:
# conv bias, BN affine/stats (params), int32 bias (frozen tables).
_CHANNEL_VECTOR_LEAVES = ("b", "gamma", "beta", "mean", "var")


def _leaf_name(path) -> str:
    key = path[-1]
    return getattr(key, "key", getattr(key, "name", str(key)))


def param_specs(params, mesh: Mesh):
    """Explicit TP sharding plan, derived from pytree paths (not shapes).

    Only two leaf classes shard on 'model':
      * 'w' conv kernels, laid out (K, Cin/groups, Cout) — out-channels on
        the last axis, so pointwise convs become N-sharded MXU matmuls;
      * per-out-channel vectors ('b', BN gamma/beta/mean/var).
    Everything else (decoder head — its Cout is the vocab, not divisible —
    time-axis intermediates, scalars) is replicated.  XLA SPMD inserts the
    all-gathers/reduces this layout implies.
    """
    tp = mesh.shape["model"]

    def spec(path, x):
        name = _leaf_name(path)
        nd = getattr(x, "ndim", None)
        if tp > 1 and name == "w" and nd == 3 and x.shape[-1] % tp == 0 \
                and path and getattr(path[0], "key", None) != "decoder":
            return P(None, None, "model")
        if tp > 1 and name in _CHANNEL_VECTOR_LEAVES and nd == 1 \
                and x.shape[0] % tp == 0 \
                and path and getattr(path[0], "key", None) != "decoder":
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def conformer_param_specs(params, mesh: Mesh):
    """Megatron-style TP plan for the Conformer encoder pytree
    (models/conformer.py::init_conformer_params).

    Sharded on 'model':
      * feed-forward: l1 column-parallel (w last axis + bias), l2
        row-parallel (w first axis) — XLA SPMD inserts the one all-reduce
        after l2;
      * attention: q/k/v/pos column-parallel = head-parallel (the
        (B,T,d)->(B,T,h,d_k) reshape carries the sharding onto heads),
        out row-parallel; pos_bias_u/v head-sharded to match.
    Replicated: the conv module (depthwise — HBM-bound, not MXU-bound, and
    its GLU split would straddle a sharded 2d axis), layernorms, the
    subsampler, and any decoder/head subtree.  Leaves whose sharded axis is
    not divisible by tp fall back to replication (never a wrong answer,
    only a slower one).
    """
    tp = mesh.shape["model"]

    def spec(path, x):
        names = [getattr(p, "key", None) for p in path]
        names = [n for n in names if isinstance(n, str)]
        nd = getattr(x, "ndim", 0)
        if tp == 1 or not names or names[0] == "decoder":
            return P()

        def div(axis):
            return x.shape[axis] % tp == 0

        leaf = names[-1]
        if "ff1" in names or "ff2" in names:
            if "l1" in names:
                if leaf == "w" and nd == 2 and div(1):
                    return P(None, "model")
                if leaf == "b" and nd == 1 and div(0):
                    return P("model")
            if "l2" in names and leaf == "w" and nd == 2 and div(0):
                return P("model", None)
        if "att" in names:
            if any(k in names for k in ("q", "k", "v", "pos")):
                if leaf == "w" and nd == 2 and div(1):
                    return P(None, "model")
                if leaf == "b" and nd == 1 and div(0):
                    return P("model")
            if "out" in names and leaf == "w" and nd == 2 and div(0):
                return P("model", None)
        if leaf in ("pos_bias_u", "pos_bias_v") and nd == 2 and div(0):
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_conformer_params(params, mesh: Mesh):
    """Place Conformer(-CTC) params per `conformer_param_specs`.  Accepts
    either the encoder subtree or the full {'encoder','decoder'} tree."""
    specs = conformer_param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_params_channelwise(params, mesh: Mesh):
    """Place conv weights with out-channels on the 'model' axis (TP) per the
    explicit `param_specs` plan.  With model=1 this is plain replication."""
    specs = param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_frozen_tables(tables, mesh: Mesh):
    """Channel-shard a frozen integer model (quantize/freeze.py tables):
    int8 conv kernels on their out-channel axis, int32 biases channelwise;
    requant vectors/scalars and the decoder replicated.  Static exponents
    ('act_e'/'e' python ints) must stay host ints — they are compile-time
    shift constants — so non-array leaves pass through untouched."""
    specs = param_specs(tables, mesh)

    def place(x, s):
        if not isinstance(x, np.ndarray) and not isinstance(x, jax.Array):
            return x  # python ints (static exponents), None
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(place, tables, specs)


# frozen Conformer GEMM sites (quantize/conformer_freeze.py tables):
# column-parallel = out axis sharded (q/k/v head-parallel, FF l1, GLU pw1);
# row-parallel = contraction axis sharded — int32 partial sums all-reduce
# BEFORE the requant, which is exact (integer adds have no reduction-order
# drift), so ANY placement from this plan is bit-identical to single-device.
_CONF_FROZEN_COL = ("ff1_l1", "ff2_l1", "att_q_u", "att_q_v", "att_k",
                    "att_v", "pw1_a", "pw1_g")
_CONF_FROZEN_ROW = ("ff1_l2", "ff2_l2", "att_out", "pw2")


def conformer_frozen_specs(tables, mesh: Mesh):
    """TP sharding plan for frozen integer Conformer tables
    (freeze_conformer output): int8 GEMM weights column-/row-parallel on
    'model', per-out-channel int32 bias/multiplier vectors sharded with
    their site, depthwise kernel + BN-fold vectors channel-sharded.
    Non-divisible or scalar leaves replicate."""
    tp = mesh.shape["model"]

    def spec(path, x):
        nd = getattr(x, "ndim", None)
        if tp == 1 or nd is None:
            return P()
        names = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        site = next((n for n in names if n in _CONF_FROZEN_COL
                     or n in _CONF_FROZEN_ROW), None)
        leaf = names[-1]
        if site in _CONF_FROZEN_COL:
            if leaf == "w" and nd == 2 and x.shape[1] % tp == 0:
                return P(None, "model")
            if leaf in ("b", "m") and nd == 1 and x.shape[0] % tp == 0:
                return P("model")
        if site in _CONF_FROZEN_ROW and leaf == "w" and nd == 2 \
                and x.shape[0] % tp == 0:
            return P("model", None)
        if "att_pos_w" in names:
            if nd == 2 and x.shape[1] % tp == 0:
                return P(None, "model")
            if nd == 1 and x.shape[0] % tp == 0:
                return P("model")
        if "dw_w" in names and nd == 3 and x.shape[2] % tp == 0:
            return P(None, None, "model")
        if "dw_bn" in names and nd == 1 and x.shape[0] % tp == 0:
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, tables)


def shard_frozen_conformer_tables(tables, mesh: Mesh):
    """Place frozen Conformer tables per `conformer_frozen_specs`; python
    scalars (static exponents/scales) pass through untouched."""
    specs = conformer_frozen_specs(tables, mesh)

    def place(x, s):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x  # python scalars: static exponents / scales
        if getattr(x, "dtype", None) == np.float64:
            # float64 leaves (e.g. att_pos_w's weight scale) are TRACE-TIME
            # inputs to dyadic table building — they must stay host numpy
            return x
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(place, tables, specs)


def replicate_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params)


def psum_counters(scores: int, words: int, mesh: Optional[Mesh] = None):
    """Sum WER counters across processes (replaces torchmetrics
    dist_sync_on_step sum-reduction, wer.py:106,114-115).

    Counters are host-local python ints accumulated by each process over its
    data shard; the reduction is a cross-process all-gather + sum.  In a
    single-process run (including single-process multi-device meshes, where
    the eval loop already saw every example once) this is the identity."""
    if jax.process_count() == 1:
        return int(scores), int(words)
    from jax.experimental import multihost_utils

    local = np.asarray([scores, words], np.int64)
    total = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
    return int(total[0]), int(total[1])
