"""Sharded evaluation / calibration / synthesis over a device mesh.

The reference's only parallelism is PTL DDP data-parallel training
(SURVEY.md §2.4).  Here evaluation also scales two extra ways the reference
cannot:

  * batch ('data' axis) sharding — the DDP equivalent for inference; WER
    counters are summed on host per shard (psum when multi-process);
  * time ('model' axis) sharding — long-audio context parallelism: the
    convolutional encoder's time axis is sharded across the mesh and XLA's
    spatial partitioner inserts the halo exchanges (= receptive-field
    overlap, kernel//2*dilation per conv) automatically.  This is the
    capability SURVEY.md §2.4 lists as absent upstream.

The synthesizer's independent problems shard over 'data' the same way
(distill_data.py:82 is single-GPU in the reference).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qasr_tpu.models.jasper import encoder_forward
from qasr_tpu.quantize.freeze import FrozenExec


# ---------------------------------------------------------------------------
# Channel-major fast path under the mesh (shard_map)
# ---------------------------------------------------------------------------
#
# The serving-default executors (FrozenExecCM / FrozenExecCMF with the fused
# Pallas dw kernels) cannot ride XLA's automatic SPMD partitioner — custom
# calls have no sharding rules — so the sharded fast path runs the whole
# forward inside `shard_map`, where every op (including pallas_call) works on
# the device-local block and collectives are explicit:
#   data axis  — batch sharding, no communication (DP);
#   model axis — out-channel sharding (TP): depthwise convs / requants /
#                residual adds are per-channel (local), pointwise dots
#                all-gather their int8 inputs along 'model' (the bytes-
#                minimal point: after requant+narrow) against out-channel-
#                sharded weights — one int8 all-gather per pw conv, the
#                Megatron-style row/column alternation for separable stacks.
# Bit-identity: gathers/slices are exact, the integer math is unchanged, and
# each epilogue sees the same values as the single-device run.


def _localize_tables_cm(tables, axis_name: str, tp: int):
    """Per-device view of the frozen tables for channel-sharded (TP)
    execution inside shard_map: every per-channel array leaf is sliced to
    this device's channel shard (conv kernels on their out-channel axis,
    biases / requant mantissas / out_scales on their channel axis); scalars
    and static exponents (python ints) pass through untouched.  The decoder
    head stays replicated (its out axis is the vocabulary) except its input
    requant mantissa, which matches the channel-sharded encoder output."""
    idx = jax.lax.axis_index(axis_name)

    def sl(x, axis):
        x = jnp.asarray(x)
        if x.shape[axis] % tp:
            raise ValueError(
                f"TP requires channel counts divisible by {tp}; got "
                f"{x.shape} axis {axis}")
        cl = x.shape[axis] // tp
        return jax.lax.dynamic_slice_in_dim(x, idx * cl, cl, axis=axis)

    def conv_entry(e, out_sharded: bool = True):
        out = dict(e)
        if out_sharded:
            if "w" in e:
                out["w"] = sl(e["w"], 2)
            if "b" in e:
                out["b"] = sl(e["b"], 0)
            if np.ndim(e.get("out_scale")) == 1:
                out["out_scale"] = sl(e["out_scale"], 0)
        if "act_m" in e and np.ndim(e["act_m"]) == 1:
            out["act_m"] = sl(e["act_m"], 0)
        return out

    out = {"blocks": [], "dyadic16": tables.get("dyadic16", False)}
    for tb in tables["blocks"]:
        lb = {"convs": [conv_entry(e) if e is not None else None
                        for e in tb["convs"]],
              "res": [conv_entry(e) if e is not None else None
                      for e in tb["res"]],
              "res_act": []}
        for e in tb["res_act"]:
            le = dict(e)
            for k in ("m", "m_r"):
                if np.ndim(e[k]) == 1:
                    le[k] = sl(e[k], 0)
            lb["res_act"].append(le)
        out["blocks"].append(lb)
    dec = dict(tables["decoder"])
    if np.ndim(dec.get("act_m")) == 1:
        dec["act_m"] = sl(dec["act_m"], 0)
    out["decoder"] = dec
    return out


def make_sharded_frozen_forward_cm(model, tables, mesh: Mesh,
                                   shard_channels: bool = False,
                                   shard_time: bool = False,
                                   fused: Optional[bool] = None):
    """Sharded frozen forward on the channel-major fast path (the serving
    default of make_frozen_fn): banded-MXU depthwise + fused Pallas
    dot/requant kernels, run per-shard inside shard_map.

    Batch shards on 'data'.  shard_channels=True additionally runs
    out-channel TP over 'model' (bands + table vectors sharded, one int8
    all-gather per pointwise conv); shard_time=True instead shards the time
    tiles over 'model' (SP), with depthwise convs ppermute-exchanging their
    halo tiles.  Bit-identical to the single-device fast path.  Returns
    fn(audio (B, L), lens (B,)) -> (ids, enc_lens).
    """
    from jax import shard_map

    from qasr_tpu.models.ctc_model import _conv_t, _plan_total_stride
    from qasr_tpu.models.jasper import pad_frames_aligned
    from qasr_tpu.quantize.freeze import (
        FrozenExecCM, FrozenExecCMF, _tables_to_host, build_dw_bands_cm,
        plan_supports_cm, tables_all_static_e,
    )

    frontend, plan, qcfg = model.frontend, model.plan, model.qcfg
    if not plan_supports_cm(plan, qcfg):
        raise ValueError("plan is not channel-major eligible "
                         "(plan_supports_cm)")
    if shard_channels and shard_time:
        raise ValueError("TP and SP both use the 'model' axis; pick one")
    if fused is None:
        fused = tables_all_static_e(tables)
    tp = mesh.shape["model"] if shard_channels else 1
    tp_axis = "model" if tp > 1 else None
    sp = mesh.shape["model"] if shard_time else 1
    sp_axis = "model" if sp > 1 else None

    bands_np, jmins = build_dw_bands_cm(plan, tables)
    if fused:
        # 2D (C*128, n_d*128) so jit-parameter layouts stay default
        bands = {k: jnp.asarray(v.reshape(-1, v.shape[2]))
                 for k, v in bands_np.items()}
        band_spec = {k: P("model", None) if tp > 1 else P()
                     for k in bands}
    else:
        bands = {k: jnp.asarray(v) for k, v in bands_np.items()}
        band_spec = {k: P("model", None, None) if tp > 1 else P()
                     for k in bands}
    # host numpy, NOT device_put: executors close over the tables, and
    # pre-committed device arrays become captured-constant buffers in the
    # executable — the exact pattern that degrades host->device bandwidth
    # ~70x under the axon tunnel (freeze._tables_to_host, PERF.md round 3d).
    dt = _tables_to_host(tables)
    # frames pad to a tile multiple at every stride level on every shard
    mult = 128 * _plan_total_stride(plan) * sp

    def local_fwd(audio, lens, dw_bands):
        feats, feat_lens = frontend(audio, lens, dither=0.0)
        feats = pad_frames_aligned(feats, mult)
        lt = _localize_tables_cm(dt, tp_axis, tp) if tp > 1 else dt
        cls = FrozenExecCMF if fused else FrozenExecCM
        fx = cls(lt, qcfg, activation=plan.activation,
                 dw_bands=dw_bands, dw_jmins=jmins,
                 tp_axis=tp_axis, tp_size=tp, sp_axis=sp_axis, sp_size=sp)
        enc, enc_lens = encoder_forward(fx, plan, feats, feat_lens)
        lp = fx.decoder(enc)
        return jnp.argmax(lp, axis=-1), enc_lens

    if tp > 1:
        bands = {k: jax.device_put(v, NamedSharding(mesh, band_spec[k]))
                 for k, v in bands.items()}
    # SP: the ids' time axis is tile-sharded over 'model'
    ids_spec = P("data", "model") if sp > 1 else P("data")
    fn = jax.jit(shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P("data"), P("data"), band_spec),
        out_specs=(ids_spec, P("data")),
        check_vma=False,
    ))

    trim_cache: dict = {}

    def _trim_t(shape) -> int:
        # frame count the (B, T, C) base path would produce for this audio
        # shape: frontend frames (via eval_shape — includes its pad_to),
        # ceil to the base pad multiple 64, through the conv stride chain
        if shape not in trim_cache:
            fs = jax.eval_shape(
                lambda a, l: frontend(a, l, dither=0.0)[0],
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct((shape[0],), jnp.int32))
            t = -(-fs.shape[1] // 64) * 64
            for bp in plan.blocks:
                for spec in bp.convs:
                    t = _conv_t(t, spec)
            trim_cache[shape] = t
        return trim_cache[shape]

    def call(audio, lens):
        ids, el = fn(jnp.asarray(audio), jnp.asarray(lens), bands)
        return ids[:, :_trim_t(tuple(audio.shape))], el

    return call


def make_sharded_frozen_forward(model, tables, mesh: Mesh,
                                shard_time: bool = False,
                                shard_channels: bool = False,
                                executor: str = "auto"):
    """Build a jitted frozen-integer forward with batch (and optionally time
    or conv-out-channel) sharding.
    Returns fn(audio (B, L), lens (B,)) -> (greedy_ids, enc_lens).

    executor: 'auto' picks the channel-major fast path (banded-MXU dw +
    fused Pallas kernels, the make_frozen_fn serving default) whenever the
    plan is eligible — including under shard_time, where the CM path does
    its own ppermute halo exchange inside shard_map; 'cm' forces it;
    'base' keeps the (B, T, C) FrozenExec under XLA's automatic partitioner
    (XLA inserts the conv halo exchanges — useful to bisect CM SP issues).

    The tables are closed over as placed constants (not jit args) so the
    static dyadic exponents stay Python ints — compile-time shift constants.
    shard_channels=True places int8 kernels/biases channel-sharded on the
    'model' axis (TP) per parallel.mesh.param_specs; XLA SPMD inserts the
    implied collectives.
    """
    from qasr_tpu.parallel.mesh import shard_frozen_tables
    from qasr_tpu.quantize.freeze import plan_supports_cm

    frontend, plan, qcfg = model.frontend, model.plan, model.qcfg
    if executor not in ("auto", "cm", "base"):
        raise ValueError(executor)
    if executor == "cm" or (executor == "auto"
                            and plan_supports_cm(plan, qcfg)):
        return make_sharded_frozen_forward_cm(
            model, tables, mesh, shard_channels=shard_channels,
            shard_time=shard_time)
    audio_spec = P("data", "model") if shard_time else P("data")

    if shard_channels:
        # TP: tables are deliberately placed channel-sharded device arrays
        # (they cannot be replicated literals); TP serving processes accept
        # the captured-constant upload penalty (PERF.md round 3d).
        dt = shard_frozen_tables(tables, mesh)
    else:
        from qasr_tpu.quantize.freeze import _tables_to_host
        dt = _tables_to_host(tables)

    def fwd(audio, lengths):
        from qasr_tpu.models.jasper import pad_frames_aligned

        feats, feat_lens = frontend(audio, lengths, dither=0.0)
        if not shard_time:
            feats = pad_frames_aligned(feats)
        if shard_time:
            # keep the frame axis sharded across 'model'; XLA's spatial
            # partitioner adds conv halo exchanges
            feats = jax.lax.with_sharding_constraint(
                feats, NamedSharding(mesh, P("data", "model", None)))
        fx = FrozenExec(dt, qcfg, activation=plan.activation)
        enc, enc_lens = encoder_forward(fx, plan, feats, feat_lens)
        log_probs = fx.decoder(enc)
        return jnp.argmax(log_probs, axis=-1), enc_lens

    fn = jax.jit(
        fwd,
        in_shardings=(NamedSharding(mesh, audio_spec),
                      NamedSharding(mesh, P("data"))),
        out_shardings=(NamedSharding(mesh, P("data")),
                       NamedSharding(mesh, P("data"))),
    )
    return fn


def evaluate_wer_sharded(model, loader, mesh: Mesh,
                         shard_time: bool = False) -> float:
    """Batch-sharded greedy-WER eval (inference.py:133-159 over a mesh)."""
    from qasr_tpu.decode.ctc import WER

    tables = model.freeze()
    fwd = make_sharded_frozen_forward(model, tables, mesh, shard_time)
    wer = WER(model.vocabulary)
    dp = mesh.shape["data"]
    for audio, alens, tokens, tlens in loader:
        b = audio.shape[0]
        pad = (-b) % dp
        if pad:  # pad the batch to the mesh's data extent
            audio = np.concatenate([audio, np.zeros((pad,) + audio.shape[1:],
                                                    audio.dtype)])
            alens = np.concatenate([alens, np.ones((pad,), alens.dtype)])
        ids, enc_lens = fwd(jnp.asarray(audio), jnp.asarray(alens))
        ids, enc_lens = np.asarray(ids)[:b], np.asarray(enc_lens)[:b]
        wer.update(ids, np.asarray(tokens), np.asarray(tlens), enc_lens)
    return wer.compute()


def synthesize_sharded(plan, enc_params, mesh: Mesh, *, batch_size: int = 8,
                       dim: int = 64, seqlen: int = 500, train_iter: int = 200,
                       num_batch: int = 1, lr: float = 0.01, seed: int = 0):
    """Data-free synthesis with the independent problems sharded over the
    mesh 'data' axis (the reference is single-GPU, distill_data.py:82)."""
    from functools import partial

    from qasr_tpu.quantize.synth import bn_targets, synthesize_batch

    dp = mesh.shape["data"] * mesh.shape["model"]
    targets = bn_targets(plan, enc_params)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_batch)
    flat_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("b",))
    vfn = jax.jit(jax.vmap(partial(
        synthesize_batch, plan, enc_params, batch_size=batch_size, dim=dim,
        seqlen=seqlen, train_iter=train_iter, lr=lr, targets=targets)),
        in_shardings=NamedSharding(flat_mesh, P("b")),
        out_shardings=NamedSharding(flat_mesh, P("b")))
    out = []
    for i in range(0, num_batch, dp):
        chunk = keys[i : i + dp]
        if len(chunk) < dp:  # tile up to the mesh extent
            reps = -(-dp // len(keys))
            extra = jnp.tile(keys, (reps, 1))[: dp - len(chunk)]
            chunk = jnp.concatenate([chunk, extra])
        xs, _ = vfn(jnp.stack(chunk))
        n = min(dp, num_batch - i)
        out.extend(np.asarray(xs[j]) for j in range(n))
    return out


def make_sharded_frozen_conformer_forward(model, mesh: Mesh,
                                          shard_channels: bool = False):
    """Sharded frozen-integer Conformer forward (ConformerCTC or a
    conformer RNNTModel after freeze/freeze_encoder): batch on 'data',
    optionally int8-GEMM tensor parallelism on 'model'
    (parallel.mesh.conformer_frozen_specs — q/k/v head-parallel, FF
    column/row-parallel; the row-parallel int32 partial sums all-reduce
    before the requant, which is exact, so any placement is bit-identical
    to single-device).  Returns fn(audio (B, L), lens (B,)) ->
    (log_probs | encodings, enc_lens) matching the model's frozen forward.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from qasr_tpu.parallel.mesh import shard_frozen_conformer_tables
    from qasr_tpu.quantize.conformer_freeze import frozen_conformer_apply

    tables = getattr(model, "enc_frozen", None)
    if tables is None:
        raise ValueError("freeze the encoder first (ConformerCTC.freeze / "
                         "RNNTModel.freeze_encoder)")
    ccfg = getattr(model, "ccfg", None) or model.plan
    frontend = model.frontend
    if shard_channels:
        dt = shard_frozen_conformer_tables(tables, mesh)
    else:
        dt = tables
    data = NamedSharding(mesh, P("data"))
    is_ctc = hasattr(model, "_head")
    params = model.params

    @partial(jax.jit, in_shardings=(data, data))
    def fwd(audio, lengths):
        feats, feat_lens = frontend(audio, lengths, dither=0.0)
        enc, enc_lens = frozen_conformer_apply(dt, ccfg, feats, feat_lens)
        if is_ctc:
            return model._head(params, enc), enc_lens
        return enc, enc_lens

    return fwd
