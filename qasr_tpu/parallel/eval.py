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



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qasr_tpu.models.jasper import encoder_forward
from qasr_tpu.quantize.freeze import FrozenExec


def make_sharded_frozen_forward(model, tables, mesh: Mesh,
                                shard_time: bool = False,
                                shard_channels: bool = False):
    """Build a jitted frozen-integer forward with batch (and optionally time
    or conv-out-channel) sharding.
    Returns fn(audio (B, L), lens (B,)) -> (greedy_ids, enc_lens).

    The tables are closed over as placed constants (not jit args) so the
    static dyadic exponents stay Python ints — compile-time shift constants.
    shard_channels=True places int8 kernels/biases channel-sharded on the
    'model' axis (TP) per parallel.mesh.param_specs; XLA SPMD inserts the
    implied collectives.
    """
    from qasr_tpu.parallel.mesh import replicated, shard_frozen_tables

    frontend, plan, qcfg = model.frontend, model.plan, model.qcfg
    audio_spec = P("data", "model") if shard_time else P("data")

    if shard_channels:
        dt = shard_frozen_tables(tables, mesh)
    else:
        repl = replicated(mesh)
        dt = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl)
            if isinstance(x, (np.ndarray, jax.Array)) else x, tables)

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
