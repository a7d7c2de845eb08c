"""Data-free synthetic calibration data for the Conformer (zero-shot PTQ).

Extends the Q-ASR data-free recipe (reference distill_data.py:59-162:
optimize random inputs so each pre-BN batch statistic matches the frozen
BatchNorm running statistics under a per-channel Gaussian KL) to the
Conformer: each encoder layer's convolution module carries exactly one
BatchNorm (conformer_modules.py:150-166), so the distillation signal is
the n_layers pre-BN depthwise outputs.  LayerNorms store no running
statistics, so — like the reference — BN sites are the only data-free
supervision.

Reuses the QuartzNet synthesizer's machinery (quantize/synth.py): the same
Gaussian-KL loss, torch-equivalent Adam on the *input*, and the
ReduceLROnPlateau schedule, all inside one lax.scan.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.conformer import ConformerConfig, conformer_encoder_apply
from qasr_tpu.quantize.synth import EPS, _kl_loss, _plateau_step, _SchedState


def conformer_bn_targets(params) -> Tuple[Tuple, Tuple]:
    """(running_mean, sqrt(running_var + eps)) per layer, in layer order."""
    means, stds = [], []
    for lp in params["layers"]:
        bn = lp["conv"]["bn"]
        means.append(jnp.asarray(bn["mean"]))
        stds.append(jnp.sqrt(jnp.asarray(bn["var"]) + EPS))
    return tuple(means), tuple(stds)


def conformer_distill_loss(params, cfg: ConformerConfig, x, lens,
                           targets) -> jnp.ndarray:
    stats: List = []
    conformer_encoder_apply(params, cfg, x, lens, bn_stats=stats)
    means, stds = targets
    total = 0.0
    for (m, v), bm, bs in zip(stats, means, stds):
        total = total + _kl_loss(bm, bs, m, jnp.sqrt(v + EPS))
    return total


def synthesize_conformer_batch(params, cfg: ConformerConfig, key, *,
                               batch_size: int, seqlen: int,
                               train_iter: int, lr: float, targets):
    """One distillation problem -> ((B, T, F) feature batch, losses)."""
    x0 = jax.random.uniform(key, (batch_size, seqlen, cfg.feat_in),
                            jnp.float32, -0.3, 0.3)
    lens = jnp.full((batch_size,), seqlen, jnp.int32)

    loss_fn = lambda x: conformer_distill_loss(params, cfg, x, lens, targets)
    grad_fn = jax.value_and_grad(loss_fn)
    b1, b2, eps = 0.9, 0.999, 1e-8  # torch Adam defaults

    def step(carry, t):
        x, m, v, sched = carry
        loss, g = grad_fn(x)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (t + 1.0))
        vh = v / (1 - b2 ** (t + 1.0))
        x = x - sched.lr * mh / (jnp.sqrt(vh) + eps)
        sched = _plateau_step(sched, loss)
        return (x, m, v, sched), loss

    sched0 = _SchedState(jnp.float32(lr), jnp.float32(np.inf), jnp.int32(0))
    (x, _, _, _), losses = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), sched0),
        jnp.arange(train_iter, dtype=jnp.float32))
    return x, losses


def get_synthetic_conformer_data(params, cfg: ConformerConfig, *,
                                 batch_size: int = 8, seqlen: int = 128,
                                 train_iter: int = 200, num_batch: int = 1,
                                 lr: float = 0.02, seed: int = 0,
                                 parallel: int = 4, verbose: bool = False):
    """Reference get_synthetic_data API -> list of ((B, T, F), lens)
    feature batches ready for quantize_encoder(..., features=True)."""
    targets = conformer_bn_targets(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_batch)

    # params/targets ride as jit arguments, not baked constants: the
    # compile payload stays O(program) so a d_model>=512 encoder
    # synthesizes over payload-capped remote-compile transports (same
    # rule as the frozen forward's partition_tables path)
    @jax.jit
    def fn(p, tgt, ks):
        return jax.vmap(partial(
            synthesize_conformer_batch, p, cfg, batch_size=batch_size,
            seqlen=seqlen, train_iter=train_iter, lr=lr, targets=tgt))(ks)
    lens = np.full((batch_size,), seqlen, np.int32)
    out, all_losses = [], []
    for i in range(0, num_batch, parallel):  # memory-bounding chunks
        chunk = keys[i : i + parallel]
        if len(chunk) < parallel:  # pad to one compiled shape
            chunk = jnp.concatenate([chunk, keys[: parallel - len(chunk)]])
        xs, losses = fn(params, targets, jnp.stack(chunk))
        k = min(parallel, num_batch - i)
        out.extend((np.asarray(xs[j]), lens) for j in range(k))
        all_losses.append(np.asarray(losses[:k]))
    losses = np.concatenate(all_losses)
    if verbose:
        print(f"conformer distill losses: "
              f"{losses[:, -1].round(3).tolist()}")
    return out, losses


def estimate_bn_stats(params, cfg: ConformerConfig, feat_batches):
    """(Re-)estimate the conv modules' BatchNorm running statistics from
    feature batches, with affine COMPENSATION so the float model's outputs
    are bit-for-bit unchanged.

    Upstream, torch BN tracks running stats during training; the functional
    conformer applies BN with fixed stats, so a trained checkpoint's stats
    carry no data information for the data-free synthesizer.  A model
    provider runs this once post-training: the new (mean, var) come from
    data, and gamma/beta absorb the difference
      g' = g * sqrt(v2+eps)/sqrt(v+eps);  b' = b + g * (m2-m)/sqrt(v+eps)
    so BN(y) is the identical transform — only the stored statistics (the
    synthesizer's distillation target) change.  Returns new params."""
    import copy

    n_l = cfg.n_layers
    acc_m = [None] * n_l
    acc_v = [None] * n_l
    n = 0

    @jax.jit
    def stats_of(p, x, lens):
        st: List = []
        conformer_encoder_apply(p, cfg, x, lens, bn_stats=st)
        return st

    for feats, lens in feat_batches:
        st = stats_of(params, jnp.asarray(feats), jnp.asarray(lens))
        for i, (m, v) in enumerate(st):
            # pool second moments so between-batch mean spread counts:
            # v2 = E[v_i + m_i^2] - (E[m_i])^2
            s2 = v + m * m
            acc_m[i] = m if acc_m[i] is None else acc_m[i] + m
            acc_v[i] = s2 if acc_v[i] is None else acc_v[i] + s2
        n += 1
    out = copy.deepcopy(params)
    eps = 1e-5  # the conformer BN epsilon (conformer_modules.py:161)
    for i in range(n_l):
        bn = out["layers"][i]["conv"]["bn"]
        m1 = np.asarray(bn["mean"], np.float64)
        v1 = np.asarray(bn["var"], np.float64)
        g1 = np.asarray(bn["gamma"], np.float64)
        b1 = np.asarray(bn["beta"], np.float64)
        m2 = np.asarray(acc_m[i], np.float64) / n
        v2 = np.asarray(acc_v[i], np.float64) / n - m2 * m2
        v2 = np.maximum(v2, 0.0)
        s1 = np.sqrt(v1 + eps)
        bn["mean"] = np.asarray(m2, np.float32)
        bn["var"] = np.asarray(v2, np.float32)
        bn["gamma"] = np.asarray(g1 * np.sqrt(v2 + eps) / s1, np.float32)
        bn["beta"] = np.asarray(b1 + g1 * (m2 - m1) / s1, np.float32)
    return out
