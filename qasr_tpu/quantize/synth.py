"""Data-free synthetic calibration data (zero-shot quantization).

Equivalent of the reference `get_synthetic_data`
(`/root/reference/nemo/quantization/utils/distill_data.py:71-162`): optimize
random inputs so each pre-BN conv output's batch statistics match the frozen
BatchNorm running statistics under a per-channel Gaussian KL loss
(distill_data.py:59-68), with Adam on the *input* and a
ReduceLROnPlateau(patience=25, factor=0.1, min_lr=1e-4) schedule
(distill_data.py:125-129).

TPU-first differences from the reference:
  * no forward hooks — the functional FloatExec returns pre-BN (mean, var)
    directly from the walk;
  * the reference optimizes its `num_batch` problems sequentially on one GPU
    (distill_data.py:82 "Currently only support a single GPU"); the problems
    are independent, so here they are vmapped into one device-wide program
    (and batch-sharded across a mesh by parallel/eval.py);
  * the optimization loop is a single lax.scan — one compilation, no host
    round-trips; Adam + the plateau scheduler are implemented in-graph with
    torch-equivalent update rules.
"""
from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.jasper import EncoderPlan, FloatExec, encoder_forward

EPS = 1e-6  # distill_data.py:98


def bn_targets(plan: EncoderPlan, enc_params) -> Tuple[jnp.ndarray, ...]:
    """(running_mean, sqrt(running_var + 1e-6)) per BN site, in walk order
    (distill_data.py:111-113)."""
    means, stds = [], []
    for bp, bparams in zip(plan.blocks, enc_params["blocks"]):
        for spec, p in zip(bp.convs, bparams["convs"]):
            if spec.has_bn:
                means.append(p["bn"]["mean"])
                stds.append(jnp.sqrt(p["bn"]["var"] + EPS))
        for p in bparams["res"]:
            means.append(p["bn"]["mean"])
            stds.append(jnp.sqrt(p["bn"]["var"] + EPS))
    return tuple(means), tuple(stds)


def _kl_loss(bn_mean, bn_std, tmp_mean, tmp_std):
    # distill_data.py:59-68
    a = jnp.log(tmp_std / bn_std)
    c = (bn_std**2 + (bn_mean - tmp_mean) ** 2) / tmp_std**2
    b = 0.5 * (1.0 - c)
    return jnp.mean(a - b)


def distill_loss(plan: EncoderPlan, enc_params, x: jnp.ndarray,
                 lens: jnp.ndarray, targets) -> jnp.ndarray:
    ex = FloatExec(enc_params, activation=plan.activation, collect_bn_stats=True)
    encoder_forward(ex, plan, x, lens)
    means, stds = targets
    total = 0.0
    for (m, v), bm, bs in zip(ex.bn_stats, means, stds):
        total = total + _kl_loss(bm, bs, m, jnp.sqrt(v + EPS))
    return total


class _SchedState(NamedTuple):
    lr: jnp.ndarray
    best: jnp.ndarray
    num_bad: jnp.ndarray


def _plateau_step(s: _SchedState, loss, *, patience=25, factor=0.1,
                  threshold=1e-4, min_lr=1e-4) -> _SchedState:
    """torch.optim.lr_scheduler.ReduceLROnPlateau, mode=min, rel threshold."""
    improved = loss < s.best * (1.0 - threshold)
    best = jnp.where(improved, loss, s.best)
    num_bad = jnp.where(improved, 0, s.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(s.lr * factor, min_lr), s.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return _SchedState(lr=lr, best=best, num_bad=num_bad)


def synthesize_batch(plan: EncoderPlan, enc_params, key, *, batch_size: int,
                     dim: int, seqlen: int, train_iter: int, lr: float,
                     targets) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One independent distillation problem -> ((B, T, C) mel batch, losses)."""
    x0 = jax.random.uniform(key, (batch_size, seqlen, dim), jnp.float32, -0.3, 0.3)
    lens = jnp.full((batch_size,), seqlen, jnp.int32)

    loss_fn = lambda x: distill_loss(plan, enc_params, x, lens, targets)
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


def get_synthetic_data(plan: EncoderPlan, enc_params, *, batch_size: int = 8,
                       dim: int = 64, seqlen: int = 500, train_iter: int = 200,
                       num_batch: int = 1, lr: float = 0.01, seed: int = 0,
                       parallel: int = 4, verbose: bool = True) -> List[np.ndarray]:
    """Reference API (distill_data.py:71-93) -> list of (B, T, C) arrays.

    `parallel` problems are vmapped together per compilation; the reference
    runs them one at a time.
    """
    targets = bn_targets(plan, enc_params)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_batch)
    fn = jax.jit(jax.vmap(partial(
        synthesize_batch, plan, enc_params, batch_size=batch_size, dim=dim,
        seqlen=seqlen, train_iter=train_iter, lr=lr, targets=targets)))
    out: List[np.ndarray] = []
    for i in range(0, num_batch, parallel):
        chunk = keys[i : i + parallel]
        if len(chunk) < parallel:  # pad to a single compiled shape
            chunk = jnp.concatenate([chunk, keys[: parallel - len(chunk)]])
        xs, losses = fn(jnp.stack(chunk))
        n = min(parallel, num_batch - i)
        out.extend(np.asarray(xs[j]) for j in range(n))
        if verbose:
            print(f"Distillation: {min(i + parallel, num_batch)} / {num_batch} "
                  f"(final losses: {np.asarray(losses)[:n, -1].round(4).tolist()})")
    return out
