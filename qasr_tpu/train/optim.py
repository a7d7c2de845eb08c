"""Optimizers and LR schedules.

Equivalents of the reference nemo/core/optim:
  - Novograd (novograd.py:30-150): layer-wise scalar second moment,
    ``v0 = ||g0||^2`` init, denom = sqrt(v)+eps, decoupled-style wd added to
    the normalized grad, m = b1*m + g', p -= lr*m.
  - WarmupPolicy/CosineAnnealing/Square/SquareRoot/Polynomial/InverseSquareRoot
    (lr_scheduler.py:33-370): warmup lr = base*(step+1)/(warmup+1); past
    max_steps -> min_lr; annealing functions applied on (step - warmup).
All schedules are jnp-traceable (step -> lr) so they run inside jitted
training steps.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Schedule = Callable


class NovogradState(NamedTuple):
    step: jnp.ndarray
    m: optax.Updates
    v: optax.Updates  # scalar per leaf


def novograd(learning_rate, betas=(0.95, 0.98), eps: float = 1e-8,
             weight_decay: float = 0.0, grad_averaging: bool = False,
             amsgrad: bool = False) -> optax.GradientTransformation:
    """Novograd (reference novograd.py:30-150), as an optax transform."""
    if amsgrad:
        raise NotImplementedError("amsgrad Novograd variant not implemented")
    b1, b2 = betas

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(lambda p: jnp.zeros((), p.dtype), params)
        return NovogradState(jnp.zeros((), jnp.int32), zeros, v)

    def update(grads, state, params):
        step = state.step + 1

        def upd(g, m, v, p):
            norm = jnp.sum(jnp.square(g))
            v_new = jnp.where(v == 0, norm, b2 * v + (1 - b2) * norm)
            g = g / (jnp.sqrt(v_new) + eps)
            if weight_decay:
                g = g + weight_decay * p
            if grad_averaging:
                g = g * (1 - b1)
            m_new = b1 * m + g
            return m_new, v_new

        flat = jax.tree_util.tree_map(upd, grads, state.m, state.v, params)
        m_new = jax.tree_util.tree_map(lambda x: x[0], flat,
                                       is_leaf=lambda x: isinstance(x, tuple))
        v_new = jax.tree_util.tree_map(lambda x: x[1], flat,
                                       is_leaf=lambda x: isinstance(x, tuple))
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        updates = jax.tree_util.tree_map(lambda m: -lr * m, m_new)
        return updates, NovogradState(step, m_new, v_new)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Schedules (lr_scheduler.py)
# ---------------------------------------------------------------------------


def _with_warmup(base_lr: float, max_steps: int, min_lr: float,
                 warmup_steps: int, anneal) -> Schedule:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / (warmup_steps + 1)
        ann = anneal(jnp.clip(step - warmup_steps, 0, None))
        out = jnp.where(step <= warmup_steps, warm, ann)
        return jnp.where(step > max_steps, min_lr, out)

    return sched


def _resolve_warmup(warmup_steps, warmup_ratio, max_steps):
    if warmup_steps is not None:
        return int(warmup_steps)
    if warmup_ratio is not None:
        return int(warmup_ratio * max_steps)
    return 0


def cosine_annealing(base_lr, max_steps, min_lr=0.0, warmup_steps=None,
                     warmup_ratio=None) -> Schedule:
    w = _resolve_warmup(warmup_steps, warmup_ratio, max_steps)
    span = max(max_steps - w, 1)

    def anneal(s):
        mult = 0.5 * (1 + jnp.cos(jnp.pi * s / span))
        return (base_lr - min_lr) * mult + min_lr

    return _with_warmup(base_lr, max_steps, min_lr, w, anneal)


def square_annealing(base_lr, max_steps, min_lr=1e-5, warmup_steps=None,
                     warmup_ratio=None) -> Schedule:
    w = _resolve_warmup(warmup_steps, warmup_ratio, max_steps)
    span = max(max_steps - w, 1)

    def anneal(s):
        return jnp.maximum(base_lr * ((span - s) / span) ** 2, min_lr)

    return _with_warmup(base_lr, max_steps, min_lr, w, anneal)


def squareroot_annealing(base_lr, max_steps, min_lr=0.0, warmup_steps=None,
                         warmup_ratio=None) -> Schedule:
    w = _resolve_warmup(warmup_steps, warmup_ratio, max_steps)

    def anneal(s):
        return jnp.maximum(base_lr * jnp.sqrt(jnp.clip(max_steps - (s + w), 0) / max_steps), min_lr)

    return _with_warmup(base_lr, max_steps, min_lr, w, anneal)


def polynomial_decay_annealing(base_lr, max_steps, min_lr=0.0, power=1.0,
                               warmup_steps=None, warmup_ratio=None) -> Schedule:
    w = _resolve_warmup(warmup_steps, warmup_ratio, max_steps)
    span = max(max_steps - w, 1)

    def anneal(s):
        p = jnp.clip(s, 0, span) / span
        return (base_lr - min_lr) * (1.0 - p) ** power + min_lr

    return _with_warmup(base_lr, max_steps, min_lr, w, anneal)


def inverse_sqrt_annealing(base_lr, max_steps, min_lr=0.0, warmup_steps=None,
                           warmup_ratio=None) -> Schedule:
    w = _resolve_warmup(warmup_steps, warmup_ratio, max_steps)

    def anneal(s):
        return base_lr / jnp.sqrt(s + w + 1) * jnp.sqrt(w + 1.0)

    return _with_warmup(base_lr, max_steps, min_lr, w, anneal)


def noam_annealing(base_lr, d_model, max_steps, min_lr=0.0,
                   warmup_steps=1000) -> Schedule:
    def sched(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        lr = base_lr * d_model ** -0.5 * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        return jnp.maximum(lr, min_lr)

    return sched


def warmup_hold_cosine(base_lr, max_steps, min_lr=0.0, warmup_steps=None,
                       warmup_ratio=None, hold_steps=0, hold_ratio=None) -> Schedule:
    """WarmupHoldPolicy + cosine (lr_scheduler.py:84-159 + PolynomialHold
    pattern): warmup, plateau at base_lr for hold_steps, then anneal."""
    w = _resolve_warmup(warmup_steps, warmup_ratio, max_steps)
    h = int(hold_ratio * max_steps) if hold_ratio is not None else int(hold_steps)
    span = max(max_steps - w - h, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / (w + 1)
        s = jnp.clip(step - w - h, 0, None)
        mult = 0.5 * (1 + jnp.cos(jnp.pi * s / span))
        ann = (base_lr - min_lr) * mult + min_lr
        out = jnp.where(step <= w, warm,
                        jnp.where(step < w + h, base_lr, ann))
        return jnp.where(step > max_steps, min_lr, out)

    return sched


SCHEDULES = {
    "CosineAnnealing": cosine_annealing,
    "WarmupHoldCosineAnnealing": warmup_hold_cosine,
    "SquareAnnealing": square_annealing,
    "SquareRootAnnealing": squareroot_annealing,
    "PolynomialDecayAnnealing": polynomial_decay_annealing,
    "InverseSquareRootAnnealing": inverse_sqrt_annealing,
    "NoamAnnealing": noam_annealing,
}


def get_optimizer(name: str, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Optimizer registry (reference optimizers.py:44-146)."""
    name = name.lower()
    if name == "novograd":
        return novograd(learning_rate, **kwargs)
    if name == "adam":
        return optax.adam(learning_rate, **kwargs)
    if name == "adamw":
        return optax.adamw(learning_rate, **kwargs)
    if name == "sgd":
        return optax.sgd(learning_rate, **kwargs)
    if name == "adadelta":
        return optax.adadelta(learning_rate, **kwargs)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate, **kwargs)
    if name == "adagrad":
        return optax.adagrad(learning_rate, **kwargs)
    raise ValueError(f"unknown optimizer {name}")
