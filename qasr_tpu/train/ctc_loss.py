"""CTC loss (reference losses/ctc.py:27-76 semantics).

optax.ctc_loss does the forward-backward in log space on-device; blank id is
the last vocab index like NeMo (CTCLoss(blank=num_classes)).  reduction
'mean_batch' = mean of per-sample total negative log-likelihoods (the
reference wraps nn.CTCLoss(reduction='none') then torch.mean, ctc.py:56-73).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss(log_probs: jnp.ndarray, input_lengths: jnp.ndarray,
             targets: jnp.ndarray, target_lengths: jnp.ndarray,
             blank_id: int, reduction: str = "mean_batch") -> jnp.ndarray:
    """log_probs: (B, T, V+1) log-softmaxed; targets: (B, L) int ids."""
    b, t, _ = log_probs.shape
    l = targets.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= input_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(l)[None, :] >= target_lengths[:, None]).astype(jnp.float32)
    per_sample = optax.ctc_loss(log_probs, logit_pad, targets, label_pad,
                                blank_id=blank_id)
    if reduction == "mean_batch":
        return jnp.mean(per_sample)
    if reduction == "sum":
        return jnp.sum(per_sample)
    if reduction == "mean":
        # torch 'mean': per-sample loss / target_length, then batch mean
        return jnp.mean(per_sample / jnp.maximum(target_lengths, 1))
    if reduction == "none":
        return per_sample
    raise ValueError(reduction)
