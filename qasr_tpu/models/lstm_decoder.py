"""LSTM CTC decoder head.

Equivalent of the reference LSTMDecoder
(/root/reference/nemo/collections/asr/modules/lstm_decoder.py): encoder
output (B, T, D) -> stacked (optionally bidirectional) LSTM -> linear ->
log-softmax over num_classes + blank.  Functional: params pytree + apply.
Reuses the RNNT prediction network's LSTM cell (models/rnnt.py).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.rnnt import _lstm_cell

Array = jax.Array


def init_lstm_decoder(rng: np.random.Generator, feat_in: int, num_classes: int,
                      hidden: int = 640, num_layers: int = 1,
                      bidirectional: bool = False) -> Dict[str, Any]:
    def lstm_params(din, h):
        s = 1.0 / np.sqrt(max(din, 1))
        return {
            "wi": jnp.asarray(rng.uniform(-s, s, (din, 4 * h)), jnp.float32),
            "wh": jnp.asarray(rng.uniform(-s, s, (h, 4 * h)), jnp.float32),
            "b": jnp.zeros((4 * h,), jnp.float32),
        }

    dirs = 2 if bidirectional else 1
    layers = []
    din = feat_in
    for _ in range(num_layers):
        layers.append([lstm_params(din, hidden) for _ in range(dirs)])
        din = hidden * dirs
    s = 1.0 / np.sqrt(din)
    # arrays only: the tree is a grad input (hidden/bidirectional are
    # recoverable from the weight shapes)
    return {
        "lstm": layers,
        "w": jnp.asarray(rng.uniform(-s, s, (din, num_classes + 1)), jnp.float32),
        "b": jnp.zeros((num_classes + 1,), jnp.float32),
    }


def _run_lstm(p, x: Array, reverse: bool) -> Array:
    """x: (B, T, D) -> (B, T, H) scanning over T."""
    b = x.shape[0]
    h0 = jnp.zeros((b, p["wh"].shape[0]), jnp.float32)

    def step(carry, xt):
        h, c = carry
        h2, c2 = _lstm_cell(p, xt, h, c)
        return (h2, c2), h2

    xs = jnp.swapaxes(x, 0, 1)  # (T, B, D)
    _, ys = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def lstm_decoder_forward(params: Dict[str, Any], enc: Array) -> Array:
    """enc: (B, T, D) -> log_probs (B, T, V+1) (lstm_decoder.py forward)."""
    x = enc
    for layer in params["lstm"]:
        outs = [_run_lstm(layer[0], x, reverse=False)]
        if len(layer) == 2:
            outs.append(_run_lstm(layer[1], x, reverse=True))
        x = jnp.concatenate(outs, axis=-1) if len(outs) == 2 else outs[0]
    logits = jnp.matmul(x, params["w"]) + params["b"]
    return jax.nn.log_softmax(logits, axis=-1)
