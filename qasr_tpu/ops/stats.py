"""Streaming/sharded statistics for calibration.

The reference computes percentile activation ranges with torch.quantile on
the full (B, C, T) tensor (quant_modules.py:120-125) — a global sort, O(n
log n) time and O(n) scratch, and unshardable.  `histogram_quantile` does
the same job by iterative interval counting: each round splits the current
bracket into S sub-intervals and counts elements below each edge (compare +
reduce — no sort, no scatter, O(1) scratch), then narrows the bracket to
the sub-interval containing the target order statistic.  `refine` rounds
give error <= range / S**refine.  Because every pass is an elementwise
compare feeding a full reduce, XLA SPMD shards it over a device mesh with
a psum per round instead of an all-gather-and-sort — SURVEY.md §7
hard-part 4.

Used by QuantExec calibration when the site tensor is large
(models/jasper._batch_ranges); parity vs torch.quantile is asserted in
tests/test_quant_prims.py at the reference recipe's calibration sizes
(8 x 500 x 64, inference.py:52).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def histogram_quantile(x: Array, q, splits: int = 32, refine: int = 5) -> Array:
    """Approximate the q-quantile (q in [0, 1], scalar or vector) of x
    without sorting.

    torch.quantile 'linear' interpolates the two order statistics flanking
    the fractional rank q*(n-1); in a sparse tail those neighbors can sit
    far apart, so BOTH are bracketed (2 chains per quantile, vmapped) and
    interpolated.  Error <= (max-min) / splits**refine per neighbor
    (32**5 = 3.4e7 resolution steps).
    """
    x = x.reshape(-1).astype(jnp.float32)
    n = x.size
    assert n < 2**31, "int32 rank counting bounds the tensor at 2^31 elements"
    # ranks in host float64/int64: float32 cannot represent exact element
    # counts (or q*(n-1)) above 2^24, which would drift the bracketed order
    # statistic on large calibration tensors
    qs64 = np.atleast_1d(np.asarray(q, np.float64))
    frank = qs64 * (n - 1)                   # (Q,)
    k0 = np.floor(frank)
    frac = jnp.asarray(frank - k0, jnp.float32)
    rank = jnp.asarray(np.concatenate([k0, np.minimum(k0 + 1, n - 1)]),
                       jnp.int32)            # (2Q,)
    qs = jnp.asarray(qs64, jnp.float32)
    lo = jnp.full(rank.shape, jnp.min(x))
    hi = jnp.full(rank.shape, jnp.max(x))

    def one_round(lo_q, hi_q, rank_q):
        width = (hi_q - lo_q) / splits
        # counts[j] = #elements <= j-th interior edge; a (S-1, n) compare
        # that XLA fuses into the reduction without materializing
        edges = lo_q + width * jnp.arange(1, splits, dtype=jnp.float32)
        counts = jnp.sum(x[None, :] <= edges[:, None], axis=1,
                         dtype=jnp.int32)
        # first sub-interval whose cumulative count exceeds the rank
        # (counts is non-decreasing; all-False argmax = 0 means the target
        # sits in the last sub-interval)
        gt = counts > rank_q
        j = jnp.where(jnp.any(gt), jnp.argmax(gt), splits - 1)
        new_lo = lo_q + j.astype(jnp.float32) * width
        # width 0 = bracket collapsed to a point: stays collapsed
        return new_lo, new_lo + width

    for _ in range(refine):
        lo, hi = jax.vmap(one_round, in_axes=(0, 0, 0))(lo, hi, rank)

    mids = (lo + hi) * 0.5
    nq = qs.shape[0]
    out = mids[:nq] + frac * (mids[nq:] - mids[:nq])
    return out[0] if np.ndim(q) == 0 else out


def quantile_range(x: Array, percentile: float, splits: int = 32,
                   refine: int = 5):
    """(low, high) percentile clipping range — the counterpart of
    quant_modules.py:120-125's torch.quantile pair, sort-free."""
    out = histogram_quantile(
        x, [1.0 - percentile / 100.0, percentile / 100.0],
        splits=splits, refine=refine)
    return out[0], out[1]
