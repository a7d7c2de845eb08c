"""CTC forced alignment / segmentation.

Equivalent of the reference's tools/ctc_segmentation (SURVEY.md §2.6): align
a known transcript against CTC log-probabilities to recover per-character /
per-word time stamps, e.g. for cutting long recordings into utterances.

Viterbi over the standard CTC expanded-label graph (blank-interleaved),
vectorized over the label axis with a lax.scan over frames, then a host
backtrace.  Frame indices convert to seconds via the model's hop (10 ms) and
total encoder stride.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclass
class Segment:
    label: str
    start: float  # seconds
    end: float
    score: float  # mean log-prob of the aligned frames


def _expand(tokens: Sequence[int], blank: int) -> np.ndarray:
    out = [blank]
    for t in tokens:
        out += [int(t), blank]
    return np.asarray(out, np.int32)


def ctc_viterbi_align(log_probs: np.ndarray, tokens: Sequence[int], blank: int
                      ) -> Tuple[np.ndarray, float]:
    """Best path through the CTC graph.

    log_probs: (T, V+1) log-softmax; tokens: label ids (no blanks).
    Returns (state_per_frame (T,) into the expanded sequence, path score).
    """
    exp = _expand(tokens, blank)
    s = len(exp)
    t_len = log_probs.shape[0]
    emit = jnp.asarray(log_probs)[:, jnp.asarray(exp)]  # (T, S)

    # allowed skips: from s-2 when exp[s] != blank and exp[s] != exp[s-2]
    can_skip = np.zeros(s, bool)
    can_skip[2:] = (exp[2:] != blank) & (exp[2:] != exp[:-2])
    can_skip = jnp.asarray(can_skip)

    def step(alpha, e_t):
        stay = alpha
        prev = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        skip = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        skip = jnp.where(can_skip, skip, NEG_INF)
        best = jnp.maximum(jnp.maximum(stay, prev), skip)
        choice = jnp.where(best == stay, 0, jnp.where(best == prev, 1, 2))
        return best + e_t, choice.astype(jnp.int8)

    alpha0 = jnp.full((s,), NEG_INF).at[0].set(0.0).at[1].set(0.0) + emit[0] * 0
    alpha0 = jnp.where(jnp.arange(s) < 2, emit[0], NEG_INF)
    alpha, choices = jax.lax.scan(step, alpha0, emit[1:])
    choices = np.asarray(choices)  # (T-1, S)
    alpha = np.asarray(alpha)

    # end state: last blank or last label
    end = int(np.argmax(alpha[[s - 2, s - 1]])) + s - 2
    score = float(alpha[end])
    # host backtrace
    states = np.zeros(t_len, np.int32)
    cur = end
    for t in range(t_len - 1, 0, -1):
        states[t] = cur
        cur -= int(choices[t - 1, cur])
    states[0] = cur
    return states, score


def align_transcript(log_probs: np.ndarray, text: str, vocabulary: Sequence[str],
                     frame_seconds: float = 0.02) -> List[Segment]:
    """Word-level segments for `text` against (T, V+1) log-probs.

    frame_seconds: encoder frame duration (10 ms hop x total stride 2 for
    QuartzNet/Jasper).
    """
    label_map = {c: i for i, c in enumerate(vocabulary)}
    blank = len(vocabulary)
    tokens = [label_map[c] for c in text if c in label_map]
    states, score = ctc_viterbi_align(log_probs, tokens, blank)
    exp = _expand(tokens, blank)
    # char index per frame (state -> token position); blanks belong to no char
    char_of_state = np.where(np.arange(len(exp)) % 2 == 1,
                             np.arange(len(exp)) // 2, -1)
    frame_char = char_of_state[states]
    # group chars into words with their frame extents
    segs: List[Segment] = []
    char_times = {}
    for f, ci in enumerate(frame_char):
        if ci >= 0:
            char_times.setdefault(int(ci), [f, f])[1] = f
    chars = [c for c in text if c in label_map]
    pos = 0
    for wtext in "".join(chars).split(" "):
        if not wtext:
            pos += 1
            continue
        idxs = list(range(pos, pos + len(wtext)))
        pos += len(wtext) + 1
        known = [char_times[i] for i in idxs if i in char_times]
        if not known:
            continue
        f0 = min(k[0] for k in known)
        f1 = max(k[1] for k in known)
        lp = float(np.mean([log_probs[f].max() for f in range(f0, f1 + 1)]))
        segs.append(Segment(label=wtext, start=f0 * frame_seconds,
                            end=(f1 + 1) * frame_seconds, score=lp))
    return segs
