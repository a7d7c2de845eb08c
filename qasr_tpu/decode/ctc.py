"""Greedy CTC decoding and WER.

Equivalents of the reference metrics/wer.py: `ctc_collapse` reproduces
WER.ctc_decoder_predictions_tensor (wer.py:117-136), `word_error_rate`
reproduces wer.py:26-59 (editdistance is a C++ pip dep there; here a plain
O(nm) DP — decode-side host work is negligible next to the TPU forward).

One robustness addition over the reference: predictions at/after the valid
encoded length are forced to blank before collapsing, so bucket-padded
batches do not leak pad-region garbage into hypotheses (the reference relies
on per-batch max-length padding being short, ctc_models.py:405 + wer.py:125).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def greedy_predictions(log_probs: np.ndarray) -> np.ndarray:
    """argmax over the vocab axis: (B, T, V+1) -> (B, T) int."""
    return np.argmax(log_probs, axis=-1)


def ctc_collapse(predictions: np.ndarray, blank_id: int, labels: Sequence[str],
                 lengths: Optional[np.ndarray] = None) -> List[str]:
    """Repeat-collapse + blank removal (wer.py:127-135)."""
    hyps: List[str] = []
    labels_map = dict(enumerate(labels))
    for i in range(predictions.shape[0]):
        seq = predictions[i]
        if lengths is not None:
            seq = seq[: int(lengths[i])]
        previous = blank_id
        out = []
        for p in seq:
            p = int(p)
            if (p != previous or previous == blank_id) and p != blank_id:
                out.append(labels_map[p])
            previous = p
        hyps.append("".join(out))
    return hyps


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance, O(len(a)*len(b)) DP with two rows."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def word_error_rate(hypotheses: List[str], references: List[str],
                    use_cer: bool = False) -> float:
    """Average WER (wer.py:26-59)."""
    if len(hypotheses) != len(references):
        raise ValueError(
            "In word error rate calculation, hypotheses and reference lists "
            f"must have the same number of elements. But I got: {len(hypotheses)} "
            f"and {len(references)} correspondingly")
    scores = 0
    words = 0
    for h, r in zip(hypotheses, references):
        h_list = list(h) if use_cer else h.split()
        r_list = list(r) if use_cer else r.split()
        words += len(r_list)
        scores += edit_distance(h_list, r_list)
    return 1.0 * scores / words if words != 0 else float("inf")


class WER:
    """Accumulating WER metric (scores/words counters), the functional
    analogue of the reference's DDP-synced torchmetrics Metric (wer.py:62-181).
    For multi-host eval, psum the two integers (parallel/mesh.py)."""

    def __init__(self, vocabulary: Sequence[str], use_cer: bool = False):
        self.labels = list(vocabulary)
        self.blank_id = len(vocabulary)
        self.use_cer = use_cer
        self.scores = 0
        self.words = 0

    def update(self, predictions: np.ndarray, targets: np.ndarray,
               target_lengths: np.ndarray,
               pred_lengths: Optional[np.ndarray] = None) -> None:
        hyps = ctc_collapse(predictions, self.blank_id, self.labels, pred_lengths)
        for i, h in enumerate(hyps):
            tl = int(target_lengths[i])
            ref = "".join(self.labels[int(c)] for c in targets[i][:tl])
            h_list = list(h) if self.use_cer else h.split()
            r_list = list(ref) if self.use_cer else ref.split()
            self.words += len(r_list)
            self.scores += edit_distance(h_list, r_list)

    def compute(self) -> float:
        return self.scores / self.words if self.words else float("inf")
