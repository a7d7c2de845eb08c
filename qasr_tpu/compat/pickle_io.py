"""Synthetic-calibration-data pickle interop.

The reference dumps `list[torch.Tensor]` of shape (B, C, T) named
``{prefix}_nb{N}_iter{I}_lr{lr:.3f}.pkl`` (synthesize.py:94-104) and loads
them in inference.py:93-97.  We read/write that exact format (torch tensors
when torch is importable, plain numpy arrays otherwise — both load fine on
our side; reference-side interop requires the torch flavor).
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np


def synthetic_filename(prefix: str, num_batch: int, train_iter: int, lr: float,
                       dump_path: Optional[str] = None) -> str:
    name = "%s_nb%d_iter%d_lr%.3f.pkl" % (prefix, num_batch, train_iter, lr)
    if dump_path:
        os.makedirs(dump_path, exist_ok=True)
        name = os.path.join(dump_path, name)
    return name


def save_synthetic(path: str, batches_btc: List[np.ndarray]) -> None:
    """batches are (B, T, C) internally; dumped as reference-layout (B, C, T)."""
    bct = [np.ascontiguousarray(np.asarray(b).transpose(0, 2, 1)) for b in batches_btc]
    try:
        import torch
        payload = [torch.from_numpy(b) for b in bct]
    except ImportError:
        payload = bct
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_synthetic(path: str) -> List[np.ndarray]:
    """Returns (B, C, T) arrays exactly as the reference stores them
    (ASRModel.calibrate auto-detects and transposes)."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    out = []
    for t in data:
        if hasattr(t, "numpy"):
            t = t.detach().cpu().numpy()
        out.append(np.asarray(t, np.float32))
    return out
