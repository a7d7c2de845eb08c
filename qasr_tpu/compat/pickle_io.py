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


# Globals a tensor-payload pickle legitimately references: numpy array
# reconstruction and torch's tensor/storage rebuild machinery.  Nothing here
# can execute arbitrary code at unpickle time.
_SAFE_GLOBALS = {
    ("collections", "OrderedDict"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("torch._utils", "_rebuild_tensor_v2"),
    ("torch._utils", "_rebuild_tensor"),
    ("torch.serialization", "_get_layout"),
}


def _safe_load_from_bytes(b):
    """Replacement for torch.storage._load_from_bytes, which internally runs
    torch.load(weights_only=False) — a full-unpickle escape hatch that would
    defeat this sandbox.  Plain-pickled torch tensors route their storage
    through it; re-loading the nested payload with weights_only=True keeps
    them loading while refusing code execution."""
    import io

    import torch

    return torch.load(io.BytesIO(b), map_location="cpu", weights_only=True)


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) == ("torch.storage", "_load_from_bytes"):
            return _safe_load_from_bytes
        if (module, name) in _SAFE_GLOBALS:
            return super().find_class(module, name)
        # torch.FloatStorage / torch.HalfStorage / UntypedStorage etc.
        if module == "torch" and name.endswith("Storage"):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"blocked unpickling of {module}.{name}; synthetic-data pickles "
            f"may only contain numpy arrays / torch tensors "
            f"(pass trusted=True to override for files you trust)")


def load_synthetic(path: str, trusted: bool = False) -> List[np.ndarray]:
    """Returns (B, C, T) arrays exactly as the reference stores them
    (ASRModel.calibrate auto-detects and transposes).

    Trust boundary: reference-written pickles hold torch tensors, which a
    restricted unpickler can load safely; arbitrary pickles can execute code.
    By default only numpy/torch-tensor payloads are allowed; pass
    trusted=True to fall back to a full unpickle for exotic payloads you
    trust (reference synthesize.py:94-104 never produces those)."""
    with open(path, "rb") as f:
        data = (pickle.load(f) if trusted else _RestrictedUnpickler(f).load())
    out = []
    for t in data:
        if hasattr(t, "numpy"):
            t = t.detach().cpu().numpy()
        out.append(np.asarray(t, np.float32))
    return out
