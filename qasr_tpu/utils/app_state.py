"""Process/global state singleton.

Equivalent of the reference AppState (utils/app_state.py:18-213) and
get_rank (utils/get_rank.py:22-48): world size / ranks resolved from
jax.distributed (when initialized) or SLURM/env vars, plus experiment
bookkeeping fields the exp_manager reads.
"""
from __future__ import annotations

import os
from typing import Optional


def env_rank() -> int:
    """RANK / SLURM_PROCID detection (get_rank.py:22-48)."""
    for var in ("RANK", "SLURM_PROCID", "JAX_PROCESS_INDEX"):
        if os.environ.get(var) is not None:
            return int(os.environ[var])
    return 0


def env_world_size() -> int:
    for var in ("WORLD_SIZE", "SLURM_NTASKS", "JAX_PROCESS_COUNT"):
        if os.environ.get(var) is not None:
            return int(os.environ[var])
    return 1


def is_global_rank_zero() -> bool:
    return env_rank() == 0


class AppState:
    _instance: Optional["AppState"] = None

    def __new__(cls):
        if cls._instance is None:
            inst = super().__new__(cls)
            inst.device_id = None
            inst.log_dir = None
            inst.exp_dir = None
            inst.checkpoint_name = None
            inst.version = None
            inst.model_parallel_size = 1
            inst.model_parallel_rank = 0
            cls._instance = inst
        return cls._instance

    @property
    def global_rank(self) -> int:
        try:
            import jax

            return jax.process_index()
        except Exception:
            return env_rank()

    @property
    def world_size(self) -> int:
        try:
            import jax

            return jax.process_count()
        except Exception:
            return env_world_size()

    @property
    def local_rank(self) -> int:
        return int(os.environ.get("LOCAL_RANK", self.global_rank))
