"""Profiling / observability.

The reference has no in-tree tracing (SURVEY.md §5: TensorBoard scalars
only); the TPU-native equivalents here are: jax.profiler trace capture
(viewable in TensorBoard/Perfetto/XProf), a step-time meter, and an RTFx
(audio-seconds per wall-second) meter for serving dashboards.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/prof'): run_steps()`."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the timeline)."""
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Rolling step-time / throughput meter."""

    window: int = 50
    _times: List[float] = field(default_factory=list)
    _last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def steps_per_sec(self) -> float:
        st = self.mean_step_time
        return 1.0 / st if st else 0.0


@dataclass
class RTFxMeter:
    """Real-time factor: audio seconds processed per wall second."""

    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float) -> None:
        assert self._t0 is not None
        self.wall_seconds += time.perf_counter() - self._t0
        self.audio_seconds += audio_seconds
        self._t0 = None

    @property
    def rtfx(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0


def memory_stats() -> Dict[str, int]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {k: int(v) for k, v in s.items()}
        except Exception:
            pass
    return out
