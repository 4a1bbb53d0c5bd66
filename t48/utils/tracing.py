"""Profiling and throughput tracing — the TPU observability idiom.

The reference's whole observability story is a wall-clock runtime file and
per-10-episode console prints (experiments.py:82,133-136,
dqn_lib.py:210-212; SURVEY.md §5 'Tracing/profiling: absent'). TPU-native
replacement:

- ``profile_session(logdir)`` captures a perfetto/XPlane trace via
  ``jax.profiler`` around any code region (open in TensorBoard or
  ui.perfetto.dev);
- ``step_annotation(name, step)`` labels device work inside a capture with
  ``jax.profiler.StepTraceAnnotation`` so chunks show up as named steps;
- ``ThroughputMeter`` tracks env-steps/s and episodes/s (the BASELINE.json
  headline metrics) with EMA smoothing for live logging.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_session(logdir: str):
    """Capture a device+host profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: int):
    """Named step annotation visible in the captured trace."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


class ThroughputMeter:
    """Running env-steps/s and episodes/s with exponential smoothing."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._last_time: Optional[float] = None
        self._last_steps = 0
        self._last_episodes = 0
        self.steps_per_s = 0.0
        self.episodes_per_s = 0.0
        self.total_steps = 0
        self.total_episodes = 0

    def reset_baseline(self) -> None:
        """Restart rate tracking from the CURRENT totals — call after the
        first (compile-laden) chunk so short runs report steady-state
        throughput, not compile amortization."""
        self._last_time = None
        self._first_time = None
        self.steps_per_s = 0.0
        self.episodes_per_s = 0.0

    def update(self, total_steps: int, total_episodes: int) -> None:
        now = time.perf_counter()
        if getattr(self, "_first_time", None) is None:
            self._first_time = now
            self._first_steps = total_steps
            self._first_episodes = total_episodes
        if self._last_time is not None:
            dt = max(now - self._last_time, 1e-9)
            inst_steps = (total_steps - self._last_steps) / dt
            inst_eps = (total_episodes - self._last_episodes) / dt
            s = self.smoothing if self.steps_per_s else 0.0
            self.steps_per_s = s * self.steps_per_s + (1 - s) * inst_steps
            self.episodes_per_s = s * self.episodes_per_s + (1 - s) * inst_eps
        self._last_time = now
        self._last_steps = total_steps
        self._last_episodes = total_episodes
        self.total_steps = total_steps
        self.total_episodes = total_episodes

    def summary(self) -> dict:
        out = {
            "env_steps_per_s": round(self.steps_per_s, 1),
            "episodes_per_s": round(self.episodes_per_s, 2),
            "total_env_steps": self.total_steps,
            "total_episodes": self.total_episodes,
        }
        first_t = getattr(self, "_first_time", None)
        if first_t is not None and self._last_time and self._last_time > first_t:
            dt = self._last_time - first_t
            out["avg_env_steps_per_s"] = round(
                (self.total_steps - self._first_steps) / dt, 1
            )
            out["avg_episodes_per_s"] = round(
                (self.total_episodes - self._first_episodes) / dt, 2
            )
        return out
