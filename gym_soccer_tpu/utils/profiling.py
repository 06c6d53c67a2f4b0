"""Tracing / profiling / throughput instrumentation (SURVEY.md §5.1).

The reference's only instrumentation is wall-clock prints in main()
(soccer_simultaneous_env.py:530-551).  Here:

* `phase(name)` — wall-clock phase timer with a structured summary;
* `Throughput` — env-steps/s counter for rollout/training loops;
* `trace(dir)` — jax.profiler trace context (view in TensorBoard/XProf/
  Perfetto) around hot sections.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List

import jax

_PHASES: List[dict] = []


@contextlib.contextmanager
def phase(name: str, sync: bool = True):
    """Time a phase; optionally block on device work before stopping the
    clock (otherwise async dispatch makes timings meaningless)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            (jax.device_put(0) + 0).block_until_ready()
        dt = time.perf_counter() - t0
        _PHASES.append({"phase": name, "seconds": round(dt, 4)})


def phase_report(clear: bool = True) -> List[dict]:
    out = list(_PHASES)
    if clear:
        _PHASES.clear()
    return out


class Throughput:
    """Steps/s counter: `tick(n_steps)` after each timed chunk."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n_env_steps: int) -> None:
        self.steps += int(n_env_steps)

    @property
    def per_second(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return {"env_steps": self.steps,
                "env_steps_per_s": round(self.per_second)}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a hot region (XLA + TPU timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_json(**fields) -> None:
    """One structured log line (the framework's observability contract)."""
    print(json.dumps(fields, sort_keys=True))
