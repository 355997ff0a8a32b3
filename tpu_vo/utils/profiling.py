"""Tracing/profiling hooks (SURVEY.md §5: the reference has none).

Three tools:
  - trace(): context manager around jax.profiler.trace for TensorBoard-
    compatible device traces (set TPU_VO_TRACE_DIR or pass a path).
  - StageTimer: wall-clock per-stage timing with explicit device fences.
    On remote-execution platforms block_until_ready can return before the
    work runs, so the fence fetches one element of each output leaf.
  - benchmark(fn, *args): compile/steady-state split measurement used by
    bench.py and the benchmarks/ harness.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax


def fence(tree: Any) -> None:
    """Reliably wait for a pytree of device arrays (fetch-based fence)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.numpy.ravel(leaf)[:1])


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Device trace via jax.profiler; no-op if tracing is unsupported."""
    log_dir = log_dir or os.environ.get("TPU_VO_TRACE_DIR")
    if not log_dir:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield


class StageTimer:
    """Accumulates per-stage wall times with device fences.

    Usage:
        timer = StageTimer()
        with timer.stage("features"):
            out = feature_fn(x)
            timer.sync(out)
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._t0 = 0.0
        self._name = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def sync(self, tree: Any) -> None:
        fence(tree)

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:24s} {total*1000:10.2f} ms total "
                f"({total/n*1000:8.2f} ms/call x {n})"
            )
        return "\n".join(lines)


def benchmark(fn: Callable, *args, repeats: int = 3,
              warmup: int = 2) -> Dict[str, float]:
    """Measure fn(*args): returns dict with compile and steady seconds."""
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    first = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        fence(fn(*args))

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    fence(out)
    steady = (time.perf_counter() - t0) / repeats
    return {"first_call_s": first, "steady_s": steady}
