"""Profiling / complexity utilities.

Replaces the reference's thop/ptflops imports + commented call sites
(tools/runner_pretrain.py:17-19,154-159) with the TPU-native equivalents:
``jax.profiler`` traces and XLA cost analysis (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict

import jax


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def cost_analysis(fn: Callable, *args) -> Dict[str, Any]:
    """FLOPs / bytes-accessed from the compiled executable's cost analysis
    (XLA's equivalent of thop.profile)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # some backends return one dict per device
        ca = ca[0] if ca else {}
    if ca is None:            # ...and some return nothing at all
        ca = {}
    return {
        "flops": ca.get("flops", float("nan")),
        "bytes_accessed": ca.get("bytes accessed", float("nan")),
        "raw": ca,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf
    (jax.profiler.trace)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with device sync (role of the reference's
    batch_time/data_time AverageMeters, runner_pretrain.py:107-108)."""

    def __init__(self):
        import time

        self._time = time.perf_counter
        self.reset()

    def reset(self):
        self._t0 = self._time()
        self.laps = []

    def lap(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        t = self._time()
        dt = t - self._t0
        self._t0 = t
        self.laps.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.laps) / max(len(self.laps), 1)
