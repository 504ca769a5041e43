"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock prints
(trajopt_folding.py:83,105; Scene_lifting.time_step:177-231). Here:
first-class phase timers plus a jax.profiler trace context for TensorBoard
traces of the compiled programs.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock phase timer (device-synchronizing)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:>24}: {tot:8.3f}s total, {tot/n*1e3:8.2f}ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_stats(fn, *args, **kwargs):
    """Lowered+compiled cost analysis of a jitted function on example args."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
    except Exception:
        cost = {}
    try:
        mem = compiled.memory_analysis()
    except Exception:
        mem = None
    return {"cost": cost, "memory": mem}
