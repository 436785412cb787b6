"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock brackets around the decode loop
(SURVEY.md §5). Here: the same two public metrics (avg accept tokens, TPOT) plus
`jax.profiler` trace capture and a lightweight phase timer for breakdowns.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/umbrella_tpu_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per phase; `block=True` syncs the device first."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.time()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            ms = 1000 * self.totals[name] / max(n, 1)
            lines.append(f"{name}: {ms:.2f} ms/call x{n}")
        return "\n".join(lines)
