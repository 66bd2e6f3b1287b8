"""Structured per-phase timing + optional jax.profiler traces.

The reference's observability is ad-hoc time.monotonic prints scattered
through next_batch and the wrapper (SURVEY.md §5.1). This module keeps the
same phase taxonomy (pi-sampling / prior-update / nystrom / recombination /
gp-fit) as structured records, with an opt-in XLA profiler trace context.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax

PHASES = ("gp_fit", "pi_sampling", "prior_update", "nystrom",
          "recombination", "objective_eval")


class Tracer:
    """Collects (phase -> list of durations) with nesting-safe spans."""

    def __init__(self, profile_dir: Optional[str] = None):
        self.records: dict[str, list[float]] = defaultdict(list)
        self.profile_dir = profile_dir
        self._profiling = False

    @contextlib.contextmanager
    def span(self, phase: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # drain async dispatch so the span measures device time
                (jax.effects_barrier()
                 if hasattr(jax, "effects_barrier") else None)
            self.records[phase].append(time.perf_counter() - t0)

    def start_profile(self):
        if self.profile_dir and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True

    def stop_profile(self):
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for phase, times in self.records.items():
            out[phase] = {
                "count": len(times),
                "total_s": sum(times),
                "mean_s": sum(times) / len(times),
                "max_s": max(times),
            }
        return out

    def report(self) -> str:
        lines = [f"{'phase':<16}{'count':>6}{'total [s]':>12}{'mean [s]':>12}"]
        for phase, s in sorted(self.summary().items()):
            lines.append(f"{phase:<16}{s['count']:>6}{s['total_s']:>12.4f}"
                         f"{s['mean_s']:>12.4f}")
        return "\n".join(lines)
