"""Tracing / profiling subsystem.

The reference's observability is wall-clock timers sprinkled per project
(SURVEY.md §5: MGP-STR forward_time test_final.py:137; LORE tot/net/dec/post
timers with explicit cuda.synchronize base_detector.py; FLOPs counters).
Here profiling is one first-class module:

- `trace(dir)` — context manager around `jax.profiler` emitting a Perfetto/
  TensorBoard trace of the wrapped region (XLA ops, fusion, HBM traffic).
- `StepTimer` — per-stage wall timing with device sync, the moral
  equivalent of LORE's tot/net/dec/post breakdown but sync-correct on TPU.
- `flops_estimate(fn, *args)` — XLA cost analysis of a jitted function
  (replaces MGP-STR's get_flops, test_final.py:391).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-stage timings. Every stop() blocks on the given
    arrays so the timing covers device work, not dispatch."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._starts: Dict[str, float] = {}

    def start(self, stage: str) -> None:
        self._starts[stage] = time.perf_counter()

    def stop(self, stage: str, *sync_on: Any) -> float:
        for x in sync_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._starts.pop(stage)
        self.totals[stage] += dt
        self.counts[stage] += 1
        return dt

    @contextlib.contextmanager
    def stage(self, name: str, sync_on: Any = None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, *( [sync_on] if sync_on is not None else [] ))

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in sorted(self.totals)}

    def report(self) -> str:
        return " | ".join(f"{k}: {v * 1e3:.1f}ms" for k, v in
                          self.summary().items())


def flops_estimate(fn, *args) -> Optional[float]:
    """Total FLOPs of `fn(*args)` per XLA's cost analysis (None if the
    backend doesn't expose it)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) if analysis else None
    except Exception:
        return None
