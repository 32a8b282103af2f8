"""Tracing / profiling utilities.

The reference's observability is thop FLOPs + a wall-clock FPS loop + tqdm
(SURVEY §5).  Here: `jax.profiler` trace capture (viewable in TensorBoard /
Perfetto), per-step timing aggregation, and an XLA cost-analysis FLOPs report.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace under `log_dir` (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running mean/percentile step timer (host wall clock around dispatch)."""

    def __init__(self) -> None:
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self.samples.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        xs = sorted(self.samples)
        n = len(xs)
        return {
            "mean_ms": 1000 * sum(xs) / n,
            "p50_ms": 1000 * xs[n // 2],
            "p95_ms": 1000 * xs[min(n - 1, int(n * 0.95))],
            "steps": n,
        }


def cost_analysis_flops(fn, *args) -> float:
    """Estimated FLOPs of a jitted callable from XLA's cost model."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if not cost:
        return float("nan")
    return float(cost.get("flops", float("nan")))
