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


def timeit_chained(fn, args, *, perturb_argnum: int = 0, iters: int = 50,
                   trials: int = 3, warmup: int = 8,
                   subtract_fixed: bool = False) -> float:
    """Median seconds per call of `fn(*args)`, measured honestly on remote
    platforms.

    Each iteration's designated input is perturbed by a zero scalar derived
    from the previous iteration's output, so consecutive calls form a data
    dependency chain: the device cannot overlap them and the host cannot
    under-measure them.  This matters under the axon TPU tunnel, where
    `block_until_ready` was measured to return ~40x before the compute
    actually finished (round-1 bench reported 25.7k pairs/s, an impossible
    >100% MFU; the chained measure gives the truth).  Only one blocking sync
    per trial, so per-iteration host round-trips don't pollute the number.

    subtract_fixed=True additionally measures each trial at `iters` AND
    `3*iters` chained calls and returns the SLOPE (T3 - T1) / (2*iters) —
    the steady-state per-call time with the per-burst fixed cost (the final
    payload-fetch RPC over the tunnel, ~20-25 ms measured round 5)
    subtracted exactly.  The chain still serializes the device, so the slope
    cannot under-measure device time; burst timings at 20/40/80 iterations
    fit T = fixed + N*t to ~2% (ROUND5.md).  Without it, short bursts
    overstate per-call time — by ~50% at batch-1 latency scales.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(eps, *a):
        a = list(a)
        a[perturb_argnum] = jax.tree_util.tree_map(
            lambda x: x + eps.astype(x.dtype), a[perturb_argnum])
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return out, (leaf.ravel()[0] * 0).astype(jnp.float32)

    eps = jnp.float32(0.0)
    out, eps = chained(eps, *args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out, eps = chained(eps, *args)
    jax.block_until_ready(out)
    def burst(n):
        nonlocal out, eps
        t0 = time.perf_counter()
        for _ in range(n):
            out, eps = chained(eps, *args)
        jax.block_until_ready(out)
        # belt and braces: force a real payload fetch of the chain scalar
        float(eps)
        return time.perf_counter() - t0

    times = []
    for _ in range(trials):
        if subtract_fixed:
            t1 = burst(iters)
            t3 = burst(3 * iters)
            times.append((t3 - t1) / (2 * iters))
        else:
            times.append(burst(iters) / iters)
    return sorted(times)[len(times) // 2]


def cost_analysis_flops(fn, *args) -> float:
    """Estimated FLOPs of a jitted callable from XLA's cost model."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if not cost:
        return float("nan")
    return float(cost.get("flops", float("nan")))
