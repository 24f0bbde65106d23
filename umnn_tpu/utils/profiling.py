"""Profiling helpers: jax.profiler traces + queue-drained wall timing.

The reference's only observability is `timeit.default_timer` around epochs
(SURVEY.md §5.1). On TPU, `jax.profiler` captures device traces viewable in
TensorBoard/Perfetto; and because async dispatch means wall clocks lie, the
timing helpers here drain the device queue with a scalar readback (the
pattern bench.py uses — `jax.block_until_ready` alone under-reports through
remote-device tunnels).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "timed_steps", "device_time"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/umnn_tpu_trace"):
    """Capture a device trace around a block:

        with trace("/tmp/tb"):
            step(params, batch)
        # then: tensorboard --logdir /tmp/tb  (or open in Perfetto)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _drain(out: Any) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])


def device_time(fn: Callable, *args, iters: int = 20) -> float:
    """Per-call seconds with the dispatch/readback floor subtracted:
    enqueue ``iters`` calls, drain once."""
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _drain(out)
    floor = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return max((time.perf_counter() - t0 - floor) / max(iters - 1, 1), 0.0)


def timed_steps(step_fn: Callable, n: int = 10, **kwargs) -> dict:
    """Run ``step_fn()`` n times; return wall stats (for epoch loops)."""
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = step_fn(**kwargs)
        _drain(out)
        ts.append(time.perf_counter() - t0)
    return {
        "mean_s": sum(ts) / len(ts),
        "min_s": min(ts),
        "max_s": max(ts),
        "total_s": sum(ts),
    }
