"""Shared timing discipline for the TPU benchmark tools.

The axon dev tunnel's ``block_until_ready`` does not await, so every
measurement needs a VALUE READ (``float(jnp.sum(...))``) to force
completion, a warm-up call to exclude compilation, and min-of-3 samples
because host contention on the 1-core box skews single samples in both
directions (see docs/PERFORMANCE.md). ``bench.py`` keeps its own copy of
this pattern so the driver-facing benchmark stays self-contained.
"""

from __future__ import annotations

import time


def force(value) -> float:
    """Force completion of a jax value tree; returns a host float."""
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree_util.tree_leaves(value)[0]))


def min_time(fn, *args, samples: int = 3) -> float:
    """Seconds for one completed ``fn(*args)`` call: warm-up, then min of
    ``samples`` timed calls with a value read each."""
    force(fn(*args))
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_rate(run, n1: int, n2: int) -> float:
    """Work items per second from the slope between two workload sizes
    (cancels fixed dispatch/tunnel cost). ``run(n)`` -> seconds."""
    t1 = run(n1)
    t2 = run(n2)
    return (n2 - n1) / max(t2 - t1, 1e-9)
