"""GNS-style random-walk input noise for rollout robustness.

The reference trains purely teacher-forced on clean windows
(``/root/reference/graph_kernel.py:445-474``) and its free rollouts
collapse toward a constant by step ~1,000 (``bba_analysis.ipynb`` cells
19-23). The standard mitigation from the learned-simulator literature
(Sanchez-Gonzalez et al. 2020, "Learning to Simulate Complex Physics with
Graph Networks") is to corrupt the TRAINING inputs with accumulated
("random-walk") coordinate noise while keeping the targets clean: the
model then learns to pull slightly-off-manifold states — exactly what its
own rollout produces — back toward the data distribution. It composes
with (and is cheaper than) the K-step rollout curriculum: noise perturbs
the input distribution in ONE forward, the curriculum exposes the true
model-error distribution over K forwards.

Random-walk accumulation (not i.i.d. per-frame noise) matters because the
window encoder is an LSTM over frames: i.i.d. noise of scale s perturbs
each implied velocity by ~s*sqrt(2), while a random walk whose increments
have std s/sqrt(T) perturbs velocities by only ~s/sqrt(T) per step and
positions by s at the window's end — matching how rollout error actually
builds up (drift, not jitter).

The noise is a pure function of ``(rng, step)`` via ``fold_in`` — nothing
in the train state mutates, steps stay bitwise reproducible, and a
batch-sharded step generates IDENTICAL global noise to the single-device
step (the generation depends only on the global shape, so the
single-vs-sharded parity pins hold with noise enabled).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def window_random_walk_noise(key, shape, noise_std: float, dtype=None):
    """Accumulated coordinate noise for a window batch.

    shape: ``(..., T, R, 3)`` with the time axis third-from-last is NOT
    assumed — the walk runs over ``axis=-3`` which is the frame axis for
    both ``(B, T, R, 3)`` batches and ``(T, R, 3)`` single windows.
    Increments are i.i.d. N(0, (noise_std/sqrt(T))^2) and cumsum'd over
    frames, so the LAST frame (the one the delta head extrapolates from,
    and the one rollout rebuilds the graph from) carries std exactly
    ``noise_std`` while earlier frames carry proportionally less.
    """
    t = shape[-3]
    eps = jax.random.normal(key, shape, dtype or jnp.float32)
    eps = eps * (noise_std / math.sqrt(t))
    return jnp.cumsum(eps, axis=-3)


def noised_window(window, rng, step, noise_std: float):
    """Corrupt a window batch deterministically for train step ``step``.

    ``rng`` is ``TrainState.rng`` (never advanced — the per-step key is
    ``fold_in(rng, step)``). ``noise_std <= 0`` returns the window
    untouched, so factories can pass the knob through unconditionally.
    """
    if noise_std <= 0.0:
        return window
    key = jax.random.fold_in(rng, step)
    noise = window_random_walk_noise(key, window.shape, noise_std,
                                     dtype=window.dtype)
    return window + noise
