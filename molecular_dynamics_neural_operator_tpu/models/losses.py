"""Relative/absolute Lp losses for neural operators.

Exact functional equivalent of the reference's ``LpLoss``
(``/root/reference/graph_kernel.py:75-122``): per-example flattened Lp
norms, ``rel = ||x - y||_p / ||y||_p``, ``abs`` with uniform-mesh scaling
``h^(d/p)``, reduced by mean (``size_average=True``) or sum. The training
driver uses ``LpLoss(size_average=False)`` — i.e. *sum* of relative errors
over the batch (``graph_kernel.py:547``) — so that is the default the
training loop requests.
"""

from __future__ import annotations

import jax.numpy as jnp


def _flatten(x):
    return x.reshape(x.shape[0], -1)


def lp_rel(x, y, p: int = 2, size_average: bool = True, reduction: bool = True):
    """sum/mean over batch of ||x - y||_p / ||y||_p on flattened examples."""
    xf, yf = _flatten(x), _flatten(y)
    diff_norms = jnp.linalg.norm(xf - yf, ord=p, axis=1)
    y_norms = jnp.linalg.norm(yf, ord=p, axis=1)
    ratios = diff_norms / y_norms
    if not reduction:
        return ratios
    return jnp.mean(ratios) if size_average else jnp.sum(ratios)


def lp_abs(x, y, d: int = 2, p: int = 2, size_average: bool = True,
           reduction: bool = True):
    """Mesh-scaled absolute Lp norm: h^(d/p) * ||x - y||_p per example."""
    xf, yf = _flatten(x), _flatten(y)
    h = 1.0 / (x.shape[1] - 1.0)
    all_norms = (h ** (d / p)) * jnp.linalg.norm(xf - yf, ord=p, axis=1)
    if not reduction:
        return all_norms
    return jnp.mean(all_norms) if size_average else jnp.sum(all_norms)


def mse(x, y):
    """Plain mean-squared error (the secondary metric the reference tracks,
    ``graph_kernel.py:449,465``)."""
    return jnp.mean((x - y) ** 2)
