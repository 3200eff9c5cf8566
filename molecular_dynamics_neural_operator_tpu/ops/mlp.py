"""Functional linear / MLP primitives.

TPU-native equivalent of the reference's ``DenseNet`` MLP builder
(``/root/reference/graph_kernel.py:217-242``): a list of layer sizes with a
nonlinearity between layers (no BatchNorm by default, matching the
reference's usage which never passes ``normalize=True``).

Parameters are plain pytrees (nested dicts of ``jax.Array``) so they compose
directly with jit / grad / shard_map. Initialization follows torch's
``nn.Linear`` default (Kaiming-uniform W, uniform bias, both with bound
1/sqrt(fan_in)) so training dynamics are comparable with the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.maximum(in_dim, 1)).astype(jnp.float32)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(params, x, compute_dtype=None):
    """y = x @ w + b with optional low-precision matmul, f32 accumulation."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """Init an MLP with layer widths ``sizes`` (e.g. [6, 1024, 1024, 4096])."""
    keys = jax.random.split(key, len(sizes) - 1)
    return {
        f"layer_{i}": linear_init(k, sizes[i], sizes[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def mlp_apply(params, x, activation=jax.nn.relu, compute_dtype=None):
    """Apply the MLP; activation between layers, none on the output
    (``DenseNet`` with ``out_nonlinearity=None``, graph_kernel.py:236-237)."""
    n = len(params)
    for i in range(n):
        x = linear_apply(params[f"layer_{i}"], x, compute_dtype)
        if i != n - 1:
            x = activation(x)
    return x
