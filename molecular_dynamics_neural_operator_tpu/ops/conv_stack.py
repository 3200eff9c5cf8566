"""Weight-tied edge-conv stack with a hand-written VJP.

The GKN applies 2*depth edge-conditioned conv layers that all contract the
SAME per-edge kernel tensor K (the reference ties one DenseNet across both
conv stacks, ``/root/reference/graph_kernel.py:271-273``). Under plain
autodiff the backward pass accumulates

    dK = sum_l  xs_l (x) dm_l

one layer at a time — 2*depth read-modify-write passes over a K-sized
((B, E, w, w), ~270 MB bf16 / ~540 MB f32 grad at B=128, E=256) HBM
accumulator, which dominates the training step (measured: each extra layer
costs ~2.2 ms at B=128 — pure bandwidth).

This custom VJP stashes the tiny per-layer residuals instead (xs_l and the
relu masks, (L, E, w) each — ~50 MB bf16 for the whole batch) and forms dK
with ONE einsum over the layer axis at the end: per (batch, edge) a
(w, L) @ (L, w) matmul. K is still read once per layer in both passes (the
dxs contraction needs it — that traffic is intrinsic), but the accumulator
churn is gone.

Math identical to ``ops/edge_conv.edge_conv_sparse`` one-hot form; exactness
is pinned against plain autodiff in tests/test_conv_stack.py. vmap-safe
(jax batches custom_vjp fwd/bwd), so it drops into the per-example forward
under ``jax.vmap`` + ``jax.grad``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def tied_conv_stack(
    depth: int,
    compute_dtype,
    x0: Array,
    kernels: Array,
    g: Array,
    d: Array,
    mask: Array,
    inv_deg: Array,
    root1: Array,
    bias1: Array,
    root2: Array,
    bias2: Array,
) -> Array:
    """relu(conv1)^depth then relu(conv2)^depth with one shared K.

    x0: (R, w); kernels: (E, w, w); g/d: (E, R) source/target one-hots;
    mask: (E,); inv_deg: (R,). Returns (R, w).
    """
    out, _ = _fwd(depth, compute_dtype, x0, kernels, g, d, mask, inv_deg,
                  root1, bias1, root2, bias2)
    return out


def _one_layer(x, kernels, g, d, mask, inv_deg, root, bias, cd):
    xs = jnp.dot(g, x.astype(cd), preferred_element_type=jnp.float32)
    m = jnp.einsum(
        "ew,ewv->ev", xs.astype(cd), kernels,
        preferred_element_type=jnp.float32,
    ) * mask[:, None]
    agg = jax.lax.dot_general(
        d, m.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_deg[:, None]
    rootx = jnp.dot(
        x.astype(cd), root.astype(cd), preferred_element_type=jnp.float32
    )
    z = agg + rootx + bias
    return jnp.maximum(z, 0.0), xs


def _fwd(depth, compute_dtype, x0, kernels, g, d, mask, inv_deg,
         root1, bias1, root2, bias2) -> Tuple[Array, tuple]:
    cd = compute_dtype
    g_cd = g.astype(cd)
    d_cd = d.astype(cd)
    x = x0
    xs_list = []
    x_list = [x0]
    for layer in range(2 * depth):
        root = root1 if layer < depth else root2
        bias = bias1 if layer < depth else bias2
        x, xs = _one_layer(x, kernels, g_cd, d_cd, mask, inv_deg, root,
                           bias, cd)
        xs_list.append(xs.astype(cd))
        x_list.append(x)
    res = (jnp.stack(xs_list), jnp.stack(x_list), kernels, g_cd, d_cd,
           mask, inv_deg, root1, root2)
    return x, res


def _bwd(depth, compute_dtype, res, g_out):
    cd = compute_dtype
    (xs_stack, x_stack, kernels, g_cd, d_cd, mask, inv_deg,
     root1, root2) = res
    f32 = jnp.float32

    dx = g_out
    dm_list = [None] * (2 * depth)
    droot1 = jnp.zeros_like(root1, dtype=f32)
    droot2 = jnp.zeros_like(root2, dtype=f32)
    dbias1 = jnp.zeros((root1.shape[-1],), f32)
    dbias2 = jnp.zeros((root2.shape[-1],), f32)
    for layer in reversed(range(2 * depth)):
        root = root1 if layer < depth else root2
        x_in = x_stack[layer]
        x_out = x_stack[layer + 1]
        dz = dx * (x_out > 0.0)                                # (R, w)
        dr = jax.lax.dot_general(                              # (w, w)
            x_in.astype(cd), dz.astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        db = jnp.sum(dz, axis=0)
        if layer < depth:
            droot1, dbias1 = droot1 + dr, dbias1 + db
        else:
            droot2, dbias2 = droot2 + dr, dbias2 + db
        dagg = dz * inv_deg[:, None]
        dm = jnp.dot(
            d_cd, dagg.astype(cd), preferred_element_type=f32
        ) * mask[:, None]                                      # (E, w)
        dm_list[layer] = dm.astype(cd)
        dxs = jnp.einsum(
            "ev,ewv->ew", dm.astype(cd), kernels,
            preferred_element_type=f32,
        )
        dx = (
            jnp.dot(dz.astype(cd), root.astype(cd).T,
                    preferred_element_type=f32)
            + jax.lax.dot_general(
                g_cd, dxs.astype(cd),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        )

    dm_stack = jnp.stack(dm_list)                              # (L, E, w)
    # ONE pass forms the whole kernel-tensor gradient: per edge a
    # (w, L) @ (L, w) contraction over the layer axis.
    dk = jnp.einsum(
        "lew,lev->ewv", xs_stack, dm_stack, preferred_element_type=f32
    ).astype(kernels.dtype)

    return (dx, dk, None, None, None, None,
            droot1, dbias1, droot2, dbias2)


tied_conv_stack.defvjp(_fwd, _bwd)
