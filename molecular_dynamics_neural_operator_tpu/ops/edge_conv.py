"""Edge-conditioned graph convolution (the GKN "kernel network").

TPU-native re-design of the reference's ``NNConv_old``
(``/root/reference/graph_kernel.py:125-214``):

    x_i' = x_i @ root + mean_{j in N(i)} x_j @ reshape(h_theta(e_ji), w, w) + bias

with ``aggr="mean"`` as used by the model (``graph_kernel.py:272-273``).

Two deliberate departures from the reference's execution strategy, both
algorithmic wins on TPU:

1. **Kernel matrices are computed once per forward and reused.** The edge
   features are constant within a forward pass and the edge-kernel MLP is
   shared between both conv stacks (``graph_kernel.py:271-273``), yet the
   reference re-evaluates the 6 -> 1024 -> 1024 -> width^2 MLP inside every
   one of its 2*depth ``propagate`` calls. Hoisting it saves ~12x of the
   dominant FLOPs.

2. **No gather/scatter on the hot path.** Aggregation is expressed as
   matmuls: dense mode contracts the masked all-pairs kernel tensor directly;
   sparse mode uses one-hot incidence matmuls (gather = G @ x, scatter-add =
   S^T @ m), mapping the message passing onto the MXU instead of VPU
   scatter ops ("sparse GNNs on dense hardware").

Dense mode holds a (R, R, w, w) kernel tensor — ideal for small proteins
(BBA: R=28). Sparse mode holds (E_max, w, w) with a validity mask and
scales to ~10k-atom neighbor lists; set ``scatter_mode="segment"`` there so
aggregation uses ``segment_sum`` instead of an (E, N) one-hot — or
``"blocked"`` when the edge list is in the cell-list block layout
(slot n*max_degree + d targets node n, geometry/cells.py), which replaces
the scatter with a dense per-node reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from molecular_dynamics_neural_operator_tpu.ops.mlp import mlp_apply

Array = jax.Array


# Above this node count the (E, N) one-hot incidence matmuls stop paying
# and aggregation switches to segment_sum (or "blocked" for cell-list
# layouts). Shared by gkn_apply_single and the rollout scan's hint gate.
SCATTER_ONEHOT_MAX_NODES = 512


def _check_blocked_layout(num_edges: int, num_nodes: int) -> None:
    """The "blocked" modes require the cell-list block layout: exactly
    E == N * max_degree slots with slot n*max_degree + d targeting node
    n (geometry/cells.py). Divisibility is the checkable part."""
    if num_edges % num_nodes:
        raise ValueError(
            f"blocked scatter requires the cell-list block layout "
            f"(E == num_nodes * max_degree); got E={num_edges}, "
            f"num_nodes={num_nodes}"
        )


def edge_conv_init(key, width: int, dtype=jnp.float32):
    """Root weight + bias of one conv (the edge-kernel MLP is owned by the
    model so it can be *shared* across convs, reference parity:
    graph_kernel.py:271-273). Torch ``uniform(size, ...)`` init with
    bound 1/sqrt(in_channels) (torch_geometric ``inits.uniform``)."""
    kr, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.maximum(width, 1)).astype(jnp.float32)
    return {
        "root": jax.random.uniform(kr, (width, width), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (width,), dtype, -bound, bound),
    }


def edge_kernel_matrices(
    mlp_params, edge_feats: Array, width: int, compute_dtype=None
) -> Array:
    """h_theta(e) for every edge, reshaped to per-edge (width, width) matrices.

    edge_feats: (..., F) where leading axes are edge axes — (R, R, 6) dense,
    (E, 6) sparse. Returns (..., width, width) in ``compute_dtype`` (f32 if
    unset): the kernel tensor is the biggest live array of the training
    step ((B, E, w, w) — ~270 MB bf16 at B=128/E=256) and an f32 round-trip
    here doubles its HBM footprint for no accuracy gain (the consuming
    einsums accumulate in f32 regardless)."""
    h = mlp_apply(mlp_params, edge_feats, compute_dtype=compute_dtype)
    out_dtype = compute_dtype or jnp.float32
    return h.reshape(edge_feats.shape[:-1] + (width, width)).astype(out_dtype)


def quantize_kernels_int8(kernels: Array):
    """Symmetric per-edge int8 quantization of the kernel tensor.

    kernels: (..., E, w, w). Returns (k8 int8, scale f32 (..., E)) with
    ``k8 * scale ~= kernels``. The consuming conv folds ``scale`` into its
    per-edge message mask (``m * (mask * scale)``), so ``edge_conv_sparse``
    runs unmodified on the int8 tensor: the ``astype(compute_dtype)`` load
    converts on the fly inside the fused reduction, and HBM reads 1 byte
    per element instead of 2 (bf16) — the batched-serving bandwidth bound
    (docs/PERFORMANCE.md, "the serving cap")."""
    amax = jnp.max(jnp.abs(kernels.astype(jnp.float32)), axis=(-2, -1))
    scale = jnp.maximum(amax, 1e-30) / 127.0
    k8 = jnp.clip(
        jnp.round(kernels.astype(jnp.float32) / scale[..., None, None]),
        -127.0, 127.0,
    ).astype(jnp.int8)
    return k8, scale


def edge_conv_dense(
    conv_params, x: Array, kernels_masked: Array, inv_deg: Array,
    compute_dtype=None,
) -> Array:
    """One dense conv layer.

    x: (R, w); kernels_masked: (R, R, w, w) = kernel tensor pre-multiplied by
    the adjacency mask adj[j, i] (source axis first); inv_deg: (R,) = 1/deg_i.
    out[i] = inv_deg[i] * sum_{j, w} x[j, w] * K[j, i, w, v]
             + x[i] @ root + bias
    """
    cd = compute_dtype or x.dtype
    agg = jnp.einsum(
        "jw,jiwv->iv",
        x.astype(cd),
        kernels_masked.astype(cd),
        preferred_element_type=jnp.float32,
    )
    agg = agg * inv_deg[:, None]
    root = jnp.dot(
        x.astype(cd),
        conv_params["root"].astype(cd),
        preferred_element_type=jnp.float32,
    )
    return agg + root + conv_params["bias"]


def edge_conv_sparse(
    conv_params,
    x: Array,
    kernels: Array,
    edges: Array,
    mask: Array,
    inv_deg: Array,
    scatter_mode: str = "onehot",
    compute_dtype=None,
) -> Array:
    """One sparse (padded edge-list) conv layer.

    x: (R, w); kernels: (E, w, w); edges: (2, E) int32 [src; dst];
    mask: (E,) float; inv_deg: (R,) = 1 / real in-degree of each target.
    """
    cd = compute_dtype or x.dtype
    src, dst = edges[0], edges[1]
    r = x.shape[0]

    if scatter_mode == "onehot":
        # gather + scatter as MXU matmuls via one-hot incidence matrices
        g = (src[:, None] == jnp.arange(r)[None, :]).astype(cd)  # (E, R)
        xs = jnp.dot(g, x.astype(cd), preferred_element_type=jnp.float32)
        m = jnp.einsum(
            "ew,ewv->ev",
            xs.astype(cd),
            kernels.astype(cd),
            preferred_element_type=jnp.float32,
        )
        m = m * mask[:, None]
        s = (dst[:, None] == jnp.arange(r)[None, :]).astype(cd)  # (E, R)
        agg = jnp.dot(s.T.astype(cd), m.astype(cd), preferred_element_type=jnp.float32)
    elif scatter_mode in ("segment", "blocked"):
        xs = x[src]
        m = jnp.einsum(
            "ew,ewv->ev",
            xs.astype(cd),
            kernels.astype(cd),
            preferred_element_type=jnp.float32,
        )
        m = m * mask[:, None]
        if scatter_mode == "blocked":
            # Cell-list block layout (geometry/cells.py:95): edge slot
            # n*max_degree + d always targets node n, so the edges->nodes
            # aggregation is a dense per-block reduction — no scatter op
            # at all (TPU scatters serialize). Padded slots contribute 0
            # via the mask. ONLY valid for graphs built by
            # cell_list_edges; callers opt in explicitly.
            _check_blocked_layout(m.shape[0], r)
            agg = m.reshape(r, -1, m.shape[-1]).sum(axis=1)
        else:
            agg = jax.ops.segment_sum(m, dst, num_segments=r)
    else:
        raise ValueError(f"unknown scatter_mode: {scatter_mode}")

    agg = agg * inv_deg[:, None]
    root = jnp.dot(
        x.astype(cd),
        conv_params["root"].astype(cd),
        preferred_element_type=jnp.float32,
    )
    return agg + root + conv_params["bias"]


def sparse_inv_degree(edges: Array, mask: Array, num_nodes: int,
                      scatter_mode: str = "onehot") -> Array:
    """1 / (number of real incoming edges) per target node, min degree 1.

    Default "onehot" counts degrees with a one-hot matvec — scatter-free,
    so it stays fast under vmap (a vmapped ``segment_sum`` lowers to a
    batched scatter, which serializes on TPU). "segment" is for large node
    counts where an (E, N) one-hot would not pay.
    """
    if scatter_mode == "onehot":
        s = (edges[1][:, None] == jnp.arange(num_nodes)[None, :]).astype(
            mask.dtype
        )
        deg = jnp.dot(mask, s, preferred_element_type=jnp.float32)
    elif scatter_mode == "blocked":
        # cell-list block layout: slot n*max_degree + d targets node n
        _check_blocked_layout(mask.shape[0], num_nodes)
        deg = mask.reshape(num_nodes, -1).sum(axis=1)
    else:
        deg = jax.ops.segment_sum(mask, edges[1], num_segments=num_nodes)
    return 1.0 / jnp.maximum(deg, 1.0)
