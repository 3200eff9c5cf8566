"""On-device graph featurization for contact-map molecular graphs.

TPU-native replacement for the reference's host-side graph construction:

- scipy ``distance_matrix`` + ``coo_matrix`` thresholding
  (``/root/reference/graph_kernel.py:362-368``),
- the O(E) per-edge Python loops building ``[pos_i ; pos_j]`` edge features
  (``/root/reference/graph_kernel.py:372-379``, ``dataset.py:194-201``).

Everything here is pure ``jax.numpy`` on static shapes, so it jit-compiles
into the rollout ``lax.scan`` with zero host round-trips. Two graph forms:

- **dense**: an (R, R) adjacency mask + (R, R, 6) edge-feature tensor. For
  small proteins (BBA: R=28) this is the fastest TPU form — aggregation is a
  masked matmul on the MXU, no gather/scatter at all.
- **sparse**: fixed-capacity padded edge lists (2, E_max) + validity mask,
  for systems whose R^2 would not fit (~10k atoms).

Edge-direction convention (matches PyG ``MessagePassing`` with the default
``flow="source_to_target"`` used by the reference's ``NNConv_old``,
``graph_kernel.py:125-214``): for an edge pair ``(row=j, col=i)`` stored in
the contact map, node ``i`` aggregates message ``x_j @ h(edge_attr)`` where
``edge_attr = [pos_j ; pos_i]`` — i.e. ``edge_index[0]`` is the source and
``edge_index[1]`` the target. Contact maps are symmetric (and include
self-loops: the zero diagonal passes the ``< 8 A`` test), so the edge *set*
is identical either way, but the edge-feature ordering matters and is
preserved exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_sq_distances(pos: Array) -> Array:
    """Squared pairwise distances. pos: (..., R, 3) -> (..., R, R)."""
    diff = pos[..., :, None, :] - pos[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def pairwise_distances(pos: Array) -> Array:
    """Pairwise Euclidean distances, safe gradient at zero distance."""
    sq = pairwise_sq_distances(pos)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def contact_map(pos: Array, threshold: float = 8.0) -> Array:
    """Binary contact map: d(i, j) < threshold. pos (..., R, 3) -> (..., R, R).

    Self-loops are included (diagonal distance 0 < threshold), matching the
    reference (``graph_kernel.py:363``: strict ``<`` on the full matrix).
    Compares squared distances to avoid the sqrt.
    """
    return (pairwise_sq_distances(pos) < threshold * threshold).astype(jnp.float32)


def degree_from_adjacency(adj: Array) -> Array:
    """In-degree of each target node i = number of sources j with adj[j -> i].

    adj is symmetric in practice; we still reduce over the source axis
    (axis=-2 under the [source, target] layout) for correctness. Clamped to a
    minimum of 1 so masked mean-aggregation never divides by zero.
    """
    deg = jnp.sum(adj, axis=-2)
    return jnp.maximum(deg, 1.0)


def dense_edge_features(pos: Array) -> Array:
    """All-pairs edge features E[j, i] = [pos_j ; pos_i], shape (..., R, R, 6).

    Index convention: first graph axis is the *source* j, second the *target*
    i, so that aggregation for target i reduces over axis -3. This reproduces
    the reference's ``[Ax, Ay, Az, Bx, By, Bz]`` attribute for edge (A=j, B=i)
    (``graph_kernel.py:372-379``) without the Python loop.
    """
    r = pos.shape[-2]
    src = jnp.broadcast_to(pos[..., :, None, :], pos.shape[:-2] + (r, r, 3))
    dst = jnp.broadcast_to(pos[..., None, :, :], pos.shape[:-2] + (r, r, 3))
    return jnp.concatenate([src, dst], axis=-1)


def contact_map_from_edges(edges: Array, mask: Array, num_nodes: int) -> Array:
    """Densify a padded edge list into an (R, R) 0/1 adjacency.

    Equivalent of the reference's ``get_contact_map``
    (``graph_kernel.py:416-421``) but jit-safe: padded slots (mask == 0)
    contribute nothing.

    edges: (2, E) int32 [source; target]; mask: (E,) float/bool.
    """
    src, dst = edges[0], edges[1]
    vals = mask.astype(jnp.float32)
    adj = jnp.zeros((num_nodes, num_nodes), jnp.float32)
    adj = adj.at[src, dst].add(vals)
    return jnp.minimum(adj, 1.0)


def dense_to_padded_edges(adj, max_edges: int):
    """Host-side (numpy) conversion: dense adjacency -> padded edge list.

    Returns (edges (2, max_edges) int32, mask (max_edges,) float32). Edge
    order is row-major over (source, target), the same order scipy's
    ``coo_matrix`` emits for the reference (``graph_kernel.py:364-368``).
    Raises if the real edge count exceeds ``max_edges``.
    """
    import numpy as np

    adj = np.asarray(adj)
    src, dst = np.nonzero(adj)
    e = src.shape[0]
    if e > max_edges:
        raise ValueError(f"edge count {e} exceeds max_edges {max_edges}")
    edges = np.zeros((2, max_edges), np.int32)
    mask = np.zeros((max_edges,), np.float32)
    edges[0, :e] = src
    edges[1, :e] = dst
    mask[:e] = 1.0
    return edges, mask


def padded_edges_device(adj: Array, max_edges: int,
                        return_count: bool = False):
    """Jit-safe padded edge extraction from a dense adjacency.

    TPU-friendly stream compaction with no sort and no scatter: rank each
    set bit with a cumulative sum, build the (max_edges, R*R) slot-vs-pair
    assignment one-hot by comparing ranks, and turn it into indices with a
    single matmul. ~4x faster on TPU than ``jnp.nonzero(size=...)`` (which
    lowers to a sort) and identical output: row-major edge order, padded
    slots at src=dst=0 with mask 0.

    NOTE: under jit, edges beyond ``max_edges`` are silently dropped (static
    shapes cannot raise); pass ``return_count=True`` to get the true edge
    count so callers can surface overflow (rollout_scan's diagnostics do).
    """
    r = adj.shape[-1]
    flat = (adj.reshape(-1) > 0).astype(jnp.float32)  # (R*R,)
    rank = jnp.cumsum(flat)  # 1-indexed rank of each set bit
    count = rank[-1]
    slots = jnp.arange(1, max_edges + 1, dtype=jnp.float32)  # (E,)
    # assign[e, p] = 1 iff pair p is the e-th set bit
    assign = (rank[None, :] == slots[:, None]) & (flat[None, :] > 0)
    # Recover (src, dst) with two matvecs whose values stay <= R - 1, so the
    # accumulation is exact for any R <= 2^24 — a single matvec against
    # arange(R*R) would lose integer precision past R ~ 4096. Precision is
    # pinned to HIGHEST explicitly: the default f32 matmul precision is
    # backend-dependent (Pallas/Mosaic's in-kernel default, for one,
    # rounds operands to bf16, which would corrupt index values past 256),
    # and index recovery must never depend on that default. Verified exact
    # on the chip at R=300.
    pair = jnp.arange(r * r, dtype=jnp.int32)
    rows = (pair // r).astype(jnp.float32)
    cols = (pair % r).astype(jnp.float32)
    af = assign.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    src_f = jnp.dot(af, rows, preferred_element_type=jnp.float32,
                    precision=hi)
    dst_f = jnp.dot(af, cols, preferred_element_type=jnp.float32,
                    precision=hi)
    mask = (slots <= count).astype(jnp.float32)
    src = src_f.astype(jnp.int32) * mask.astype(jnp.int32)
    dst = dst_f.astype(jnp.int32) * mask.astype(jnp.int32)
    if return_count:
        return jnp.stack([src, dst]), mask, count
    return jnp.stack([src, dst]), mask


def edge_features_from_edges(pos: Array, edges: Array) -> Array:
    """Per-edge features [pos_src ; pos_dst] by gather. pos (R,3), edges (2,E).

    Vectorized replacement for the dataset's per-edge loop
    (``dataset.py:194-201``).
    """
    return jnp.concatenate([pos[edges[0]], pos[edges[1]]], axis=-1)
