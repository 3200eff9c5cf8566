"""Cell-list neighbor search — O(N) on-device rebuild for large systems.

The contact-map extraction in ``geometry/contact.py`` ranks a dense (R, R)
adjacency: exact and fast for proteins (R <= ~1k) but quadratic in memory
and work beyond. This module provides the ~10k-atom path (BASELINE config
5): a jit-safe spatial-hash cell list with static shapes,

1. hash each atom's cell coordinate (floor(pos / cutoff)) into a
   power-of-two table (classic xor-prime hash; collisions only ADD
   candidates, never drop true neighbors),
2. build the (num_cells, cell_capacity) atom table with one sort + one
   scatter,
3. per atom, gather candidates from the 27 neighboring cells, filter by
   squared distance, and keep the first ``max_degree`` hits via top_k,
4. emit a fixed-shape padded edge list (2, N * max_degree) + mask,
   compatible with the sparse GKN path.

Overflow surfaces as data, not exceptions: the returned diagnostics carry
``cell_overflow`` (a cell exceeded capacity -> candidates were dropped) and
``degree_overflow`` (an atom had more true neighbors than max_degree).
Self-loops are included to match contact-map semantics
(``graph_kernel.py:363``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_P1, _P2, _P3 = 73856093, 19349663, 83492791  # standard spatial-hash primes


class CellListEdges(NamedTuple):
    edges: Array        # (2, N * max_degree) int32 [src; dst]
    mask: Array         # (N * max_degree,) float32
    cell_overflow: Array    # bool scalar
    degree_overflow: Array  # bool scalar


def _hash_cells(cid: Array, num_cells: int) -> Array:
    """cid: (..., 3) int32 cell coordinates -> (...,) table index."""
    h = (cid[..., 0] * _P1) ^ (cid[..., 1] * _P2) ^ (cid[..., 2] * _P3)
    return (h & (num_cells - 1)).astype(jnp.int32)


def _neighbor_offsets() -> Array:
    g = jnp.arange(-1, 2)
    ox, oy, oz = jnp.meshgrid(g, g, g, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)  # (27, 3)


def build_cell_table(pos: Array, cutoff: float, cell_capacity: int,
                     num_cells: int):
    """Phase 1 of the rebuild: the (num_cells * capacity) atom table.

    Split out so the edge-sharded rollout can run this cheap phase
    replicated (one sort + one scatter, ~6 ms of the 40 ms 10k-atom
    rebuild) and shard the per-atom candidate phase over the mesh.
    Returns (cid (N, 3) int32, table (num_cells * capacity,) int32,
    cell_overflow bool)."""
    assert num_cells & (num_cells - 1) == 0, "num_cells must be a power of 2"
    n = pos.shape[0]
    cid = jnp.floor(pos / cutoff).astype(jnp.int32)  # (N, 3)
    h = _hash_cells(cid, num_cells)  # (N,)

    # --- cell table: one sort + rank-in-run + one scatter
    order = jnp.argsort(h)
    h_sorted = h[order]
    first = jnp.searchsorted(h_sorted, h_sorted, side="left")
    rank = jnp.arange(n) - first  # position within the cell's run
    in_cap = rank < cell_capacity
    cell_overflow = jnp.any(~in_cap)
    oob = num_cells * cell_capacity  # out-of-bounds sentinel; mode="drop"
    slots = jnp.where(in_cap, h_sorted * cell_capacity + rank, oob)
    table = jnp.full((num_cells * cell_capacity,), -1, jnp.int32)
    table = table.at[slots].set(order.astype(jnp.int32), mode="drop")
    return cid, table, cell_overflow


def cell_list_edges(
    pos: Array,
    cutoff: float = 8.0,
    max_degree: int = 32,
    cell_capacity: int = 16,
    num_cells: int = 4096,
    atom_slice: tuple[int, int] | None = None,
) -> CellListEdges:
    """Build a padded neighbor-list edge set for N atoms in O(N).

    pos: (N, 3). Returns CellListEdges with E = N * max_degree slots where
    slot n*max_degree + d is the d-th neighbor edge (src=neighbor, dst=n,
    matching the [source; target] convention). num_cells must be a power
    of two.

    ``atom_slice=(lo, n_local)`` restricts the per-atom candidate phase to
    atoms [lo, lo + n_local): the result is exactly rows
    [lo * max_degree, (lo + n_local) * max_degree) of the full edge list
    (dst indices stay global), which is the edge shard a device owns under
    the per-atom slot layout — the edge-sharded rollout's rebuild path.
    ``degree_overflow`` then covers only the local atoms (psum outside).
    """
    n = pos.shape[0]
    cid, table, cell_overflow = build_cell_table(
        pos, cutoff, cell_capacity, num_cells
    )
    lo = 0
    if atom_slice is not None:
        lo, n_local = atom_slice
        cid = jax.lax.dynamic_slice_in_dim(cid, lo, n_local, axis=0)
        n = n_local

    # --- candidates: 27 neighbor cells x cell_capacity per atom.
    # Gathers run at BUCKET-ROW granularity: the atom table and its
    # positions are materialized as (num_cells, C[, 3]) ONCE, and each
    # (atom, offset) pulls one contiguous C-wide row — 27N block gathers
    # instead of 27NC scalar gathers (the rebuild's former hot spot, ~60%
    # of its time at 10k atoms).
    offsets = _neighbor_offsets()  # (27, 3)
    nbr_cells = cid[:, None, :] + offsets[None, :, :]  # (N, 27, 3)
    nbr_hash = _hash_cells(nbr_cells, num_cells)  # (N, 27)
    # Duplicate candidates arise only when two of the 27 offsets hash to
    # the same table bucket (nearby-cell collisions in a small table).
    # Dedup at the bucket level: keep only the first offset per bucket.
    bucket_dup = jnp.any(
        (nbr_hash[:, :, None] == nbr_hash[:, None, :])
        & (jnp.arange(27)[None, :, None] > jnp.arange(27)[None, None, :]),
        axis=-1,
    )  # (N, 27)
    table2 = table.reshape(num_cells, cell_capacity)
    table_pos = pos[jnp.maximum(table2, 0)]  # (num_cells, C, 3) one gather
    cand = table2[nbr_hash].reshape(n, -1)   # (N, 27*C) atom idx or -1
    cand_pos = table_pos[nbr_hash].reshape(n, -1, 3)  # (N, 27*C, 3)
    bucket_ok = jnp.repeat(~bucket_dup, cell_capacity, axis=1)  # (N, 27*C)

    # --- distance filter (empty slots carry pos[0]; masked by cand >= 0)
    own_pos = pos if atom_slice is None else jax.lax.dynamic_slice_in_dim(
        pos, lo, n, axis=0
    )
    d2 = jnp.sum((cand_pos - own_pos[:, None, :]) ** 2, axis=-1)
    valid = (cand >= 0) & bucket_ok & (d2 < cutoff * cutoff)

    degree = jnp.sum(valid, axis=1)
    degree_overflow = jnp.any(degree > max_degree)

    # --- first max_degree hits per row via top_k on a positional score
    c_total = cand.shape[1]
    score = jnp.where(valid, c_total - jnp.arange(c_total)[None, :], 0)
    _, top_idx = jax.lax.top_k(score, max_degree)  # (N, D)
    top_valid = jnp.take_along_axis(valid, top_idx, axis=1)
    top_cand = jnp.take_along_axis(cand, top_idx, axis=1)

    src = jnp.where(top_valid, top_cand, 0).astype(jnp.int32).reshape(-1)
    dst = jnp.where(
        top_valid, lo + jnp.arange(n, dtype=jnp.int32)[:, None], 0
    ).reshape(-1)
    mask = top_valid.astype(jnp.float32).reshape(-1)
    return CellListEdges(
        edges=jnp.stack([src, dst]),
        mask=mask,
        cell_overflow=cell_overflow,
        degree_overflow=degree_overflow,
    )
