"""Cell-list neighbor search vs brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.geometry.cells import (
    cell_list_edges,
)


def _edge_set(edges, mask):
    e = np.asarray(edges)
    m = np.asarray(mask) > 0
    return set(zip(e[0][m].tolist(), e[1][m].tolist()))


def _brute_force_set(pos, cutoff):
    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    src, dst = np.nonzero(d2 < cutoff * cutoff)
    return set(zip(src.tolist(), dst.tolist()))


@pytest.mark.parametrize("seed,n", [(0, 50), (1, 200), (2, 500)])
def test_matches_brute_force(seed, n):
    rng = np.random.default_rng(seed)
    # clustered points so cells are non-trivially occupied
    pos = (rng.normal(size=(n, 3)) * (n ** (1 / 3)) * 2.0).astype(np.float32)
    out = cell_list_edges(jnp.asarray(pos), cutoff=8.0, max_degree=64,
                          cell_capacity=32)
    assert not bool(out.cell_overflow)
    assert not bool(out.degree_overflow)
    assert _edge_set(out.edges, out.mask) == _brute_force_set(pos, 8.0)


def test_includes_self_loops():
    pos = np.array([[0, 0, 0], [100, 0, 0]], np.float32)
    out = cell_list_edges(jnp.asarray(pos), cutoff=8.0, max_degree=4,
                          cell_capacity=4)
    es = _edge_set(out.edges, out.mask)
    assert es == {(0, 0), (1, 1)}


def test_degree_overflow_flagged():
    # 20 coincident points, max_degree 8 -> must flag, not crash
    pos = np.zeros((20, 3), np.float32)
    out = cell_list_edges(jnp.asarray(pos), cutoff=8.0, max_degree=8,
                          cell_capacity=32)
    assert bool(out.degree_overflow)
    # kept edges are still valid (a subset of the true neighbor set)
    es = _edge_set(out.edges, out.mask)
    assert es <= _brute_force_set(pos, 8.0)


def test_cell_overflow_flagged():
    pos = np.zeros((10, 3), np.float32)  # all in one cell, capacity 4
    out = cell_list_edges(jnp.asarray(pos), cutoff=8.0, max_degree=16,
                          cell_capacity=4)
    assert bool(out.cell_overflow)


def test_jit_and_feeds_sparse_forward():
    """Cell-list edges drive the sparse GKN forward end-to-end."""
    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.geometry import (
        edge_features_from_edges,
    )
    from molecular_dynamics_neural_operator_tpu.models import (
        SparseGraph,
        gkn_apply_single,
        gkn_init,
    )

    rng = np.random.default_rng(3)
    n, d = 64, 16
    pos = (rng.normal(size=(n, 3)) * 8).astype(np.float32)
    fn = jax.jit(lambda p: cell_list_edges(p, 8.0, d, 16))
    out = fn(jnp.asarray(pos))
    assert out.edges.shape == (2, n * d)

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=2,
                      num_residues=n, max_edges=n * d, graph_mode="sparse",
                      compute_dtype="float32")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    window = jnp.asarray(np.stack([pos, pos + 0.1]))
    ef = edge_features_from_edges(jnp.asarray(pos), out.edges)
    y = gkn_apply_single(params, cfg, jnp.zeros((n,), jnp.int32), window,
                         SparseGraph(out.edges, out.mask, ef))
    assert y.shape == (n, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_atom_slice_matches_full_rebuild():
    """atom_slice=(lo, n_local) must return exactly rows
    [lo*D, (lo+n_local)*D) of the full edge list (the edge shard a device
    owns in the edge-sharded rollout)."""
    rng = np.random.default_rng(7)
    n, d = 48, 16
    pos = jnp.asarray((rng.normal(size=(n, 3)) * 6).astype(np.float32))
    full = cell_list_edges(pos, 8.0, d, 16)
    for lo, n_local in [(0, 16), (16, 16), (32, 16), (8, 24)]:
        part = cell_list_edges(pos, 8.0, d, 16, atom_slice=(lo, n_local))
        sl = slice(lo * d, (lo + n_local) * d)
        np.testing.assert_array_equal(np.asarray(part.edges),
                                      np.asarray(full.edges[:, sl]))
        np.testing.assert_array_equal(np.asarray(part.mask),
                                      np.asarray(full.mask[sl]))
    # degree overflow is LOCAL to the slice
    pos2 = np.zeros((20, 3), np.float32)
    pos2[10:] += 100.0  # second half far away, degree 10 each half
    out_lo = cell_list_edges(jnp.asarray(pos2), 8.0, 4, 32,
                             atom_slice=(0, 10))
    assert bool(out_lo.degree_overflow)


def test_cell_list_rollout_matches_dense_rank():
    """Rollout with the O(N) cell-list rebuild equals the exact dense-rank
    rebuild (mean aggregation is edge-order invariant)."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan

    traj = synthetic_trajectory(num_frames=16, num_residues=12, seed=4)
    cfg_rank = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                           num_residues=12, max_edges=160,
                           graph_mode="sparse", compute_dtype="float32",
                           predict_delta=True)
    cfg_cell = dataclasses.replace(
        cfg_rank, neighbor_impl="cell_list", max_degree=13,
        max_edges=12 * 13, cell_capacity=16,
    )
    params = gkn_init(jax.random.PRNGKey(0), cfg_rank)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    c_rank, _, d1 = rollout_scan(params, cfg_rank, aa, w0, 5)
    c_cell, _, d2 = rollout_scan(params, cfg_cell, aa, w0, 5)
    assert not bool(d2["edge_overflow"])
    np.testing.assert_allclose(np.asarray(c_cell), np.asarray(c_rank),
                               rtol=1e-4, atol=1e-5)


def test_blocked_scatter_matches_segment_and_onehot():
    """"blocked" aggregation (dense per-node reduction over the cell-list
    block layout) equals segment_sum and the one-hot matmul on a graph
    built by cell_list_edges."""
    from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
        edge_conv_init,
        edge_conv_sparse,
        sparse_inv_degree,
    )

    rng = np.random.default_rng(0)
    n, w, deg = 20, 8, 20
    pos = np.cumsum(rng.normal(size=(n, 3)).astype(np.float32) * 3.0,
                    axis=0)
    out = cell_list_edges(jnp.asarray(pos), cutoff=8.0, max_degree=deg,
                          cell_capacity=16, num_cells=64)
    assert not bool(out.degree_overflow)
    x = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(n * deg, w, w)).astype(np.float32)
    )
    conv = edge_conv_init(jax.random.PRNGKey(1), w)
    results = {}
    for mode in ("onehot", "segment", "blocked"):
        inv_deg = sparse_inv_degree(out.edges, out.mask, n, mode)
        results[mode] = np.asarray(edge_conv_sparse(
            conv, x, kern, out.edges, out.mask, inv_deg, mode, jnp.float32
        ))
    np.testing.assert_allclose(results["blocked"], results["segment"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["blocked"], results["onehot"],
                               rtol=1e-5, atol=1e-6)


def test_blocked_scatter_rejects_non_divisible_capacity():
    from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
        sparse_inv_degree,
    )

    with np.testing.assert_raises(ValueError):
        sparse_inv_degree(jnp.zeros((2, 30), jnp.int32),
                          jnp.zeros((30,)), 7, "blocked")


def test_large_rollout_blocked_hint_matches_segment():
    """Above 512 nodes the rollout scan auto-selects "blocked"
    aggregation for cell-list rebuilds (rollout/scan.py); its output must
    equal a manual step loop that forces the segment_sum path on the
    same graphs."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.models import (
        gkn_apply_single,
        gkn_init,
    )
    from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan
    from molecular_dynamics_neural_operator_tpu.rollout.scan import (
        _build_graph,
    )

    rng = np.random.default_rng(2)
    n, t = 600, 3
    base = np.cumsum(rng.normal(size=(n, 3)).astype(np.float32) * 2.5,
                     axis=0)
    window = jnp.asarray(np.stack([base + 0.02 * i for i in range(t)]))
    aa = jnp.asarray(rng.integers(0, 20, n).astype(np.int32))
    cfg = ModelConfig(width=4, ker_width=8, depth=1, window_size=t,
                      num_residues=n, graph_mode="sparse",
                      compute_dtype="float32", predict_delta=True,
                      neighbor_impl="cell_list", max_degree=48,
                      max_edges=n * 48, cell_capacity=32, num_cells=1024)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    c_auto, _, diags = rollout_scan(params, cfg, aa, window, 2)
    assert not bool(diags["edge_overflow"])

    # manual loop with the segment path forced
    win = window
    outs = []
    for _ in range(2):
        graph, _ = _build_graph(cfg, win[-1], 8.0)
        out = gkn_apply_single(params, cfg, aa, win, graph,
                               scatter_hint="segment")
        outs.append(np.asarray(out))
        win = jnp.concatenate([win[1:], out[None]], axis=0)
    np.testing.assert_allclose(np.asarray(c_auto), np.stack(outs),
                               rtol=1e-5, atol=1e-6)
