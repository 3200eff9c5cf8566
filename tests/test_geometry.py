"""Geometry featurization vs scipy/numpy oracles.

The reference builds graphs with scipy ``distance_matrix`` + ``coo_matrix``
(``graph_kernel.py:362-393``) and per-edge Python loops
(``dataset.py:194-201``); these tests pin our on-device versions to those
exact semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import coo_matrix
from scipy.spatial import distance_matrix

from molecular_dynamics_neural_operator_tpu.geometry import (
    contact_map,
    contact_map_from_edges,
    dense_edge_features,
    dense_to_padded_edges,
    degree_from_adjacency,
    edge_features_from_edges,
    padded_edges_device,
    pairwise_distances,
)


@pytest.fixture
def pos(rng):
    return (rng.normal(size=(20, 3)) * 4.0).astype(np.float32)


def test_pairwise_distances_matches_scipy(pos):
    ours = np.asarray(pairwise_distances(jnp.asarray(pos)))
    ref = distance_matrix(pos, pos)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_contact_map_matches_reference_semantics(pos):
    # graph_kernel.py:363 — strict < 8 A on the full matrix, self-loops in.
    ours = np.asarray(contact_map(jnp.asarray(pos), 8.0))
    ref = (distance_matrix(pos, pos) < 8.0).astype("int8")
    np.testing.assert_array_equal(ours.astype("int8"), ref)
    assert ours.diagonal().all(), "self-loops must be present"


def test_dense_edge_features_match_loop_oracle(pos):
    # dataset.py:194-201 / graph_kernel.py:372-379: attr(j, i) = [pos_j; pos_i]
    feats = np.asarray(dense_edge_features(jnp.asarray(pos)))
    for j, i in [(0, 0), (3, 7), (19, 2)]:
        expected = np.concatenate([pos[j], pos[i]])
        np.testing.assert_allclose(feats[j, i], expected)


def test_padded_edges_roundtrip_scipy_coo_order(pos):
    cm = (distance_matrix(pos, pos) < 8.0).astype("int8")
    sparse = coo_matrix(cm)
    ref_edges = np.array([sparse.row, sparse.col])
    edges, mask = dense_to_padded_edges(cm, max_edges=512)
    e = int(mask.sum())
    assert e == ref_edges.shape[1]
    np.testing.assert_array_equal(edges[:, :e], ref_edges)


def test_padded_edges_device_matches_host(pos):
    adj = contact_map(jnp.asarray(pos), 8.0)
    h_edges, h_mask = dense_to_padded_edges(np.asarray(adj), 512)
    d_edges, d_mask = padded_edges_device(adj, 512)
    np.testing.assert_array_equal(np.asarray(d_mask), h_mask)
    e = int(h_mask.sum())
    np.testing.assert_array_equal(np.asarray(d_edges)[:, :e], h_edges[:, :e])


def test_edge_features_from_edges_matches_loop(pos):
    adj = contact_map(jnp.asarray(pos), 8.0)
    edges, mask = dense_to_padded_edges(np.asarray(adj), 512)
    feats = np.asarray(edge_features_from_edges(jnp.asarray(pos), jnp.asarray(edges)))
    e = int(mask.sum())
    ref = np.array(
        [np.concatenate([pos[s], pos[d]]) for s, d in zip(edges[0, :e], edges[1, :e])]
    )
    np.testing.assert_allclose(feats[:e], ref)


def test_contact_map_from_edges_densify(pos):
    adj = np.asarray(contact_map(jnp.asarray(pos), 8.0))
    edges, mask = dense_to_padded_edges(adj, 512)
    dense = np.asarray(
        contact_map_from_edges(jnp.asarray(edges), jnp.asarray(mask), 20)
    )
    np.testing.assert_array_equal(dense, adj)


def test_degree_counts_incoming_edges(pos):
    adj = contact_map(jnp.asarray(pos), 8.0)
    deg = np.asarray(degree_from_adjacency(adj))
    np.testing.assert_array_equal(deg, np.asarray(adj).sum(0))
    assert (deg >= 1).all()
