"""Fused Pallas conv-stack kernel vs the XLA path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.geometry import (
    contact_map,
    dense_to_padded_edges,
    edge_features_from_edges,
)
from molecular_dynamics_neural_operator_tpu.models import (
    SparseGraph,
    gkn_apply_single,
    gkn_init,
)


def _graph(cfg, pos0):
    adj = contact_map(pos0, 8.0)
    e, m = dense_to_padded_edges(np.asarray(adj), cfg.max_edges)
    edges, mask = jnp.asarray(e), jnp.asarray(m)
    ef = edge_features_from_edges(pos0, edges)
    return SparseGraph(edges, mask, ef)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=12, max_edges=128, graph_mode="sparse",
                      compute_dtype="float32")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    window = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 3)) * 4
    aa = jnp.arange(12, dtype=jnp.int32) % 20
    return cfg, params, aa, window


def test_pallas_matches_xla_f32(setup):
    cfg, params, aa, window = setup
    cfg_p = dataclasses.replace(cfg, conv_impl="pallas")
    graph = _graph(cfg, window[0])
    out_x = gkn_apply_single(params, cfg, aa, window, graph)
    out_p = gkn_apply_single(params, cfg_p, aa, window, graph)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_pallas_in_rollout_scan(setup):
    from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan

    cfg, params, aa, window = setup
    cfg_p = dataclasses.replace(cfg, conv_impl="pallas",
                                predict_delta=True)
    cfg_x = dataclasses.replace(cfg, predict_delta=True)
    coords_p, *_ = rollout_scan(params, cfg_p, aa, window, 4)
    coords_x, *_ = rollout_scan(params, cfg_x, aa, window, 4)
    np.testing.assert_allclose(np.asarray(coords_p), np.asarray(coords_x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_requires_tied_kernels(setup):
    cfg, params, aa, window = setup
    cfg_bad = dataclasses.replace(cfg, conv_impl="pallas",
                                  tie_edge_kernel=False)
    params_u = gkn_init(jax.random.PRNGKey(0), cfg_bad)
    graph = _graph(cfg, window[0])
    with pytest.raises(ValueError, match="tie_edge_kernel"):
        gkn_apply_single(params_u, cfg_bad, aa, window, graph)


def test_rep_red_matrices():
    from molecular_dynamics_neural_operator_tpu.ops.pallas.fused_gkn import (
        _rep_red_np,
    )

    w = 4
    rep, red = _rep_red_np(w)
    xs = np.random.default_rng(0).normal(size=(3, w)).astype(np.float32)
    k = np.random.default_rng(1).normal(size=(3, w * w)).astype(np.float32)
    m = ((xs @ rep) * k) @ red
    ref = np.einsum("ew,ewv->ev", xs, k.reshape(3, w, w))
    np.testing.assert_allclose(m, ref, rtol=1e-5, atol=1e-6)
