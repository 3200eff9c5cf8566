"""Auxiliary subsystems: prefetcher, throughput meter, node features,
large-system (segment-mode) shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.data.h5 import compute_node_features
from molecular_dynamics_neural_operator_tpu.data.prefetch import prefetch_to_device
from molecular_dynamics_neural_operator_tpu.utils.profiling import StepTimer


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(10)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_propagates_producer_errors():
    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=2)
    for _ in range(5):
        t.tick(examples=8)
        time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert s["steps_per_sec"] > 0
    assert abs(s["examples_per_sec"] / s["steps_per_sec"] - 8) < 1e-6


def test_node_feature_modes():
    labels = np.array([1, 4, 20])
    onehot = compute_node_features(labels, "amino_acid_onehot")
    assert onehot.shape == (3, 20) and onehot[2, 19] == 1
    const = compute_node_features(labels, "constant", num_nodes=5,
                                  constant_num_node_features=7)
    assert const.shape == (5, 7) and (const == 1).all()
    ident = compute_node_features(labels, "identity")
    np.testing.assert_array_equal(ident, np.eye(3))
    with pytest.raises(ValueError, match="not supported"):
        compute_node_features(labels, "bogus")


def test_large_system_segment_mode_forward():
    """~config-5 shape sanity (scaled down for the CPU suite): >512 nodes
    routes aggregation through segment_sum instead of (E, N) one-hots."""
    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.geometry import (
        contact_map,
        dense_to_padded_edges,
        edge_features_from_edges,
    )
    from molecular_dynamics_neural_operator_tpu.models import (
        GKNBatch,
        SparseGraph,
        gkn_apply,
        gkn_init,
    )

    r, e_max, t = 600, 8192, 2
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=t,
                      num_residues=r, max_edges=e_max, graph_mode="sparse",
                      compute_dtype="float32")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    # loose chain so the contact graph stays sparse at 8 A
    base = np.cumsum(
        np.random.default_rng(0).normal(size=(r, 3)) * 3.0, axis=0
    ).astype(np.float32)
    window = jnp.asarray(np.stack([base, base + 0.1]))[None]  # (1, T, R, 3)
    adj = contact_map(window[0, 0], 8.0)
    edges, mask = dense_to_padded_edges(np.asarray(adj), e_max)
    edges, mask = jnp.asarray(edges)[None], jnp.asarray(mask)[None]
    ef = jax.vmap(edge_features_from_edges)(window[:, 0], edges)
    aa = jnp.zeros((r,), jnp.int32)
    batch = GKNBatch(aa, window, SparseGraph(edges, mask, ef),
                     jnp.zeros((1, r, 3)))
    out = gkn_apply(params, cfg, batch)
    assert out.shape == (1, r, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_presets_importable_and_consistent():
    from molecular_dynamics_neural_operator_tpu.presets import PRESETS

    assert set(PRESETS) == {"bba", "bba_sparse", "trp_cage", "villin",
                            "solvated_10k"}
    for name, cfg in PRESETS.items():
        assert cfg.num_residues > 0 and cfg.max_edges > 0, name
    assert PRESETS["solvated_10k"].graph_mode == "sparse"


def test_fast_folder_preset_rollout():
    """BASELINE config 3 shape check: Trp-cage-sized 100-step free rollout
    through the scan (tiny widths for CPU)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.presets import TRP_CAGE
    from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan

    cfg = dataclasses.replace(TRP_CAGE, width=8, ker_width=16, depth=1,
                              window_size=4, compute_dtype="float32")
    traj = synthetic_trajectory(num_frames=8, num_residues=20, seed=3)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    coords, _, diags = rollout_scan(
        params, cfg, jnp.asarray(traj.aminoacids),
        jnp.asarray(traj.positions[:4]), 100,
    )
    assert coords.shape == (100, 20, 3)
    assert np.isfinite(np.asarray(coords)).all()
