"""Native C++ batch packer (csrc/packing.cpp) vs the numpy fallback."""

import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset,
    synthetic_trajectory,
)
from molecular_dynamics_neural_operator_tpu.data import packing


@pytest.fixture(scope="module")
def traj():
    return synthetic_trajectory(num_frames=100, num_residues=14, seed=2)


@pytest.mark.skipif(not packing.available(), reason="native lib unavailable")
def test_native_matches_numpy_dense(traj):
    ds_n = WindowDataset(traj, window_size=5, use_native=True)
    ds_p = WindowDataset(traj, window_size=5, use_native=False)
    assert ds_n.use_native
    idx = np.random.default_rng(0).integers(0, len(ds_n), 16)
    bn, bp = ds_n.get_batch(idx), ds_p.get_batch(idx)
    for k in bp:
        np.testing.assert_array_equal(bn[k], bp[k], err_msg=k)


@pytest.mark.skipif(not packing.available(), reason="native lib unavailable")
def test_native_matches_numpy_sparse(traj):
    kw = dict(window_size=5, graph_mode="sparse", max_edges=256)
    ds_n = WindowDataset(traj, use_native=True, **kw)
    ds_p = WindowDataset(traj, use_native=False, **kw)
    idx = np.random.default_rng(1).integers(0, len(ds_n), 16)
    bn, bp = ds_n.get_batch(idx), ds_p.get_batch(idx)
    for k in bp:
        np.testing.assert_array_equal(bn[k], bp[k], err_msg=k)


@pytest.mark.skipif(not packing.available(), reason="native lib unavailable")
def test_native_padded_overflow_raises(traj):
    # capacity below the real max edge count must raise, not truncate
    max_edges = max(e.shape[1] for e in traj.edge_indices) - 1
    with pytest.raises(ValueError, match="exceeds max_edges"):
        ds = WindowDataset(traj, window_size=5, graph_mode="sparse",
                           max_edges=max_edges, use_native=True)


def test_fallback_when_native_disabled(traj):
    ds = WindowDataset(traj, window_size=5, use_native=False)
    assert not ds.use_native
    batch = ds.get_batch([0, 1])
    assert batch["adj"].shape == (2, 14, 14)
