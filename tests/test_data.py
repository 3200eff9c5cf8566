"""Data pipeline: HDF5 schema round-trip, window/horizon indexing parity
with ``dataset.py:177-227``, vectorized batching vs per-item oracle."""

import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset,
    aminoacid_int_to_onehot,
    batch_iterator,
    load_trajectory,
    synthetic_trajectory,
    write_synthetic_h5,
)
from molecular_dynamics_neural_operator_tpu.train import train_valid_split


def test_onehot_matches_reference_loop():
    labels = np.array([1, 5, 20, 3])
    ours = aminoacid_int_to_onehot(labels)
    ref = np.zeros((4, 20))
    for i, l in enumerate(labels):
        ref[i][l - 1] = 1
    np.testing.assert_array_equal(ours, ref)


def test_h5_roundtrip(tmp_path):
    path = tmp_path / "traj.h5"
    traj = write_synthetic_h5(path, num_frames=32, num_residues=10, seed=1)
    loaded = load_trajectory(path)
    np.testing.assert_allclose(loaded.positions, traj.positions, rtol=1e-6)
    np.testing.assert_array_equal(loaded.aminoacids, traj.aminoacids)
    np.testing.assert_allclose(loaded.rmsd, traj.rmsd, rtol=1e-6)
    # load_trajectory returns the packed CSR form (bounded-memory load);
    # per-frame views must equal the list-form generator's edge lists.
    assert loaded.edge_indices is None
    assert len(loaded.edge_offsets) == 32 + 1
    for i, b in enumerate(traj.edge_indices):
        np.testing.assert_array_equal(loaded.edge_index(i), b)


def test_h5_max_frames_not_chunk_multiple(tmp_path):
    """max_frames below the file size (and not a read-chunk multiple) must
    truncate cleanly — the chunked edge reader once read past ``n`` and
    crashed assigning into the (n,) counts array."""
    from molecular_dynamics_neural_operator_tpu.data import h5 as h5mod

    path = tmp_path / "traj.h5"
    traj = write_synthetic_h5(path, num_frames=32, num_residues=10, seed=4)
    old_chunk = h5mod._EDGE_CHUNK
    h5mod._EDGE_CHUNK = 12  # force a partial final chunk at n=30
    try:
        loaded = load_trajectory(path, max_frames=30)
    finally:
        h5mod._EDGE_CHUNK = old_chunk
    assert loaded.num_frames == 30
    assert len(loaded.edge_offsets) == 30 + 1
    np.testing.assert_allclose(loaded.positions, traj.positions[:30], rtol=1e-6)
    for i in range(30):
        np.testing.assert_array_equal(
            loaded.edge_index(i), traj.edge_indices[i]
        )


def test_h5_directory_mode(tmp_path):
    t1 = write_synthetic_h5(tmp_path / "a.h5", num_frames=16, num_residues=10, seed=1)
    t2 = write_synthetic_h5(tmp_path / "b.h5", num_frames=8, num_residues=10, seed=2)
    loaded = load_trajectory(tmp_path)
    assert loaded.num_frames == 24
    np.testing.assert_allclose(loaded.positions[:16], t1.positions, rtol=1e-6)
    np.testing.assert_allclose(loaded.positions[16:], t2.positions, rtol=1e-6)
    # node features come from the first file, read while it is open
    # (fixes the reference's closed-handle bug, dataset.py:149)
    np.testing.assert_array_equal(loaded.aminoacids, t1.aminoacids)


def test_window_indexing_reference_semantics(tiny_traj):
    ds = WindowDataset(tiny_traj, window_size=5, horizon=2)
    # len = N - window - horizon + 1 (dataset.py:177-178)
    assert len(ds) == tiny_traj.num_frames - 5 - 2 + 1
    batch = ds.get_batch([3])
    np.testing.assert_allclose(
        batch["window"][0], tiny_traj.positions[3:8], rtol=1e-6
    )
    # y = positions[idx + window + horizon - 1] (dataset.py:182)
    np.testing.assert_allclose(batch["y"][0], tiny_traj.positions[3 + 5 + 2 - 1])


def test_dense_adj_matches_stored_coo(tiny_traj):
    ds = WindowDataset(tiny_traj, window_size=4)
    idx = [0, 7, 20]
    adj = ds.get_batch(idx)["adj"]
    for b, i in enumerate(idx):
        e = tiny_traj.edge_indices[i]
        ref = np.zeros((tiny_traj.num_residues,) * 2, np.float32)
        ref[e[0], e[1]] = 1.0
        np.testing.assert_array_equal(adj[b], ref)


def test_recomputed_adj_matches_stored(tiny_traj):
    ds_stored = WindowDataset(tiny_traj, window_size=4, use_stored_contact_maps=True)
    ds_recomp = WindowDataset(tiny_traj, window_size=4, use_stored_contact_maps=False)
    idx = [0, 5, 11]
    np.testing.assert_array_equal(
        ds_stored.get_batch(idx)["adj"], ds_recomp.get_batch(idx)["adj"]
    )


def test_sparse_batch_matches_dense(tiny_traj):
    dsd = WindowDataset(tiny_traj, window_size=4, graph_mode="dense")
    dss = WindowDataset(tiny_traj, window_size=4, graph_mode="sparse", max_edges=256)
    idx = [2, 9]
    dense = dsd.get_batch(idx)["adj"]
    sp = dss.get_batch(idx)
    for b in range(2):
        ref = np.zeros_like(dense[b])
        n = int(sp["mask"][b].sum())
        ref[sp["edges"][b, 0, :n], sp["edges"][b, 1, :n]] = 1.0
        np.testing.assert_array_equal(ref, dense[b])


def test_batch_iterator_determinism(tiny_traj):
    ds = WindowDataset(tiny_traj, window_size=4)
    idx = np.arange(len(ds))
    b1 = [b["y"] for b in batch_iterator(ds, idx, 8, seed=1, epoch=0)]
    b2 = [b["y"] for b in batch_iterator(ds, idx, 8, seed=1, epoch=0)]
    b3 = [b["y"] for b in batch_iterator(ds, idx, 8, seed=1, epoch=1)]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    assert any(not np.array_equal(a, b) for a, b in zip(b1, b3))


def test_train_valid_split_methods():
    tr, va = train_valid_split(100, 0.8, "partition")
    assert list(tr) == list(range(80)) and list(va) == list(range(80, 100))
    tr_r, va_r = train_valid_split(100, 0.8, "random", seed=0)
    assert len(tr_r) == 80 and len(va_r) == 20
    assert sorted(np.concatenate([tr_r, va_r]).tolist()) == list(range(100))
    with pytest.raises(ValueError):
        train_valid_split(10, 0.8, "bogus")


def test_eval_remainder_padding_single_shape():
    """pad_last gives every eval batch one static shape (no remainder
    recompile) and weighted metrics equal to the unpadded computation."""
    import jax
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.configs import (
        ModelConfig,
        TrainConfig,
    )
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        batch_iterator,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.train import (
        create_train_state,
        make_eval_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import eval_epoch

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                      num_residues=10, compute_dtype="float32")
    traj = synthetic_trajectory(num_frames=20, num_residues=10, seed=5)
    ds = WindowDataset(traj, window_size=3)
    state, _, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                     TrainConfig())
    idx = np.arange(10)  # batch 4 -> batches of 4, 4, and remainder 2

    shapes = set()
    for b in batch_iterator(ds, idx, 4, shuffle=False, drop_last=False,
                            pad_last=True):
        shapes.add(b["window"].shape)
        assert b["w"].shape == (4,)
    assert len(shapes) == 1  # one static shape -> one compile

    step = make_eval_step(cfg)
    m_pad = eval_epoch(state.params, step, ds, idx, 4, drop_last=False)

    # oracle: unpadded batches, remainder computed at its true size.
    # rel_l2 keeps the reference's sum-over-examples / num-batches
    # convention; mse is the per-example mean (a mean over batches would
    # overweight the remainder batch's few examples).
    rel_sum, sq_sum, nb, n_ex = 0.0, 0.0, 0, 0
    for b in batch_iterator(ds, idx, 4, shuffle=False, drop_last=False):
        m = step(state.params, {k: jnp.asarray(v) for k, v in b.items()})
        bsz = b["window"].shape[0]
        rel_sum += float(m["rel_l2"])
        sq_sum += float(m["mse"]) * bsz
        nb += 1
        n_ex += bsz
    np.testing.assert_allclose(m_pad["rel_l2"], rel_sum / nb, rtol=1e-5)
    np.testing.assert_allclose(m_pad["mse"], sq_sum / n_ex, rtol=1e-5)


def test_streamed_writer_bit_identical(tmp_path):
    """write_synthetic_h5_streamed (chunked generation + batched vlen
    writes, O(chunk) memory — the reference-scale path) produces a byte-
    equivalent dataset to the in-memory writer for the same seed."""
    import h5py

    from molecular_dynamics_neural_operator_tpu.data import (
        write_synthetic_h5_streamed,
    )

    a = tmp_path / "small.h5"
    b = tmp_path / "streamed.h5"
    traj = write_synthetic_h5(a, num_frames=50, num_residues=12, seed=7)
    info = write_synthetic_h5_streamed(
        b, num_frames=50, num_residues=12, seed=7, chunk_frames=16
    )
    assert info["num_frames"] == 50
    assert info["max_edges_per_frame"] == max(
        e.shape[1] for e in traj.edge_indices
    )
    with h5py.File(a) as fa, h5py.File(b) as fb:
        np.testing.assert_array_equal(fa["point_cloud"][...],
                                      fb["point_cloud"][...])
        np.testing.assert_array_equal(fa["amino_acids"][...],
                                      fb["amino_acids"][...])
        np.testing.assert_array_equal(fa["rmsd"][...], fb["rmsd"][...])
        for x, y in zip(fa["contact_map"][...], fb["contact_map"][...]):
            np.testing.assert_array_equal(x, y)

    la = load_trajectory(a)
    lb = load_trajectory(b)
    np.testing.assert_array_equal(la.edges_flat, lb.edges_flat)
    np.testing.assert_array_equal(la.edge_offsets, lb.edge_offsets)
    np.testing.assert_array_equal(la.positions, lb.positions)


def test_synthetic_dt_scale_invariant_dynamics(tmp_path):
    """With an explicit ``dt`` the per-frame motion is independent of the
    total frame count (the legacy linspace span makes a 1.1M-frame file
    numerically static frame-to-frame — trivially gamed by a copy-last-
    frame baseline), and the streamed writer honors the same ``dt``."""
    import h5py

    from molecular_dynamics_neural_operator_tpu.data import (
        write_synthetic_h5_streamed,
    )
    from molecular_dynamics_neural_operator_tpu.data.synthetic import (
        synthetic_trajectory,
    )

    dt = 2 * np.pi / 4000
    short = synthetic_trajectory(60, num_residues=12, seed=3, dt=dt)
    long = synthetic_trajectory(600, num_residues=12, seed=3, dt=dt)

    def per_frame_mse(pos):
        return float(np.mean((pos[1:] - pos[:-1]) ** 2))

    m_long = per_frame_mse(long.positions)
    assert m_long > 0
    # under a fixed dt the short trajectory IS the prefix of the long one:
    # frame count only extends the time grid, it never rescales motion
    np.testing.assert_array_equal(short.positions, long.positions[:60])

    # the legacy span (one period over the whole file) slows per-frame
    # motion ~1/N^2 as files grow — the very property that made the
    # 1.1M-frame gate trivial; dt mode has no such N-dependence
    leg60 = synthetic_trajectory(60, num_residues=12, seed=3)
    leg600 = synthetic_trajectory(600, num_residues=12, seed=3)
    assert per_frame_mse(leg600.positions) < per_frame_mse(
        leg60.positions) / 10

    a, b = tmp_path / "mem.h5", tmp_path / "stream.h5"
    write_synthetic_h5(a, num_frames=50, num_residues=12, seed=3, dt=dt)
    write_synthetic_h5_streamed(b, num_frames=50, num_residues=12, seed=3,
                                chunk_frames=16, dt=dt)
    with h5py.File(a) as fa, h5py.File(b) as fb:
        np.testing.assert_array_equal(fa["point_cloud"][...],
                                      fb["point_cloud"][...])


def test_packed_and_list_trajectories_equivalent_in_dataset(tmp_path):
    """WindowDataset batches are identical whether the trajectory arrives
    packed (load_trajectory) or as a ragged list (synthetic_trajectory)."""
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )

    path = tmp_path / "t.h5"
    write_synthetic_h5(path, num_frames=40, num_residues=11, seed=3)
    packed = load_trajectory(path)
    listed = synthetic_trajectory(num_frames=40, num_residues=11, seed=3)
    da = WindowDataset(packed, window_size=5, graph_mode="sparse",
                       max_edges=160)
    db = WindowDataset(listed, window_size=5, graph_mode="sparse",
                       max_edges=160)
    ba = da.get_batch([0, 3, 17])
    bb = db.get_batch([0, 3, 17])
    for k in ba:
        np.testing.assert_array_equal(ba[k], bb[k])


def test_blocked_edge_layout_roundtrip(tiny_traj):
    """Blocked layout (slot n*max_degree+d -> node n): same edge SET as
    CSR packing, slots grouped by target node."""
    r = tiny_traj.num_residues
    e_max = 32 * r
    csr = WindowDataset(tiny_traj, window_size=4, graph_mode="sparse",
                        max_edges=e_max)
    blk = WindowDataset(tiny_traj, window_size=4, graph_mode="sparse",
                        max_edges=e_max, edge_layout="blocked")
    idx = [0, 5, 13]
    a = csr.get_batch(idx)
    b = blk.get_batch(idx)
    assert b["edges"].shape == a["edges"].shape
    max_deg = e_max // r
    for i in range(len(idx)):
        na = int(a["mask"][i].sum())
        nb = int(b["mask"][i].sum())
        assert na == nb
        ea = {tuple(e) for e in a["edges"][i, :, :na].T}
        on = b["mask"][i] > 0
        eb = {tuple(e) for e in b["edges"][i][:, on].T}
        assert ea == eb
        # every real slot targets its block's node
        slots = np.flatnonzero(on)
        np.testing.assert_array_equal(b["edges"][i, 1, slots],
                                      slots // max_deg)


def test_blocked_layout_degree_overflow_raises(tiny_traj):
    r = tiny_traj.num_residues
    # capacity 7*r=84 passes the total-edge check (max stored 78) but
    # max_degree 7 < the trajectory's real max in-degree 8 -> detected at
    # CONSTRUCTION (one chunked bincount pass), not hours into an epoch
    # from inside the prefetch producer.
    with pytest.raises(ValueError, match="in-degree"):
        WindowDataset(tiny_traj, window_size=4, graph_mode="sparse",
                      max_edges=7 * r, edge_layout="blocked")


def test_blocked_layout_recomputed_maps(tiny_traj):
    """use_stored_contact_maps=False + blocked layout: the recompute path
    must ALSO emit the block layout (it used to fall back to CSR packing
    while the model reduced by slot position — silently wrong sums)."""
    r = tiny_traj.num_residues
    e_max = 32 * r
    max_deg = 32
    blk = WindowDataset(tiny_traj, window_size=4, graph_mode="sparse",
                        max_edges=e_max, edge_layout="blocked",
                        use_stored_contact_maps=False)
    csr = WindowDataset(tiny_traj, window_size=4, graph_mode="sparse",
                        max_edges=e_max, use_stored_contact_maps=False)
    idx = [0, 7]
    b = blk.get_batch(idx)
    a = csr.get_batch(idx)
    for i in range(len(idx)):
        on = b["mask"][i] > 0
        slots = np.flatnonzero(on)
        # blocked invariant: every live slot targets its block's node
        np.testing.assert_array_equal(b["edges"][i, 1, slots],
                                      slots // max_deg)
        # same edge SET as the CSR recompute
        na = int(a["mask"][i].sum())
        ea = {tuple(e) for e in a["edges"][i, :, :na].T}
        eb = {tuple(e) for e in b["edges"][i][:, on].T}
        assert ea == eb
    # batch-time in-degree guard still covers the recompute path (no
    # init-time validation possible: degrees depend on the threshold)
    tight = WindowDataset(tiny_traj, window_size=4, graph_mode="sparse",
                          max_edges=7 * r, edge_layout="blocked",
                          use_stored_contact_maps=False)
    with pytest.raises(ValueError, match="in-degree"):
        tight.get_batch([0])


def test_langevin_trajectory_regime():
    """The anharmonic Langevin family is the benchmark where learning is
    REQUIRED (VERDICT r4 item 1): both trivial forecasters must degrade
    visibly within the gate horizons, in opposite ways — copy-last pays
    the per-step drift immediately, constant-velocity extrapolation
    diverges at long horizon — while the per-frame force correction
    (second difference) stays far above the thermal noise floor, so a
    model that learns the force field has real headroom below both."""
    from molecular_dynamics_neural_operator_tpu.data import (
        langevin_trajectory,
    )

    traj = langevin_trajectory(num_frames=1500, seed=11)
    p = traj.positions.astype(np.float64)
    assert p.shape == (1500, 28, 3)
    assert np.isfinite(p).all()
    # realistic contact density (BBA measures ~180-210 edges at 8 A)
    counts = [e.shape[1] for e in traj.edge_indices[:100]]
    assert 120 <= np.mean(counts) <= 300

    s = 1000
    horizon = 200
    last, prev = p[s], p[s - 1]
    truth = p[s + 1 : s + 1 + horizon]
    cl = ((truth - last) ** 2).mean(axis=(1, 2))
    k = np.arange(1, horizon + 1)[:, None, None]
    ex = ((truth - (last + k * (last - prev))) ** 2).mean(axis=(1, 2))
    # extrapolation beats copy-last at step 1 (velocity is real) ...
    assert ex[0] < cl[0]
    # ... both degrade hard by step 10 (>= 20x their step-1 error) ...
    assert cl[9] > 20 * cl[0] and ex[9] > 20 * ex[0]
    # ... and extrapolation DIVERGES past copy-last by step 100
    assert ex[99] > 2 * cl[99]
    # headroom: the predictable per-frame force correction dominates the
    # stochastic kick by >= 5x rms (kick std = 0.5*dt*sqrt(kT(1-c1^2)))
    acc = p[2:] - 2 * p[1:-1] + p[:-2]
    dt, fr, kT = 0.05, 0.02, 0.5
    c1 = np.exp(-fr * dt)
    kick = 0.5 * dt * np.sqrt(kT * (1 - c1 * c1))
    assert np.sqrt((acc ** 2).mean()) > 5 * kick


def test_langevin_trajectory_deterministic_and_distinct_seeds():
    from molecular_dynamics_neural_operator_tpu.data import (
        langevin_trajectory,
    )

    a = langevin_trajectory(num_frames=32, seed=3, burn_in=50)
    b = langevin_trajectory(num_frames=32, seed=3, burn_in=50)
    np.testing.assert_array_equal(a.positions, b.positions)
    c = langevin_trajectory(num_frames=32, seed=4, burn_in=50)
    assert not np.allclose(a.positions, c.positions)


def test_write_langevin_h5_roundtrip(tmp_path):
    from molecular_dynamics_neural_operator_tpu.data import (
        load_trajectory,
        write_langevin_h5,
    )

    path = tmp_path / "lg.h5"
    traj = write_langevin_h5(path, num_frames=24, seed=5, burn_in=50)
    loaded = load_trajectory(path)
    np.testing.assert_array_equal(loaded.positions, traj.positions)
    np.testing.assert_array_equal(loaded.aminoacids, traj.aminoacids)
    np.testing.assert_array_equal(loaded.edge_index(7), traj.edge_index(7))
