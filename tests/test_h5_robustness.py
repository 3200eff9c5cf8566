"""Real-file schema robustness battery (VERDICT r3 item 6).

The loader has only ever read files its own writer produced; real lab
files drift from the reference schema (``/root/reference/dataset.py:110-164``)
in known ways. Each test pins one drift case's accept / repair / reject
behavior (compat matrix: ``docs/DATA_COMPAT.md``)."""

import numpy as np
import pytest

import h5py

from molecular_dynamics_neural_operator_tpu.data import (
    SchemaWarning,
    WindowDataset,
    contact_maps_have_self_loops,
    detect_pointcloud_layout,
    load_trajectory,
    normalize_amino_labels,
    write_synthetic_h5,
)


def _write(path, num_frames=24, num_residues=10, seed=3, **mutate):
    """Write a reference-schema file, then overwrite selected datasets."""
    traj = write_synthetic_h5(path, num_frames=num_frames,
                              num_residues=num_residues, seed=seed)
    if mutate:
        with h5py.File(path, "a") as f:
            for name, value in mutate.items():
                if name in f:
                    del f[name]
                if value is None:
                    continue
                if name == "contact_map":
                    vlen = h5py.vlen_dtype(np.int32)
                    cm = f.create_dataset(name, (len(value),), dtype=vlen)
                    cm[:] = value
                else:
                    f.create_dataset(name, data=value)
    return traj


# --- point-cloud layout ----------------------------------------------------

def test_nr3_layout_detected_and_not_double_transposed(tmp_path):
    """A file saved (N, R, 3) — already row-major — must not be fed
    through the reference's unconditional transpose (dataset.py:159),
    which would produce a bogus 3-residue system."""
    path = tmp_path / "t.h5"
    traj = _write(path)
    with h5py.File(path, "a") as f:
        pc = np.transpose(np.asarray(f["point_cloud"]), (0, 2, 1))  # (N,R,3)
        del f["point_cloud"]
        f.create_dataset("point_cloud", data=pc)
    with pytest.warns(SchemaWarning, match="row-major"):
        loaded = load_trajectory(path)
    assert loaded.num_residues == traj.num_residues
    np.testing.assert_array_equal(loaded.positions, traj.positions)


def test_detect_layout_rules():
    assert detect_pointcloud_layout((5, 3, 28)) == "n3r"
    with pytest.warns(SchemaWarning):
        assert detect_pointcloud_layout((5, 28, 3)) == "nr3"
    # genuinely ambiguous 3-residue system: reference layout assumed,
    # loudly (shape and residue-count hint are both 3 — undecidable)
    with pytest.warns(SchemaWarning, match="ambiguous"):
        assert detect_pointcloud_layout((5, 3, 3)) == "n3r"
    # no coordinate axis, but a residue-count hint disambiguates
    assert detect_pointcloud_layout((5, 28, 7), num_residues_hint=28) == "nr3"
    assert detect_pointcloud_layout((5, 7, 28), num_residues_hint=28) == "n3r"
    with pytest.raises(ValueError, match="no axis of size 3"):
        detect_pointcloud_layout((5, 28, 7))
    with pytest.raises(ValueError, match="3-D"):
        detect_pointcloud_layout((5, 28))


# --- amino-acid labels -----------------------------------------------------

def test_one_based_labels_shifted(tmp_path):
    """1-based labels in [1, 20] (the convention the reference's own
    one-hot helper assumes, dataset.py:12-18) would index out of the
    Embedding(20) table when fed raw (dataset.py:162-164); ingest shifts
    them to 0-based with a warning."""
    path = tmp_path / "t.h5"
    labels_1b = np.arange(10, dtype=np.int64) * 2 + 2  # [2..20] hits max 20
    _write(path, amino_acids=labels_1b)
    with pytest.warns(SchemaWarning, match="1-based"):
        loaded = load_trajectory(path)
    np.testing.assert_array_equal(loaded.aminoacids, labels_1b - 1)
    assert loaded.aminoacids.max() < 20


def test_zero_based_labels_untouched(tmp_path):
    path = tmp_path / "t.h5"
    labels = np.arange(10, dtype=np.int64)  # [0..9]: unambiguously 0-based
    _write(path, amino_acids=labels)
    loaded = load_trajectory(path)
    np.testing.assert_array_equal(loaded.aminoacids, labels)




def test_onehot_label_matrix_recovered(tmp_path):
    path = tmp_path / "t.h5"
    labels = np.array([0, 5, 19, 3, 3, 7, 1, 2, 4, 6])
    onehot = np.zeros((10, 20), np.float64)
    onehot[np.arange(10), labels] = 1.0
    _write(path, amino_acids=onehot)
    with pytest.warns(SchemaWarning, match="one-hot"):
        loaded = load_trajectory(path)
    np.testing.assert_array_equal(loaded.aminoacids, labels)


def test_float_labels_accepted_nonintegral_rejected(tmp_path):
    path = tmp_path / "t.h5"
    _write(path, amino_acids=np.arange(10, dtype=np.float64))
    loaded = load_trajectory(path)
    assert loaded.aminoacids.dtype == np.int32
    with pytest.raises(ValueError, match="non-integral"):
        normalize_amino_labels(np.array([0.5, 1.0]))


def test_out_of_range_labels_rejected():
    with pytest.raises(ValueError, match="outside both"):
        normalize_amino_labels(np.array([0, 25]))
    with pytest.raises(ValueError, match="outside both"):
        normalize_amino_labels(np.array([-1, 5]))


def test_ambiguous_one_based_subset_is_accepted_as_zero_based():
    """Labels spanning [1, 19] are valid under BOTH conventions; the
    loader keeps them untouched (documented in docs/DATA_COMPAT.md) —
    only an unambiguous max==20 triggers the shift — but WARNS: a
    1-based file lacking residue type 20 would otherwise be silently
    off by one in every embedding lookup."""
    labels = np.array([1, 5, 19])
    with pytest.warns(SchemaWarning, match="both"):
        out = normalize_amino_labels(labels)
    np.testing.assert_array_equal(out, labels)


# --- optional / dtype drift ------------------------------------------------

def test_missing_rmsd_accepted(tmp_path):
    path = tmp_path / "t.h5"
    _write(path, rmsd=None)
    loaded = load_trajectory(path)
    assert loaded.rmsd is None


def test_float64_point_cloud_cast(tmp_path):
    path = tmp_path / "t.h5"
    traj = _write(path)
    with h5py.File(path, "a") as f:
        pc = np.asarray(f["point_cloud"]).astype(np.float64)
        del f["point_cloud"]
        f.create_dataset("point_cloud", data=pc)
        r = np.asarray(f["rmsd"]).astype(np.float64)
        del f["rmsd"]
        f.create_dataset("rmsd", data=r)
    loaded = load_trajectory(path)
    assert loaded.positions.dtype == np.float32
    assert loaded.rmsd.dtype == np.float32
    np.testing.assert_allclose(loaded.positions, traj.positions, rtol=1e-6)


# --- corrupt data: reject with a message -----------------------------------

def test_odd_length_contact_row_rejected(tmp_path):
    path = tmp_path / "t.h5"
    traj = _write(path)
    rows = [e.reshape(-1) for e in traj.edge_indices]
    rows[7] = rows[7][:-1]  # odd length: cannot split into [rows; cols]
    _write(path, contact_map=rows)
    with pytest.raises(ValueError, match="frame 7"):
        load_trajectory(path)


def test_out_of_range_edge_indices_rejected(tmp_path):
    """Edge indices >= R would clip-gather garbage silently on device;
    ingest rejects them (also catches a mis-detected layout)."""
    path = tmp_path / "t.h5"
    traj = _write(path)
    rows = [e.reshape(-1) for e in traj.edge_indices]
    bad = rows[3].copy()
    bad[0] = 99
    rows[3] = bad
    _write(path, contact_map=rows)
    with pytest.raises(ValueError, match="99"):
        load_trajectory(path)


def test_directory_residue_mismatch_rejected(tmp_path):
    write_synthetic_h5(tmp_path / "a.h5", num_frames=8, num_residues=10, seed=1)
    write_synthetic_h5(tmp_path / "b.h5", num_frames=8, num_residues=12, seed=2)
    with pytest.raises(ValueError, match="residue-count mismatch"):
        load_trajectory(tmp_path)


def test_directory_heterogeneous_frame_counts_accepted(tmp_path):
    t1 = write_synthetic_h5(tmp_path / "a.h5", num_frames=16, num_residues=10, seed=1)
    t2 = write_synthetic_h5(tmp_path / "b.h5", num_frames=5, num_residues=10, seed=2)
    loaded = load_trajectory(tmp_path)
    assert loaded.num_frames == 21
    np.testing.assert_array_equal(loaded.positions[16:], t2.positions)
    np.testing.assert_array_equal(
        loaded.edge_index(16), t2.edge_indices[0]
    )
    del t1


# --- self-loop diagnostic --------------------------------------------------

def test_self_loop_diagnostic(tmp_path):
    path = tmp_path / "t.h5"
    traj = _write(path)
    assert contact_maps_have_self_loops(load_trajectory(path))
    # strip self-loops (a lab file thresholded with i != j)
    rows = []
    for e in traj.edge_indices:
        keep = e[0] != e[1]
        rows.append(e[:, keep].reshape(-1))
    _write(path, contact_map=rows)
    loaded = load_trajectory(path)  # accepted: mean-agg divides by real
    assert not contact_maps_have_self_loops(loaded)  # in-degree, floor 1


# --- end-to-end: a maximally drifted file still trains ---------------------

def test_drifted_file_feeds_window_dataset(tmp_path):
    """(N, R, 3) layout + 1-based labels + no rmsd + f64 coords, all at
    once: ingest repairs everything and WindowDataset yields graphs
    identical to the clean file's."""
    clean, drifted = tmp_path / "clean.h5", tmp_path / "drift.h5"
    traj = write_synthetic_h5(clean, num_frames=24, num_residues=10, seed=3)
    with h5py.File(clean) as f:
        pc = np.asarray(f["point_cloud"])
    aa1b = (traj.aminoacids % 20).astype(np.int64) + 1
    aa1b[0] = 20  # make the 1-based convention unambiguous
    _write(drifted, amino_acids=aa1b, rmsd=None,
           point_cloud=np.transpose(pc, (0, 2, 1)).astype(np.float64))
    with pytest.warns(SchemaWarning):
        loaded = load_trajectory(drifted)
    ds = WindowDataset(loaded, window_size=4, graph_mode="sparse",
                       max_edges=128)
    ref_traj = load_trajectory(clean)
    ds_ref = WindowDataset(ref_traj, window_size=4, graph_mode="sparse",
                           max_edges=128)
    a, b = ds.get_batch([5, 9]), ds_ref.get_batch([5, 9])
    np.testing.assert_array_equal(a["window"], b["window"])
    np.testing.assert_array_equal(a["edges"], b["edges"])
    np.testing.assert_array_equal(a["mask"], b["mask"])
    np.testing.assert_array_equal(np.asarray(loaded.aminoacids), aa1b - 1)
