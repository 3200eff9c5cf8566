"""HDF5 trajectory ingestion, reference schema compatible.

Reads the same file layout as the reference's ``ContactMapDataset``
(``/root/reference/dataset.py:56-164``):

- ``contact_map``: ragged COO edge lists per frame (flattened [rows; cols]),
- ``point_cloud``: (N, 3, R) coordinates (transposed to (N, R, 3) on load,
  ``dataset.py:159``),
- ``rmsd``: per-frame RMSD values (optional, ``dataset.py:117-121``),
- ``amino_acids``: integer amino-acid labels (optionally from a separate
  node-features file, ``dataset.py:122-127,144-149``).

Both single-file and directory modes are supported (directory mode globs and
sorts ``*.h5``, ``dataset.py:129-141``). The reference's closed-file-handle
bug in directory mode (``dataset.py:149`` reads node features from a file
handle that has already left its ``with`` block) is fixed here: node features
are read from the first file while it is open.
"""

from __future__ import annotations

import glob
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Union

import numpy as np

PathLike = Union[str, Path]


def aminoacid_int_to_onehot(labels: np.ndarray) -> np.ndarray:
    """One-hot over the 20 amino acids; labels are 1-indexed in [1, 20]
    (``dataset.py:12-18``). Vectorized (no Python loop)."""
    labels = np.asarray(labels)
    onehot = np.zeros((len(labels), 20), np.float32)
    onehot[np.arange(len(labels)), labels - 1] = 1.0
    return onehot


def compute_node_features(
    labels: np.ndarray,
    node_feature: str = "amino_acid_onehot",
    num_nodes: Optional[int] = None,
    constant_num_node_features: int = 20,
) -> np.ndarray:
    """Reference node-feature modes (``dataset.py:166-175``): "constant"
    (all-ones), "identity" (eye), "amino_acid_onehot". The training path
    uses raw integer labels for the embedding (``dataset.py:162-164``);
    these exist for capability parity with models consuming feature
    vectors directly."""
    n = num_nodes if num_nodes is not None else len(labels)
    if node_feature == "constant":
        return np.ones((n, constant_num_node_features), np.float32)
    if node_feature == "identity":
        return np.eye(n, dtype=np.float32)
    if node_feature == "amino_acid_onehot":
        return aminoacid_int_to_onehot(labels)
    raise ValueError(f"node_feature: {node_feature} not supported.")


@dataclass
class TrajectoryData:
    """In-memory trajectory: positions (N, R, 3) f32, per-frame ragged COO
    edge lists, amino-acid labels (R,) int32, optional rmsd (N,)."""

    positions: np.ndarray
    edge_indices: list  # list of (2, E_i) int arrays (ragged)
    aminoacids: np.ndarray
    rmsd: Optional[np.ndarray] = None

    @property
    def num_frames(self) -> int:
        return self.positions.shape[0]

    @property
    def num_residues(self) -> int:
        return self.positions.shape[1]


def _read_one(
    f,
    edge_index_dset_name: str,
    edge_attr_dset_name: str,
    max_frames: int,
):
    edge_raw = f[edge_index_dset_name][:max_frames]
    positions = np.asarray(f[edge_attr_dset_name][:max_frames])
    rmsd = None
    if "rmsd" in f:
        try:
            rmsd = np.asarray(f["rmsd"][:max_frames])
        except Exception:
            rmsd = None
    return list(edge_raw), positions, rmsd


def load_trajectory(
    path: PathLike,
    edge_index_dset_name: str = "contact_map",
    edge_attr_dset_name: str = "point_cloud",
    node_feature_dset_name: str = "amino_acids",
    node_feature_dset_path: Optional[PathLike] = None,
    max_frames: int = 100_000_000,
) -> TrajectoryData:
    """Load one ``.h5`` file or a directory of them (concatenated in sorted
    order). Positions are transposed from the on-disk (N, 3, R) to (N, R, 3)."""
    import h5py

    path = Path(path)
    edge_lists: list = []
    position_chunks: list = []
    rmsd_chunks: list = []
    node_features = None

    if str(path).endswith(".h5"):
        files = [path]
    else:
        files = sorted(Path(p) for p in glob.glob(str(path) + "/*.h5"))
        if not files:
            raise FileNotFoundError(f"no .h5 files under {path}")

    for i, fp in enumerate(files):
        with h5py.File(fp, "r", libver="latest", swmr=False) as f:
            e, p, r = _read_one(
                f, edge_index_dset_name, edge_attr_dset_name, max_frames
            )
            edge_lists.extend(e)
            position_chunks.append(p)
            if r is not None:
                rmsd_chunks.append(r)
            if i == 0 and node_feature_dset_path is None:
                if node_feature_dset_name in f:
                    node_features = np.asarray(f[node_feature_dset_name][...])

    if node_feature_dset_path is not None:
        with h5py.File(node_feature_dset_path, "r") as nf:
            node_features = np.asarray(nf[node_feature_dset_name][...])

    if node_features is None:
        raise ValueError(
            f"node features dataset '{node_feature_dset_name}' not found"
        )

    positions = np.concatenate(position_chunks, axis=0).astype(np.float32)
    # On-disk layout is (N, 3, R); reorder to (N, R, 3) (dataset.py:159).
    # Materialize contiguously ONCE: a transpose view would make the native
    # batch packer's ascontiguousarray copy the whole trajectory per batch.
    positions = np.ascontiguousarray(np.transpose(positions, (0, 2, 1)))

    edge_indices = [np.asarray(e).reshape(2, -1).astype(np.int32) for e in edge_lists]
    rmsd = np.concatenate(rmsd_chunks) if rmsd_chunks else None

    return TrajectoryData(
        positions=positions,
        edge_indices=edge_indices,
        aminoacids=np.asarray(node_features).astype(np.int32),
        rmsd=rmsd,
    )
