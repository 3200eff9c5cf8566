"""Synthetic BBA-like trajectories for tests and benchmarks.

Generates a smooth pseudo-MD trajectory of a self-avoiding chain whose
contact maps have realistic density (~180 edges at 8 A for 28 residues,
matching the reference's measured graph size, ``bba_analysis.ipynb`` cell
32), plus a writer that emits the reference HDF5 schema
(``contact_map`` ragged COO / ``point_cloud`` (N, 3, R) / ``amino_acids`` /
``rmsd``, ``/root/reference/dataset.py:110-127``) so the ingestion path is
exercised end-to-end without real MD data.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from molecular_dynamics_neural_operator_tpu.data.h5 import TrajectoryData


def synthetic_trajectory(
    num_frames: int = 256,
    num_residues: int = 28,
    threshold: float = 8.0,
    seed: int = 0,
) -> TrajectoryData:
    """Random-walk chain with ~3.8 A bonds breathing smoothly over time."""
    rng = np.random.default_rng(seed)

    # Base chain: cumulative random unit steps. The 5.5 A effective step
    # (vs the 3.8 A Ca-Ca bond) compensates for the random walk's
    # over-compaction relative to a real fold, matching BBA's observed
    # contact density (~180-210 edges at 8 A incl. self-loops for R=28,
    # bba_analysis.ipynb cell 32) instead of the ~340 a 3.8 A walk gives.
    steps = rng.normal(size=(num_residues, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    base = np.cumsum(steps * 5.5, axis=0)
    base -= base.mean(axis=0)

    # Smooth temporal deformation: a few low-frequency modes.
    t = np.linspace(0, 2 * np.pi, num_frames)[:, None, None]
    modes = rng.normal(scale=0.6, size=(3, num_residues, 3))
    freqs = np.array([1.0, 2.0, 3.0])[:, None, None, None]
    phases = rng.uniform(0, 2 * np.pi, size=(3, 1, 1))
    wobble = sum(
        modes[k] * np.sin(freqs[k] * t + phases[k]) for k in range(3)
    )
    positions = (base[None] + wobble).astype(np.float32)  # (N, R, 3)

    d2 = np.sum(
        (positions[:, :, None, :] - positions[:, None, :, :]) ** 2, axis=-1
    )
    contact = d2 < threshold**2
    edge_indices = []
    for n in range(num_frames):
        s, d = np.nonzero(contact[n])
        edge_indices.append(np.stack([s, d]).astype(np.int32))

    aa = rng.integers(0, 20, size=num_residues).astype(np.int32)
    rmsd = np.linalg.norm(
        positions - positions[0], axis=(1, 2)
    ).astype(np.float32) / np.sqrt(num_residues)

    return TrajectoryData(
        positions=positions,
        edge_indices=edge_indices,
        aminoacids=aa,
        rmsd=rmsd,
    )


def write_synthetic_h5(
    path,
    num_frames: int = 256,
    num_residues: int = 28,
    threshold: float = 8.0,
    seed: int = 0,
) -> TrajectoryData:
    """Write a synthetic trajectory in the reference's HDF5 schema."""
    import h5py

    traj = synthetic_trajectory(num_frames, num_residues, threshold, seed)
    path = Path(path)
    with h5py.File(path, "w") as f:
        # Ragged COO stored flattened per frame ([rows...; cols...]), the
        # layout ContactMapDataset reshapes with .reshape(2, -1)
        # (dataset.py:189).
        dt = h5py.vlen_dtype(np.int32)
        cm = f.create_dataset("contact_map", (traj.num_frames,), dtype=dt)
        for i, e in enumerate(traj.edge_indices):
            cm[i] = e.reshape(-1)
        f.create_dataset(
            "point_cloud", data=np.transpose(traj.positions, (0, 2, 1))
        )
        f.create_dataset("amino_acids", data=traj.aminoacids)
        f.create_dataset("rmsd", data=traj.rmsd)
    return traj
