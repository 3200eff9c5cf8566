"""Synthetic BBA-like trajectories for tests and benchmarks.

Generates a smooth pseudo-MD trajectory of a self-avoiding chain whose
contact maps have realistic density (~180 edges at 8 A for 28 residues,
matching the reference's measured graph size, ``bba_analysis.ipynb`` cell
32), plus writers that emit the reference HDF5 schema
(``contact_map`` ragged COO / ``point_cloud`` (N, 3, R) / ``amino_acids`` /
``rmsd``, ``/root/reference/dataset.py:110-127``) so the ingestion path is
exercised end-to-end without real MD data.

Two writers:

- ``write_synthetic_h5``: in-memory, returns the ``TrajectoryData`` —
  for tests (small N).
- ``write_synthetic_h5_streamed``: chunked generation + batched vlen
  writes, O(chunk) memory — emits reference-scale files (the 1FME dataset
  is 1,114,545 frames, ``bba_analysis.ipynb`` cells 9-10) in minutes.
  Bit-identical output to ``write_synthetic_h5`` for the same seed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from molecular_dynamics_neural_operator_tpu.data.h5 import TrajectoryData


def _chain_params(num_residues: int, seed: int):
    """Deterministic per-seed chain geometry + deformation modes + labels.

    RNG consumption order (steps, modes, phases, aa) matches the original
    single-shot generator so all writers/generators agree per seed."""
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
    modes = rng.normal(scale=0.6, size=(3, num_residues, 3))
    freqs = np.array([1.0, 2.0, 3.0])[:, None, None, None]
    phases = rng.uniform(0, 2 * np.pi, size=(3, 1, 1))
    aa = rng.integers(0, 20, size=num_residues).astype(np.int32)
    return base, modes, freqs, phases, aa


def _positions_at(base, modes, freqs, phases, t) -> np.ndarray:
    """(len(t), R, 3) f32 positions at phase values ``t`` (radians)."""
    t = t[:, None, None]
    wobble = sum(
        modes[k] * np.sin(freqs[k] * t + phases[k]) for k in range(3)
    )
    return (base[None] + wobble).astype(np.float32)


def _contact_edges(positions: np.ndarray, threshold: float):
    """Vectorized ragged COO extraction for a block of frames.

    Returns (list of flattened [rows; cols] int32 arrays, counts (C,))."""
    # Gram-matrix distance: ||a-b||^2 = |a|^2 + |b|^2 - 2<a,b>. The batched
    # 28x3x28 matmul rides BLAS; the naive (C, R, R, 3) broadcast-subtract
    # temp is ~16x slower on this host's memory bandwidth.
    n2 = np.einsum("irk,irk->ir", positions, positions)
    g = np.matmul(positions, positions.swapaxes(1, 2))
    d2 = n2[:, :, None] + n2[:, None, :] - 2.0 * g
    contact = d2 < threshold**2
    counts = contact.sum(axis=(1, 2))
    _, s, d = np.nonzero(contact)  # frame-major order
    splits = np.cumsum(counts)[:-1]
    s_parts = np.split(s.astype(np.int32), splits)
    d_parts = np.split(d.astype(np.int32), splits)
    flat = [np.concatenate([a, b]) for a, b in zip(s_parts, d_parts)]
    return flat, counts


def _time_grid(num_frames: int, dt):
    """Time points for the breathing modes.

    ``dt=None`` (legacy) spans exactly one period: ``linspace(0, 2pi, N)``.
    That makes per-frame motion shrink ~1/N — at reference scale (1.11M
    frames) the trajectory is numerically static frame to frame, so any
    model near the copy-last-frame baseline trivially aces a contact gate.
    Pass an explicit ``dt`` (time step PER FRAME) for scale-invariant
    dynamics: the per-frame displacement statistics then match a
    ``num_frames = 2pi/dt`` legacy file no matter how many frames are
    written."""
    if dt is None:
        return np.linspace(0, 2 * np.pi, num_frames)
    return np.arange(num_frames, dtype=np.float64) * float(dt)


def synthetic_trajectory(
    num_frames: int = 256,
    num_residues: int = 28,
    threshold: float = 8.0,
    seed: int = 0,
    dt: float | None = None,
) -> TrajectoryData:
    """Random-walk chain with ~3.8 A bonds breathing smoothly over time."""
    base, modes, freqs, phases, aa = _chain_params(num_residues, seed)
    t = _time_grid(num_frames, dt)
    positions = _positions_at(base, modes, freqs, phases, t)  # (N, R, 3)

    flat, _ = _contact_edges(positions, threshold)
    edge_indices = [e.reshape(2, -1) for e in flat]

    rmsd = (
        np.linalg.norm(positions - positions[0], axis=(1, 2))
        / np.sqrt(num_residues)
    ).astype(np.float32)

    return TrajectoryData(
        positions=positions,
        edge_indices=edge_indices,
        aminoacids=aa,
        rmsd=rmsd,
    )


def langevin_trajectory(
    num_frames: int = 256,
    num_residues: int = 28,
    threshold: float = 8.0,
    seed: int = 0,
    dt: float = 0.05,
    friction: float = 0.5,
    kT: float = 0.15,
    eps_well: float = 2.0,
    well_width: float = 1.0,
    k_backbone: float = 5.0,
    k_center: float = 0.02,
    network_cutoff: float = 10.0,
    burn_in: int = 1000,
) -> TrajectoryData:
    """Langevin dynamics on an anharmonic (double-well) elastic network.

    The second synthetic family: a data regime where LEARNING is required.
    The 3-sinusoid ``synthetic_trajectory`` is noiseless and low-frequency,
    so constant-velocity extrapolation is the optimal practical linear
    predictor on it (proved by the repo's own probe,
    ``tools/linear_probe_10k_results.json``) — no quality gate on that
    family can show a network contributing anything a two-frame formula
    doesn't know. This generator is built so both trivial forecasters
    fail while the dynamics stay Markov-learnable from a coordinate
    window:

    - **anharmonic forces**: every contact pair (base-geometry distance <
      ``network_cutoff``, from the same random-walk fold the sinusoid
      family uses) interacts through a double-well potential
      ``V(r) = eps ((r - r0)^2 - w^2)^2 / w^4`` with minima at r0 +- w —
      large-amplitude, genuinely nonlinear motion with no normal-mode
      (sum-of-sinusoids) structure, so linear predictors degrade within
      steps. Backbone bonds are stiff harmonic springs; a weak harmonic
      tether to the base fold (``k_center``) keeps the chain bounded.
    - **moderate friction bounds error integration** (round-5 retune,
      measured via ``tools/langevin_floor.py``): at the original
      friction 0.02 the system is ballistic — injected noise (and
      therefore ANY forecaster's per-step error) integrates ~t^3,
      amplifying 580x from step 1 to step 10, so no practical model
      could hold its 1-step advantage to the gate horizons. At
      friction 0.5 / kT 0.15 velocity decorrelates in ~40 steps:
      copy-last's MSE exceeds the optimal-forecast bound by ~8x at
      step 10 and ~2x at step 100 (the committed floor artifact), and
      constant-velocity extrapolation is 3-4x worse than copy-last at
      step 10 and ~20x at step 100 — both trivial forecasters fail
      visibly while a force-learning model has real, quantified
      headroom at every gate horizon.
    - **Markov-learnable**: forces depend only on current positions, and
      velocity is recoverable from any two window frames; the
      edge-conditioned conv sees exactly the pair distances the forces
      act through.

    Deterministic per seed (matches the real-MD data class of
    ``/root/reference/dataset.py:110-127``: thermostatted, stochastic,
    anharmonic — unlike the modes family). ``burn_in`` steps equilibrate
    before recording. Frames are single integrator steps.
    """
    rng = np.random.default_rng(seed)
    base, _, _, _, aa = _chain_params(num_residues, seed)
    base = base.astype(np.float64)

    # Elastic network from the base fold's own contact topology.
    d2 = np.sum((base[:, None] - base[None, :]) ** 2, axis=-1)
    iu, ju = np.triu_indices(num_residues, k=1)
    in_net = d2[iu, ju] < network_cutoff ** 2
    is_bb = (ju - iu) == 1
    keep = in_net | is_bb
    ei, ej = iu[keep], ju[keep]
    bb = is_bb[keep]
    r0 = np.sqrt(d2[ei, ej])

    inv_w4 = 1.0 / well_width ** 4

    def forces(x):
        dvec = x[ei] - x[ej]                     # (M, 3)
        r = np.linalg.norm(dvec, axis=1)
        u = r - r0
        # dV/dr: stiff harmonic on the backbone, double-well elsewhere
        dv = np.where(
            bb, k_backbone * u,
            4.0 * eps_well * u * (u * u - well_width ** 2) * inv_w4,
        )
        fpair = (dv / np.maximum(r, 1e-9))[:, None] * dvec  # on j, -on i
        f = np.zeros_like(x)
        np.add.at(f, ei, -fpair)
        np.add.at(f, ej, fpair)
        return f - k_center * (x - base)

    # Start in a well-displaced state with thermal velocities.
    x = base + rng.normal(scale=0.5 * well_width, size=base.shape)
    v = rng.normal(scale=np.sqrt(kT), size=base.shape)

    # BAOAB splitting (mass 1): exact O-step for the friction/noise pair.
    c1 = np.exp(-friction * dt)
    c2 = np.sqrt(kT * (1.0 - c1 * c1))
    half = 0.5 * dt

    positions = np.empty((num_frames, num_residues, 3), np.float32)
    f = forces(x)
    for step in range(burn_in + num_frames):
        v = v + half * f
        x = x + half * v
        v = c1 * v + c2 * rng.normal(size=v.shape)
        x = x + half * v
        f = forces(x)
        v = v + half * f
        if step >= burn_in:
            positions[step - burn_in] = x.astype(np.float32)

    flat, _ = _contact_edges(positions, threshold)
    edge_indices = [e.reshape(2, -1) for e in flat]
    rmsd = (
        np.linalg.norm(positions - positions[0], axis=(1, 2))
        / np.sqrt(num_residues)
    ).astype(np.float32)
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
    dt: float | None = None,
) -> TrajectoryData:
    """Write a synthetic trajectory in the reference's HDF5 schema."""
    import h5py

    traj = synthetic_trajectory(num_frames, num_residues, threshold, seed,
                                dt=dt)
    write_trajectory_h5(path, traj)
    return traj


def write_trajectory_h5(path, traj: TrajectoryData) -> None:
    """Write any in-memory TrajectoryData in the reference's HDF5 schema."""
    import h5py

    path = Path(path)
    with h5py.File(path, "w") as f:
        # Ragged COO stored flattened per frame ([rows...; cols...]), the
        # layout ContactMapDataset reshapes with .reshape(2, -1)
        # (dataset.py:189). One slice assignment batches the vlen writes.
        vlen = h5py.vlen_dtype(np.int32)
        cm = f.create_dataset("contact_map", (traj.num_frames,), dtype=vlen)
        cm[:] = [e.reshape(-1) for e in traj.edge_indices]
        f.create_dataset(
            "point_cloud", data=np.transpose(traj.positions, (0, 2, 1))
        )
        f.create_dataset("amino_acids", data=traj.aminoacids)
        f.create_dataset("rmsd", data=traj.rmsd)


def write_langevin_h5(path, **kwargs) -> TrajectoryData:
    """Write a ``langevin_trajectory`` in the reference's HDF5 schema."""
    traj = langevin_trajectory(**kwargs)
    write_trajectory_h5(path, traj)
    return traj


def write_synthetic_h5_streamed(
    path,
    num_frames: int,
    num_residues: int = 28,
    threshold: float = 8.0,
    seed: int = 0,
    chunk_frames: int = 65536,
    progress: bool = False,
    dt: float | None = None,
) -> dict:
    """Reference-scale synthetic h5 writer: O(chunk_frames) host memory.

    Generates positions/contacts chunk-by-chunk (the full (N, R, R)
    distance tensor of the one-shot path would be terabytes at 1FME's
    1.1M frames) and batches each chunk's ragged vlen writes into a single
    h5py slice assignment — the per-frame write loop was the round-2
    blocker for full-scale ingestion evidence. Output is bit-identical to
    ``write_synthetic_h5(path, num_frames, ...)`` for the same seed
    and ``dt``.

    Returns a summary dict (frames, total/max edge counts, bytes)."""
    import h5py

    base, modes, freqs, phases, aa = _chain_params(num_residues, seed)
    t_all = _time_grid(num_frames, dt)

    path = Path(path)
    total_edges = 0
    max_edges = 0
    with h5py.File(path, "w") as f:
        vlen = h5py.vlen_dtype(np.int32)
        cm = f.create_dataset(
            "contact_map", (num_frames,), dtype=vlen,
            chunks=(min(num_frames, 4096),),
        )
        pc = f.create_dataset(
            "point_cloud", (num_frames, 3, num_residues), dtype=np.float32,
            chunks=(min(num_frames, 4096), 3, num_residues),
        )
        rm = f.create_dataset("rmsd", (num_frames,), dtype=np.float32)
        f.create_dataset("amino_acids", data=aa)

        pos0 = None
        for i0 in range(0, num_frames, chunk_frames):
            i1 = min(i0 + chunk_frames, num_frames)
            pos = _positions_at(base, modes, freqs, phases, t_all[i0:i1])
            if pos0 is None:
                pos0 = pos[0]
            flat, counts = _contact_edges(pos, threshold)
            cm[i0:i1] = flat
            pc[i0:i1] = np.transpose(pos, (0, 2, 1))
            rm[i0:i1] = (
                np.linalg.norm(pos - pos0[None], axis=(1, 2))
                / np.sqrt(num_residues)
            ).astype(np.float32)
            total_edges += int(counts.sum())
            max_edges = max(max_edges, int(counts.max()))
            if progress:
                print(f"[write_synthetic_h5_streamed] {i1}/{num_frames} "
                      f"frames", flush=True)

    return {
        "path": str(path),
        "num_frames": num_frames,
        "num_residues": num_residues,
        "total_edges": total_edges,
        "max_edges_per_frame": max_edges,
        "file_bytes": path.stat().st_size,
    }
