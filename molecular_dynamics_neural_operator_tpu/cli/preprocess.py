"""Preprocessing CLI — trajectories -> electrostatic potential grids.

Orchestrates the pdb2pqr/APBS pipeline over trajectory lists
(``/root/reference/preprocess.py:108-131`` parity), or the on-device
Debye-Hueckel grid path (``--mode dh``) which needs no external binaries.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pdb_files", type=Path, nargs="+", required=True)
    p.add_argument("--traj_files", type=Path, nargs="+", required=True)
    p.add_argument("--scratch_dir", type=Path, required=True)
    p.add_argument("--results_dir", type=Path, required=True)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--save_interval", type=int, default=1000)
    p.add_argument("--mode", choices=["apbs", "dh"], default="apbs")
    p.add_argument("--pdb2pqr_exe", default="pdb2pqr30")
    p.add_argument("--apbs_exe", default="apbs")
    # dh-mode grid geometry (defaults match the APBS deck's fine grid)
    p.add_argument("--grid_lengths", type=float, nargs=3,
                   default=[52.958, 44.009, 38.33])
    p.add_argument("--grid_dime", type=int, nargs=3, default=[97, 65, 65])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.mode == "apbs":
        from molecular_dynamics_neural_operator_tpu.preprocess import (
            parallel_trajectory_to_electrostatic_grid,
        )

        written = parallel_trajectory_to_electrostatic_grid(
            args.pdb_files,
            args.traj_files,
            args.scratch_dir,
            args.results_dir,
            num_workers=args.num_workers,
            save_interval=args.save_interval,
            pdb2pqr_exe=args.pdb2pqr_exe,
            apbs_exe=args.apbs_exe,
        )
        print(f"wrote {len(written)} grid chunks")
        return written

    # dh mode: positions from an h5 trajectory, unit charges unless a
    # charges .npy is provided alongside
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.data import load_trajectory
    from molecular_dynamics_neural_operator_tpu.preprocess import (
        batched_debye_huckel_grids,
    )
    from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (
        make_grid,
    )

    written = []
    args.results_dir.mkdir(parents=True, exist_ok=True)
    for traj_path in args.traj_files:
        traj = load_trajectory(traj_path)
        charges_path = Path(traj_path).with_suffix(".charges.npy")
        charges = (
            np.load(charges_path)
            if charges_path.exists()
            else np.ones(traj.num_residues, np.float32)
        )
        center = traj.positions.mean(axis=(0, 1))
        grid = make_grid(center, args.grid_lengths, tuple(args.grid_dime))
        phis = batched_debye_huckel_grids(
            jnp.asarray(traj.positions), jnp.asarray(charges), grid
        )
        out = args.results_dir / (Path(traj_path).stem + "_dh.npy")
        np.save(out, np.asarray(phis).reshape(
            (traj.num_frames,) + tuple(args.grid_dime)
        ))
        written.append(out)
        print(f"wrote {out}")
    return written


if __name__ == "__main__":
    main()
