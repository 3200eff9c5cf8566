"""Electrostatics preprocessing: template rendering, dx parsing, pipeline
orchestration with mocked external binaries, and the on-device
Debye-Hueckel grids vs a numpy oracle."""

import os
import stat
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.preprocess import (
    batched_debye_huckel_grids,
    debye_huckel_grid,
    parallel_trajectory_to_electrostatic_grid,
    render_apbs_input,
    trajectory_to_electrostatic_grid,
)
from molecular_dynamics_neural_operator_tpu.preprocess.electrostatics import (
    parse_dx_grid,
)
from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (
    debye_kappa,
    make_grid,
)


def test_render_apbs_input_substitutes_paths():
    text = render_apbs_input("/x/frame.pqr", "/x/frame.dx")
    assert "mol pqr /x/frame.pqr" in text
    # APBS appends .dx itself: the deck must carry the stem only
    assert "write pot dx /x/frame\n" in text
    assert "{{" not in text
    # reference deck physics preserved
    for needle in ("lpbe", "bcfl sdh", "pdie 2.0", "sdie 78.0",
                   "temp 310.0", "dime 97 65 65"):
        assert needle in text, needle


def _write_dx(path, arr):
    nx, ny, nz = arr.shape
    lines = [
        "# test grid",
        f"object 1 class gridpositions counts {nx} {ny} {nz}",
        "origin 0.0 0.0 0.0",
        "delta 1.0 0.0 0.0",
        "delta 0.0 1.0 0.0",
        "delta 0.0 0.0 1.0",
        f"object 2 class gridconnections counts {nx} {ny} {nz}",
        f"object 3 class array type double rank 0 items {arr.size} data follows",
    ]
    flat = arr.ravel()
    for i in range(0, flat.size, 3):
        lines.append(" ".join(f"{v:.6e}" for v in flat[i : i + 3]))
    lines.append('attribute "dep" string "positions"')
    Path(path).write_text("\n".join(lines) + "\n")


def test_parse_dx_roundtrip(tmp_path):
    arr = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    _write_dx(tmp_path / "g.dx", arr)
    out = parse_dx_grid(tmp_path / "g.dx")
    np.testing.assert_allclose(out, arr)


@pytest.fixture
def mock_binaries(tmp_path):
    """Fake pdb2pqr30/apbs executables that produce plausible outputs."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    pdb2pqr = bin_dir / "mock_pdb2pqr"
    pdb2pqr.write_text(
        "#!/bin/bash\n"
        "cp \"$1\" \"$2\"\n"  # pqr := pdb copy
    )
    apbs = bin_dir / "mock_apbs"
    # apbs reads the .in deck, finds the dx stem, writes stem.dx
    apbs.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, numpy as np\n"
        "deck = open(sys.argv[1]).read()\n"
        "stem = [l.split()[-1] for l in deck.splitlines()"
        " if l.strip().startswith('write pot dx')][0]\n"
        "nx, ny, nz = 2, 2, 2\n"
        "lines = [f'object 1 class gridpositions counts {nx} {ny} {nz}',\n"
        "         f'object 3 class array type double rank 0 items 8 data follows',\n"
        "         '1 2 3', '4 5 6', '7 8']\n"
        "open(stem + '.dx', 'w').write('\\n'.join(lines) + '\\n')\n"
    )
    for f in (pdb2pqr, apbs):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    return str(pdb2pqr), str(apbs)


def _fake_pdb(path, frames=3):
    models = []
    for m in range(frames):
        models.append(f"MODEL     {m + 1}")
        models.append(
            f"ATOM      1  CA  ALA A   1      {m:8.3f}   0.000   0.000  1.00  0.00"
        )
        models.append("ENDMDL")
    Path(path).write_text("\n".join(models) + "\nEND\n")


def test_pipeline_with_mock_binaries(tmp_path, mock_binaries):
    pdb2pqr, apbs = mock_binaries
    pdb = tmp_path / "traj.pdb"
    _fake_pdb(pdb, frames=3)
    written = trajectory_to_electrostatic_grid(
        pdb, pdb, tmp_path / "scratch", tmp_path / "results",
        save_interval=2, pdb2pqr_exe=pdb2pqr, apbs_exe=apbs,
    )
    assert len(written) >= 1
    total = sum(np.load(p).shape[0] for p in written)
    assert total == 3
    grid = np.load(written[0])
    assert grid.shape[-3:] == (2, 2, 2)
    # temp files cleaned up
    assert list((tmp_path / "scratch").glob("*")) == []


def test_pipeline_failfast_on_bad_binary(tmp_path):
    pdb = tmp_path / "traj.pdb"
    _fake_pdb(pdb, frames=1)
    with pytest.raises(ValueError, match="pdb2pqr failed"):
        trajectory_to_electrostatic_grid(
            pdb, pdb, tmp_path / "s", tmp_path / "r",
            pdb2pqr_exe="false", apbs_exe="false",
        )


def test_parallel_pipeline(tmp_path, mock_binaries):
    pdb2pqr, apbs = mock_binaries
    pdbs = []
    for i in range(2):
        p = tmp_path / f"t{i}.pdb"
        _fake_pdb(p, frames=2)
        pdbs.append(p)
    written = parallel_trajectory_to_electrostatic_grid(
        pdbs, pdbs, tmp_path / "s", tmp_path / "r", num_workers=2,
        pdb2pqr_exe=pdb2pqr, apbs_exe=apbs,
    )
    # 2 files per trajectory: frame 0 flushes immediately (i % interval == 0
    # at i=0, reference behavior preprocess.py:81) + the remainder flush
    assert len(written) == 4
    assert sum(np.load(p).shape[0] for p in written) == 4


def test_debye_huckel_grid_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(17, 3)).astype(np.float32) * 5
    q = rng.normal(size=(17,)).astype(np.float32)
    grid = np.asarray(make_grid([0, 0, 0], [20, 20, 20], (5, 4, 3)))
    phi = np.asarray(debye_huckel_grid(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(grid), block=16
    ))

    kappa = debye_kappa()
    lb = 16712.2 / (78.0 * 310.0)
    d = np.sqrt(np.maximum(
        ((grid[:, None, :] - pos[None]) ** 2).sum(-1), 1.0
    ))
    ref = lb * (np.exp(-kappa * d) / d) @ q
    np.testing.assert_allclose(phi, ref, rtol=1e-4, atol=1e-5)
    assert phi.shape == (60,)


def test_batched_dh_grids():
    pos = np.zeros((2, 3, 3), np.float32)
    pos[1] += 1.0
    q = np.ones((3,), np.float32)
    grid = np.asarray(make_grid([0, 0, 0], [10, 10, 10], (3, 3, 3)))
    out = batched_debye_huckel_grids(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(grid), block=9
    )
    assert out.shape == (2, 27)
    assert np.isfinite(np.asarray(out)).all()


def test_debye_huckel_at_atoms_matches_numpy_oracle():
    from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (
        _BJERRUM_A_K,
        debye_huckel_at_atoms,
    )

    rng = np.random.default_rng(3)
    pos = rng.normal(size=(9, 3)).astype(np.float32) * 6
    q = rng.normal(size=(9,)).astype(np.float32)
    phi = np.asarray(debye_huckel_at_atoms(pos, q))

    kappa = debye_kappa()
    lb = _BJERRUM_A_K / (78.0 * 310.0)
    expect = np.zeros(9)
    for i in range(9):
        for j in range(9):
            if i == j:
                continue  # self-interaction excluded
            d = max(np.linalg.norm(pos[i] - pos[j]), 1.0)
            expect[i] += lb * q[j] * np.exp(-kappa * d) / d
    np.testing.assert_allclose(phi, expect, rtol=1e-4, atol=1e-5)


def test_sample_grid_trilinear_matches_scipy():
    from scipy.ndimage import map_coordinates

    from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (
        sample_grid_trilinear,
    )

    rng = np.random.default_rng(4)
    grid = rng.normal(size=(7, 6, 5)).astype(np.float32)
    origin = np.array([-2.0, 1.0, 0.5], np.float32)
    spacing = np.array([0.8, 1.1, 0.9], np.float32)
    pos = origin + rng.uniform(0.2, 3.0, size=(20, 3)).astype(np.float32)

    ours = np.asarray(sample_grid_trilinear(grid, origin, spacing, pos))
    coords = ((pos - origin) / spacing).T  # (3, N) fractional indices
    expect = map_coordinates(grid, coords, order=1, mode="nearest")
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-5)


def test_gkn_electrostatics_feature_path():
    """electrostatics="dh" widens fc1 by one feature, changes the forward,
    and composes with the jitted rollout scan (the potential recomputes
    from predicted coordinates every step)."""
    import dataclasses

    import jax

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                      num_residues=10, compute_dtype="float32",
                      predict_delta=True, electrostatics="dh")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    assert params["fc1"]["w"].shape[0] == cfg.node_features + 1

    traj = synthetic_trajectory(num_frames=5, num_residues=10, seed=6)
    roll = make_rollout_fn(cfg, num_steps=4)
    coords, *_ = roll(params, jnp.asarray(traj.aminoacids),
                      jnp.asarray(traj.positions[:3]))
    assert np.isfinite(np.asarray(coords)).all()

    # the feature actually feeds the head: zeroing it changes the output
    cfg0 = dataclasses.replace(cfg, electrostatics="none")
    params0 = {**params, "fc1": {
        "w": params["fc1"]["w"][:-1], "b": params["fc1"]["b"]}}
    roll0 = make_rollout_fn(cfg0, num_steps=4)
    coords0, *_ = roll0(params0, jnp.asarray(traj.aminoacids),
                        jnp.asarray(traj.positions[:3]))
    assert not np.allclose(np.asarray(coords), np.asarray(coords0))
