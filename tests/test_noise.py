"""GNS-style random-walk input noise (train/noise.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import (
    ModelConfig,
    TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset,
    synthetic_trajectory,
)
from molecular_dynamics_neural_operator_tpu.train import (
    create_train_state,
    make_train_step,
)
from molecular_dynamics_neural_operator_tpu.train.curriculum import (
    make_curriculum_train_step,
)
from molecular_dynamics_neural_operator_tpu.train.noise import (
    noised_window,
    window_random_walk_noise,
)


def _setup():
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, compute_dtype="float32",
                      predict_delta=True)
    tcfg = TrainConfig(lr=1e-3, weight_decay=0.0, batch_size=8)
    traj = synthetic_trajectory(num_frames=80, num_residues=10, seed=6)
    ds = WindowDataset(traj, window_size=4)
    return cfg, tcfg, traj, ds


def test_random_walk_noise_statistics():
    """Per-frame noise std grows like sqrt(t/T)*noise_std: the LAST frame
    carries the configured std, earlier frames proportionally less, and
    consecutive-frame differences (the velocities the LSTM sees) carry
    only noise_std/sqrt(T)."""
    t, std = 8, 0.5
    noise = window_random_walk_noise(
        jax.random.PRNGKey(0), (4096, t, 3, 3), std)
    per_frame = np.asarray(jnp.std(noise, axis=(0, 2, 3)))
    expected = std * np.sqrt((np.arange(t) + 1) / t)
    np.testing.assert_allclose(per_frame, expected, rtol=0.05)
    vel = np.asarray(jnp.std(jnp.diff(noise, axis=1)))
    np.testing.assert_allclose(vel, std / np.sqrt(t), rtol=0.05)


def test_noised_window_deterministic_and_zero_passthrough():
    w = jnp.ones((2, 4, 5, 3))
    rng = jax.random.PRNGKey(3)
    a = noised_window(w, rng, jnp.int32(7), 0.1)
    b = noised_window(w, rng, jnp.int32(7), 0.1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different step draws different noise
    c = noised_window(w, rng, jnp.int32(8), 0.1)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # noise_std <= 0 is the identity (same object, no tracing cost)
    assert noised_window(w, rng, jnp.int32(7), 0.0) is w


def test_noise_zero_matches_plain_step_bitwise():
    """noise_std=0 must not change the step function at all."""
    cfg, tcfg, traj, ds = _setup()
    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = ds.get_batch(np.arange(8))
    s_a, m_a = make_train_step(cfg, tx, donate=False)(state0, batch)
    s_b, m_b = make_train_step(cfg, tx, donate=False, noise_std=0.0)(
        state0, batch)
    assert float(m_a["rel_l2"]) == float(m_b["rel_l2"])
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noisy_teacher_step_trains_and_differs():
    cfg, tcfg, traj, ds = _setup()
    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = ds.get_batch(np.arange(8))
    step_clean = make_train_step(cfg, tx, donate=False)
    step_noisy = make_train_step(cfg, tx, donate=False, noise_std=0.05)
    s_c, m_c = step_clean(state0, batch)
    s_n, m_n = step_noisy(state0, batch)
    assert np.isfinite(float(m_n["rel_l2"]))
    assert float(m_n["rel_l2"]) != float(m_c["rel_l2"])
    # the update is real and finite
    leaves = jax.tree_util.tree_leaves(s_n.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # same state (same rng+step) -> reproducible noisy step
    s_n2, m_n2 = step_noisy(state0, batch)
    assert float(m_n["rel_l2"]) == float(m_n2["rel_l2"])


def test_noisy_curriculum_step_reproducible_and_finite():
    cfg, tcfg, traj, ds = _setup()
    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = ds.get_batch(np.arange(8), rollout_horizon=2)
    step = make_curriculum_train_step(cfg, tx, rollout_steps=2,
                                      coord_clip=1000.0, noise_std=0.05)
    s1, m1 = step(state0, batch)
    s2, m2 = step(state0, batch)
    assert np.isfinite(float(m1["rel_l2"]))
    assert float(m1["rel_l2"]) == float(m2["rel_l2"])
    # the noise advances with the step counter: a second step from the
    # NEW state on the same batch uses different noise than re-running
    # the first (weights also moved, so just check it runs finite)
    s3, m3 = step(s1, batch)
    assert np.isfinite(float(m3["rel_l2"]))


def test_sharded_noisy_curriculum_matches_single_device():
    """The noise is a function of (rng, step, GLOBAL shape) only, so the
    data-parallel step realizes bitwise the same noise as the
    single-device step and the parity pin survives noise_std > 0."""
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_mesh,
        make_sharded_curriculum_train_step,
    )

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs the multi-device CPU mesh")

    cfg, tcfg, traj, ds = _setup()
    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = ds.get_batch(np.arange(8), rollout_horizon=2)

    step_single = make_curriculum_train_step(
        cfg, tx, rollout_steps=2, coord_clip=1000.0, noise_std=0.05)
    mesh = make_mesh()
    step_dp, put = make_sharded_curriculum_train_step(
        cfg, tx, mesh, rollout_steps=2, coord_clip=1000.0, noise_std=0.05)

    s_s, m_s = step_single(state0, batch)
    s_d, m_d = step_dp(state0, put(batch))
    np.testing.assert_allclose(float(m_s["rel_l2"]), float(m_d["rel_l2"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_s.params),
                    jax.tree_util.tree_leaves(s_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_cli_accepts_noise_std(tmp_path):
    """--noise_std drives an e2e CLI run."""
    import subprocess
    import sys

    from molecular_dynamics_neural_operator_tpu.data.synthetic import (
        write_synthetic_h5,
    )

    h5 = tmp_path / "tiny.h5"
    write_synthetic_h5(str(h5), num_frames=40, num_residues=10, seed=0)
    r = subprocess.run(
        [sys.executable, "-m",
         "molecular_dynamics_neural_operator_tpu.cli.train",
         "--data_path", str(h5), "--run_path", str(tmp_path / "run"),
         "--epochs", "1", "--batch_size", "8", "--width", "8",
         "--kernel_width", "16", "--depth", "1", "--window_size", "4",
         "--num_residues", "10", "--noise_std", "0.05",
         "--rollout_steps", "2", "--generate_movie", "False",
         "--plot_latent", "False"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "noise_std=0.05" in r.stdout
