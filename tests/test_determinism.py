"""Determinism: same seed -> bit-identical training and rollout.

SURVEY.md section 5 (race detection): the framework's concurrency story is
jit purity + deterministic tests; this pins it.
"""

import jax
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig, TrainConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory, WindowDataset
from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan
from molecular_dynamics_neural_operator_tpu.train import (
    create_train_state,
    make_train_step,
    train_epoch,
    train_valid_split,
)


def _run_once():
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, compute_dtype="float32",
                      predict_delta=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, seed=7)
    traj = synthetic_trajectory(num_frames=60, num_residues=10, seed=7)
    ds = WindowDataset(traj, window_size=4)
    tr, _ = train_valid_split(len(ds), 0.8)
    state, tx, _ = create_train_state(jax.random.PRNGKey(tcfg.seed), cfg, tcfg)
    step = make_train_step(cfg, tx, donate=False)
    state, metrics = train_epoch(state, step, ds, tr, 8, seed=tcfg.seed,
                                 epoch=0)
    coords, *_ = rollout_scan(state.params, cfg,
                             np.asarray(traj.aminoacids),
                             traj.positions[:4], 5)
    return metrics, np.asarray(coords), state


def test_training_and_rollout_are_deterministic():
    m1, c1, s1 = _run_once()
    m2, c2, s2 = _run_once()
    # math must be bit-identical; wall-clock throughput meters are not
    for k in ("rel_l2", "mse"):
        assert m1[k] == m2[k]
    np.testing.assert_array_equal(c1, c2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
