"""Hand-written conv-stack VJP vs plain autodiff — values AND grads."""

import dataclasses

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
from molecular_dynamics_neural_operator_tpu.train import create_train_state
from molecular_dynamics_neural_operator_tpu.train.loop import (
    featurize_batch,
    make_train_step,
    _loss_fn,
)


def _setup(fused: bool):
    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=12, max_edges=128, graph_mode="sparse",
                      compute_dtype="float32", fused_conv_vjp=fused)
    traj = synthetic_trajectory(num_frames=24, num_residues=12, seed=2)
    ds = WindowDataset(traj, window_size=4, graph_mode="sparse",
                       max_edges=128)
    batch = {k: jnp.asarray(v) for k, v in
             ds.get_batch(np.arange(6)).items()}
    return cfg, batch


def test_fused_vjp_matches_autodiff_values_and_grads():
    cfg_f, batch = _setup(True)
    cfg_r, _ = _setup(False)
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg_f,
                                      TrainConfig(lr=1e-3))

    def loss(params, cfg):
        gb = featurize_batch(cfg, batch)
        return _loss_fn(params, cfg, gb)[0]

    v_f, g_f = jax.value_and_grad(lambda p: loss(p, cfg_f))(state.params)
    v_r, g_r = jax.value_and_grad(lambda p: loss(p, cfg_r))(state.params)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-6)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(g_r))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {path}",
        )


def test_fused_vjp_trains_identically():
    """One full optimizer step (vmapped loss, Adam) agrees between the
    fused VJP and plain autodiff."""
    cfg_f, batch = _setup(True)
    cfg_r, _ = _setup(False)
    out = {}
    for name, cfg in (("fused", cfg_f), ("ref", cfg_r)):
        state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                          TrainConfig(lr=1e-3))
        step = make_train_step(cfg, tx, donate=False)
        new, m = step(state, batch)
        out[name] = (new, float(m["rel_l2"]))
    assert abs(out["fused"][1] - out["ref"][1]) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(out["fused"][0].params),
                    jax.tree_util.tree_leaves(out["ref"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fused_vjp_through_curriculum_scan():
    """The custom VJP must differentiate correctly inside the K-step
    rollout scan (scan-of-vmap-of-custom_vjp)."""
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step,
    )

    cfg_f, _ = _setup(True)
    cfg_f = dataclasses.replace(cfg_f, predict_delta=True)
    cfg_r = dataclasses.replace(cfg_f, fused_conv_vjp=False)
    traj = synthetic_trajectory(num_frames=24, num_residues=12, seed=2)
    ds = WindowDataset(traj, window_size=4, graph_mode="sparse",
                       max_edges=128)
    batch = {k: jnp.asarray(v) for k, v in
             ds.get_batch(np.arange(6), rollout_horizon=3).items()}
    outs = {}
    for name, cfg in (("fused", cfg_f), ("ref", cfg_r)):
        state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                          TrainConfig(lr=1e-3))
        step = make_curriculum_train_step(cfg, tx, rollout_steps=3)
        new, m = step(state, batch)
        outs[name] = (new, float(m["rel_l2"]))
    assert abs(outs["fused"][1] - outs["ref"][1]) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(outs["fused"][0].params),
                    jax.tree_util.tree_leaves(outs["ref"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
