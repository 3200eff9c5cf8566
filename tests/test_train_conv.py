"""Batched Pallas training conv stack (interpret mode) vs the XLA path:
values, gradients, and one full optimizer step."""

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
    _loss_fn,
    featurize_batch,
    make_train_step,
)


def _setup(impl: str):
    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=12, max_edges=128, graph_mode="sparse",
                      compute_dtype="float32", train_conv_impl=impl,
                      predict_delta=True)
    traj = synthetic_trajectory(num_frames=24, num_residues=12, seed=4)
    ds = WindowDataset(traj, window_size=4, graph_mode="sparse",
                       max_edges=128)
    batch = {k: jnp.asarray(v) for k, v in
             ds.get_batch(np.arange(5)).items()}
    return cfg, batch


def test_pallas_train_stack_matches_xla_forward_and_grads():
    cfg_p, batch = _setup("pallas")
    cfg_x = dataclasses.replace(cfg_p, train_conv_impl="xla")
    state, _, _ = create_train_state(jax.random.PRNGKey(0), cfg_p,
                                     TrainConfig(lr=1e-3))

    def loss(params, cfg):
        return _loss_fn(params, cfg, featurize_batch(cfg, batch))[0]

    v_p, g_p = jax.value_and_grad(lambda p: loss(p, cfg_p))(state.params)
    v_x, g_x = jax.value_and_grad(lambda p: loss(p, cfg_x))(state.params)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(g_x))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_p):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]),
            rtol=2e-4, atol=1e-5, err_msg=f"grad mismatch at {path}",
        )


def test_pallas_train_stack_full_step():
    cfg_p, batch = _setup("pallas")
    cfg_x = dataclasses.replace(cfg_p, train_conv_impl="xla")
    results = {}
    for name, cfg in (("pallas", cfg_p), ("xla", cfg_x)):
        state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                          TrainConfig(lr=1e-3))
        step = make_train_step(cfg, tx, donate=False)
        new, m = step(state, batch)
        results[name] = (new, float(m["rel_l2"]))
    assert abs(results["pallas"][1] - results["xla"][1]) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(results["pallas"][0].params),
                    jax.tree_util.tree_leaves(results["xla"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_pallas_train_stack_latent():
    from molecular_dynamics_neural_operator_tpu.models import gkn_apply

    cfg_p, batch = _setup("pallas")
    cfg_x = dataclasses.replace(cfg_p, train_conv_impl="xla")
    state, _, _ = create_train_state(jax.random.PRNGKey(0), cfg_p,
                                     TrainConfig(lr=1e-3))
    gb = featurize_batch(cfg_p, batch)
    out_p, lat_p = gkn_apply(state.params, cfg_p, gb, return_latent=True)
    out_x, lat_x = gkn_apply(state.params, cfg_x, gb, return_latent=True)
    np.testing.assert_allclose(np.asarray(lat_p), np.asarray(lat_x),
                               rtol=1e-5, atol=1e-6)
