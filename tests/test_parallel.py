"""Mesh / sharding paths on the 8-device virtual CPU mesh.

The reference's only parallelism is single-process PyG DataParallel
(``graph_kernel.py:528``); these tests cover its TPU replacement — batch
sharding over "data" — plus the edge-axis model parallelism that has no
reference counterpart (SURVEY.md section 5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import (
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.geometry import (
    contact_map,
    dense_edge_features,
    dense_to_padded_edges,
    edge_features_from_edges,
)
from molecular_dynamics_neural_operator_tpu.models import (
    DenseGraph,
    GKNBatch,
    SparseGraph,
    gkn_apply,
    gkn_init,
)
from molecular_dynamics_neural_operator_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from molecular_dynamics_neural_operator_tpu.parallel.edge_sharded import (
    make_edge_sharded_forward,
    make_edge_sharded_train_step,
)
from molecular_dynamics_neural_operator_tpu.train import (
    create_train_state,
    make_train_step,
)


def _sparse_inputs(cfg, b=8, seed=1):
    pos = jax.random.normal(jax.random.PRNGKey(seed), (b, cfg.window_size,
                                                       cfg.num_residues, 3)) * 4
    aa = jnp.arange(cfg.num_residues, dtype=jnp.int32) % 20
    adj = np.asarray(contact_map(pos[:, 0], 8.0))
    edges = np.zeros((b, 2, cfg.max_edges), np.int32)
    mask = np.zeros((b, cfg.max_edges), np.float32)
    for i in range(b):
        edges[i], mask[i] = dense_to_padded_edges(adj[i], cfg.max_edges)
    edges, mask = jnp.asarray(edges), jnp.asarray(mask)
    ef = jax.vmap(edge_features_from_edges)(pos[:, 0], edges)
    y = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (b, cfg.num_residues, 3))
    return aa, pos, edges, mask, ef, y


@pytest.fixture(scope="module")
def sparse_cfg():
    return ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                       num_residues=12, max_edges=128, graph_mode="sparse",
                       compute_dtype="float32")


def test_mesh_autofill():
    mesh = make_mesh(MeshConfig(data=1, model=1))
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh(MeshConfig(data=4, model=2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_edge_sharded_forward_matches_single_device(sparse_cfg):
    cfg = sparse_cfg
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    aa, pos, edges, mask, ef, y = _sparse_inputs(cfg)
    ref = gkn_apply(
        params, cfg,
        GKNBatch(aa, pos, SparseGraph(edges, mask, ef), y),
    )
    mesh = make_mesh(MeshConfig(data=4, model=2))
    fwd = jax.jit(make_edge_sharded_forward(cfg, mesh))
    out = fwd(params, aa, pos, edges, mask, ef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_edge_sharded_train_step_matches_single_device(sparse_cfg):
    cfg = sparse_cfg
    tcfg = TrainConfig(lr=1e-3, batch_size=8)
    aa, pos, edges, mask, ef, y = _sparse_inputs(cfg)

    # single-device step through the standard path
    state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tx1, donate=False)
    batch = {"aa": aa, "window": pos, "y": y, "edges": edges, "mask": mask}
    new1, m1 = step1(state1, batch)

    # 2-D sharded step
    mesh = make_mesh(MeshConfig(data=4, model=2))
    state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step2 = make_edge_sharded_train_step(cfg, tx2, mesh)
    new2, m2 = step2(state2, aa, pos, edges, mask, ef, y)

    np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                               rtol=1e-5)
    leaves1 = jax.tree_util.tree_leaves(new1.params)
    leaves2 = jax.tree_util.tree_leaves(new2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_edge_sharded_forward_with_electrostatics(sparse_cfg):
    """The dh electrostatic node feature composes with edge-axis model
    parallelism (the potential is node-local, replicated per shard)."""
    cfg = dataclasses.replace(sparse_cfg, electrostatics="dh")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    aa, pos, edges, mask, ef, y = _sparse_inputs(cfg)
    ref = gkn_apply(
        params, cfg,
        GKNBatch(aa, pos, SparseGraph(edges, mask, ef), y),
    )
    mesh = make_mesh(MeshConfig(data=4, model=2))
    fwd = jax.jit(make_edge_sharded_forward(cfg, mesh))
    out = fwd(params, aa, pos, edges, mask, ef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_data_parallel_train_step_runs_sharded(sparse_cfg):
    cfg = dataclasses.replace(sparse_cfg, graph_mode="dense")
    tcfg = TrainConfig(lr=1e-3, batch_size=8)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step, put = make_sharded_train_step(cfg, tx, mesh)

    b, r, t = 8, cfg.num_residues, cfg.window_size
    pos = np.random.default_rng(0).normal(size=(b, t, r, 3)).astype(np.float32) * 4
    adj = np.asarray(contact_map(jnp.asarray(pos[:, 0]), 8.0))
    host_batch = {
        "aa": np.arange(r, dtype=np.int32) % 20,
        "window": pos,
        "y": pos[:, -1],
        "adj": adj,
    }
    dev_batch = put(host_batch)
    # the batch really is sharded over all 8 devices
    assert len(dev_batch["window"].sharding.device_set) == 8
    new_state, metrics = step(state, dev_batch)
    assert np.isfinite(float(metrics["rel_l2"]))
    assert int(new_state.step) == 1


def test_data_parallel_curriculum_matches_single_device(sparse_cfg):
    """The flagship recipe — K-step rollout curriculum — sharded over the
    8-device data axis must produce the same loss and updated params as the
    single-device step (the gradient psum is exact, not approximate)."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_sharded_curriculum_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step,
    )

    cfg = dataclasses.replace(sparse_cfg, graph_mode="dense",
                              predict_delta=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, rollout_steps=3,
                       grad_clip_norm=1.0, skip_nonfinite_updates=True)
    traj = synthetic_trajectory(num_frames=32, num_residues=cfg.num_residues,
                                seed=7)
    ds = WindowDataset(traj, window_size=cfg.window_size)
    batch = ds.get_batch(np.arange(8), rollout_horizon=3)

    state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_curriculum_train_step(cfg, tx1, rollout_steps=3)
    new1, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step2, put = make_sharded_curriculum_train_step(cfg, tx2, mesh,
                                                    rollout_steps=3)
    dev_batch = put(batch)
    assert len(dev_batch["y_seq"].sharding.device_set) == 8
    new2, m2 = step2(state2, dev_batch)

    np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_shardmapped_pallas_train_step_matches_single_device(sparse_cfg):
    """train_conv_impl="pallas" under data parallelism: the explicit
    shard_map path (per-device Pallas stack + psum grads) must match the
    single-device step."""
    import dataclasses

    cfg = dataclasses.replace(sparse_cfg, train_conv_impl="pallas")
    tcfg = TrainConfig(lr=1e-3, batch_size=8)
    aa, pos, edges, mask, ef, y = _sparse_inputs(cfg)
    batch = {"aa": aa, "window": pos, "y": y, "edges": edges, "mask": mask}

    state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tx1, donate=False)
    new1, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step2, put = make_sharded_train_step(cfg, tx2, mesh)
    new2, m2 = step2(state2, put(batch))

    np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_shardmapped_pallas_curriculum_matches_single_device(sparse_cfg):
    """Same for the flagship curriculum step."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_sharded_curriculum_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step,
    )

    cfg = dataclasses.replace(sparse_cfg, predict_delta=True,
                              train_conv_impl="pallas")
    tcfg = TrainConfig(lr=1e-3, batch_size=8, rollout_steps=2)
    traj = synthetic_trajectory(num_frames=32, num_residues=cfg.num_residues,
                                seed=7)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=cfg.max_edges)
    batch = ds.get_batch(np.arange(8), rollout_horizon=2)

    state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_curriculum_train_step(cfg, tx1, rollout_steps=2,
                                       coord_clip=100.0)
    new1, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step2, put = make_sharded_curriculum_train_step(
        cfg, tx2, mesh, rollout_steps=2, coord_clip=100.0)
    new2, m2 = step2(state2, put(batch))

    np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_shardmapped_pallas_grad_steps_curriculum_matches_single_device(
        sparse_cfg):
    """grad_steps (burn-in + truncated backprop) under BOTH data-parallel
    routes — the explicit shard_map Pallas path and the NamedSharding jit
    path — must match the single-device truncated step: the burn-in's
    stop_gradient boundary is per-example, so batch sharding cannot change
    the objective."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_sharded_curriculum_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step,
    )

    traj = synthetic_trajectory(num_frames=32,
                                num_residues=sparse_cfg.num_residues,
                                seed=7)
    for impl in ("pallas", "xla"):
        cfg = dataclasses.replace(sparse_cfg, predict_delta=True,
                                  train_conv_impl=impl)
        tcfg = TrainConfig(lr=1e-3, batch_size=8, rollout_steps=3)
        ds = WindowDataset(traj, window_size=cfg.window_size,
                           graph_mode="sparse", max_edges=cfg.max_edges)
        batch = ds.get_batch(np.arange(8), rollout_horizon=3)

        state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        step1 = make_curriculum_train_step(cfg, tx1, rollout_steps=3,
                                           coord_clip=100.0, grad_steps=1)
        new1, m1 = step1(state1, batch)

        mesh = make_mesh(MeshConfig(data=8, model=1))
        state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        step2, put = make_sharded_curriculum_train_step(
            cfg, tx2, mesh, rollout_steps=3, coord_clip=100.0, grad_steps=1)
        new2, m2 = step2(state2, put(batch))

        np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                        jax.tree_util.tree_leaves(new2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_shardmapped_pallas_delta_curriculum_matches_single_device(
        sparse_cfg):
    """loss_space="delta" under the explicit shard_map route: the pooled
    displacement floor must use GLOBAL batch statistics (pmean over the
    data axis), so sharded == single-device holds for the delta objective
    too — a per-shard mean would silently train a different loss."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_sharded_curriculum_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step,
    )

    cfg = dataclasses.replace(sparse_cfg, predict_delta=True,
                              train_conv_impl="pallas")
    tcfg = TrainConfig(lr=1e-3, batch_size=8, rollout_steps=2)
    traj = synthetic_trajectory(num_frames=32, num_residues=cfg.num_residues,
                                seed=7)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=cfg.max_edges)
    batch = ds.get_batch(np.arange(8), rollout_horizon=2)

    state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_curriculum_train_step(cfg, tx1, rollout_steps=2,
                                       coord_clip=100.0, loss_space="delta")
    new1, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step2, put = make_sharded_curriculum_train_step(
        cfg, tx2, mesh, rollout_steps=2, coord_clip=100.0,
        loss_space="delta")
    new2, m2 = step2(state2, put(batch))

    np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_rollout_matches_single_device(sparse_cfg):
    """Streams sharded over the 8-device data axis reproduce the
    single-device batched rollout (rollout is embarrassingly parallel over
    streams — sharding must not change the math; only float reduction
    order may differ between batch tilings, hence the tight tolerance)."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_sharded_rollout_fn,
    )
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    cfg = dataclasses.replace(sparse_cfg, predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    s, t, r = 8, cfg.window_size, cfg.num_residues
    aa = jnp.arange(r, dtype=jnp.int32) % 20
    w0 = jax.random.normal(jax.random.PRNGKey(3), (s, t, r, 3)) * 4.0

    mesh = make_mesh(MeshConfig(data=8, model=1))
    roll_sh = make_sharded_rollout_fn(cfg, mesh, num_steps=6)
    coords_sh, final_sh, diags = roll_sh(params, aa, w0)
    assert coords_sh.shape == (s, 6, r, 3)

    # Oracle: the batched rollout on one device — same vmapped program, no
    # sharding. Batch-8 and batch-1 tilings reduce matmuls in different
    # orders (~1e-6 float noise), so this is allclose, not array_equal.
    roll_b = make_rollout_fn(cfg, num_steps=6, batched=True)
    c1, f1, _ = roll_b(params, aa, w0)
    np.testing.assert_allclose(np.asarray(coords_sh), np.asarray(c1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(final_sh), np.asarray(f1),
                               rtol=1e-4, atol=1e-4)


def test_stream_chunked_rollout_matches_unchunked(sparse_cfg):
    """stream_chunk only reschedules work (chunks of C streams via lax.map);
    outputs must be identical to the all-at-once vmap."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    cfg = dataclasses.replace(sparse_cfg, predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    s, t, r = 8, cfg.window_size, cfg.num_residues
    aa = jnp.arange(r, dtype=jnp.int32) % 20
    w0 = jax.random.normal(jax.random.PRNGKey(4), (s, t, r, 3)) * 4.0

    full = make_rollout_fn(cfg, num_steps=5, batched=True)
    chunked = make_rollout_fn(cfg, num_steps=5, batched=True, stream_chunk=2)
    c_full, f_full, _ = full(params, aa, w0)
    c_chunk, f_chunk, _ = chunked(params, aa, w0)
    # batch-8 vs batch-2 tilings reduce in different orders: allclose.
    np.testing.assert_allclose(np.asarray(c_full), np.asarray(c_chunk),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_full), np.asarray(f_chunk),
                               rtol=1e-4, atol=1e-4)

    # sharded + chunked composes
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_sharded_rollout_fn,
    )

    mesh = make_mesh(MeshConfig(data=4, model=2))
    roll_sc = make_sharded_rollout_fn(cfg, mesh, num_steps=5, stream_chunk=1)
    c_sc, f_sc, _ = roll_sc(params, aa, w0)
    np.testing.assert_allclose(np.asarray(c_full), np.asarray(c_sc),
                               rtol=1e-4, atol=1e-4)


def test_graft_entry_and_dryrun():
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 28, 3)
    assert np.isfinite(np.asarray(out)).all()

    mod.dryrun_multichip(8)


def test_config4_multi_trajectory_data_parallel(tmp_path, sparse_cfg):
    """BASELINE config 4: directory-mode multi-trajectory data, batched
    windows sharded over the 8-device mesh, full train step."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        load_trajectory,
        write_synthetic_h5,
    )

    # two trajectories of the same protein, directory mode
    write_synthetic_h5(tmp_path / "t0.h5", num_frames=24, num_residues=12,
                       seed=1)
    write_synthetic_h5(tmp_path / "t1.h5", num_frames=16, num_residues=12,
                       seed=2)
    traj = load_trajectory(tmp_path)
    assert traj.num_frames == 40

    cfg = dataclasses.replace(sparse_cfg, graph_mode="dense")
    tcfg = TrainConfig(lr=1e-3, batch_size=16)
    ds = WindowDataset(traj, window_size=cfg.window_size)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step, put = make_sharded_train_step(cfg, tx, mesh)
    batch = put(ds.get_batch(np.arange(16)))
    assert len(batch["window"].sharding.device_set) == 8
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["rel_l2"]))


def test_edge_sharded_rollout_matches_single_device(sparse_cfg):
    """ONE stream's rollout with the edge axis sharded over the model
    axis: each device evaluates the kernel MLP on its edge slice, partial
    aggregates psum, the rebuild stays replicated — output must match the
    single-device scan."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_edge_sharded_rollout_fn,
    )
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    cfg = dataclasses.replace(sparse_cfg, predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj_pos = jax.random.normal(
        jax.random.PRNGKey(5), (cfg.window_size, cfg.num_residues, 3)
    ) * 4.0
    aa = jnp.arange(cfg.num_residues, dtype=jnp.int32) % 20

    ref, ref_final, _ = make_rollout_fn(cfg, num_steps=5)(params, aa,
                                                          traj_pos)

    mesh = make_mesh(MeshConfig(data=1, model=8))
    roll = make_edge_sharded_rollout_fn(cfg, mesh, num_steps=5)
    out, final_w, diags = roll(params, aa, traj_pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(final_w), np.asarray(ref_final),
                               rtol=1e-4, atol=1e-4)
    assert not bool(diags["edge_overflow"])


def test_edge_sharded_rollout_sharded_cell_rebuild():
    """Cell-list path with the PER-ATOM rebuild phase sharded over the
    model axis (each device rebuilds only its own atom slice, whose edge
    rows are exactly its edge shard) — must match the single-device
    cell-list rollout."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_edge_sharded_rollout_fn,
    )
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    n, d = 16, 16
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                      num_residues=n, graph_mode="sparse",
                      compute_dtype="float32", predict_delta=True,
                      neighbor_impl="cell_list", max_degree=d,
                      max_edges=n * d, cell_capacity=16)
    params = gkn_init(jax.random.PRNGKey(1), cfg)
    traj_pos = jax.random.normal(
        jax.random.PRNGKey(6), (cfg.window_size, n, 3)
    ) * 4.0
    aa = jnp.arange(n, dtype=jnp.int32) % 20

    ref, ref_final, _ = make_rollout_fn(cfg, num_steps=4)(params, aa,
                                                          traj_pos)
    mesh = make_mesh(MeshConfig(data=1, model=8))
    roll = make_edge_sharded_rollout_fn(cfg, mesh, num_steps=4)
    out, final_w, diags = roll(params, aa, traj_pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(final_w), np.asarray(ref_final),
                               rtol=1e-4, atol=1e-4)
    assert not bool(diags["edge_overflow"])


def test_edge_sharded_forward_predict_delta_matches_single_device(sparse_cfg):
    """predict_delta parity: the shared shard forward must apply the same
    residual head as gkn_apply (a dropped residual trained wrong gradients
    while every flagship preset sets predict_delta=True)."""
    cfg = dataclasses.replace(sparse_cfg, predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(2), cfg)
    aa, pos, edges, mask, ef, y = _sparse_inputs(cfg)
    ref = gkn_apply(
        params, cfg,
        GKNBatch(aa, pos, SparseGraph(edges, mask, ef), y),
    )
    mesh = make_mesh(MeshConfig(data=4, model=2))
    fwd = jax.jit(make_edge_sharded_forward(cfg, mesh))
    out = fwd(params, aa, pos, edges, mask, ef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    tcfg = TrainConfig(lr=1e-3, batch_size=8)
    state1, tx1, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tx1, donate=False)
    batch = {"aa": aa, "window": pos, "y": y, "edges": edges, "mask": mask}
    _, m1 = step1(state1, batch)
    state2, tx2, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step2 = make_edge_sharded_train_step(cfg, tx2, mesh)
    _, m2 = step2(state2, aa, pos, edges, mask, ef, y)
    np.testing.assert_allclose(float(m1["rel_l2"]), float(m2["rel_l2"]),
                               rtol=1e-5)


def test_make_mesh_rejects_impossible_model_axis():
    """An explicit model-parallel request that cannot be honored must not
    silently collapse to no model parallelism."""
    with pytest.raises(ValueError, match="model axis"):
        make_mesh(MeshConfig(data=2, model=3))


def test_rollout_arg_validation(sparse_cfg):
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )
    from molecular_dynamics_neural_operator_tpu.parallel.rollout_edge_sharded import (  # noqa: E501
        make_edge_sharded_rollout_fn,
    )

    with pytest.raises(ValueError, match="stream_chunk"):
        make_rollout_fn(sparse_cfg, 4, stream_chunk=2)
    with pytest.raises(ValueError, match="graph_frame"):
        params = gkn_init(jax.random.PRNGKey(0), sparse_cfg)
        aa = jnp.zeros((sparse_cfg.num_residues,), jnp.int32)
        w0 = jnp.zeros((sparse_cfg.window_size, sparse_cfg.num_residues, 3))
        make_rollout_fn(sparse_cfg, 2, graph_frame="LAST")(params, aa, w0)
    dense = dataclasses.replace(sparse_cfg, graph_mode="dense")
    mesh = make_mesh(MeshConfig(data=1, model=8))
    with pytest.raises(ValueError, match="sparse"):
        make_edge_sharded_rollout_fn(dense, mesh, num_steps=2)
