"""Multi-step rollout curriculum (train/curriculum.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig, TrainConfig
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset,
    batch_iterator,
    synthetic_trajectory,
)
from molecular_dynamics_neural_operator_tpu.train import (
    create_train_state,
    make_train_step,
)
from molecular_dynamics_neural_operator_tpu.train.curriculum import (
    make_curriculum_train_step,
)


def _setup(k_frames=80):
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, compute_dtype="float32",
                      predict_delta=True)
    tcfg = TrainConfig(lr=1e-3, weight_decay=0.0, batch_size=8)
    traj = synthetic_trajectory(num_frames=k_frames, num_residues=10, seed=6)
    ds = WindowDataset(traj, window_size=4)
    return cfg, tcfg, traj, ds


def test_k1_matches_teacher_forced_gradient():
    """K=1 curriculum loss == the standard teacher-forced loss (same
    stored-graph semantics), so parameter updates coincide."""
    cfg, tcfg, traj, ds = _setup()
    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    batch = ds.get_batch(np.arange(8), rollout_horizon=1)
    # K=1: y_seq[:, 0] must equal the horizon-1 target y
    np.testing.assert_allclose(batch["y_seq"][:, 0], batch["y"])

    step_tf = make_train_step(cfg, tx, donate=False)
    step_cu = make_curriculum_train_step(cfg, tx, rollout_steps=1)
    s_tf, m_tf = step_tf(state0, {k: v for k, v in batch.items()
                                  if k != "y_seq"})
    s_cu, m_cu = step_cu(state0, batch)
    # curriculum normalizes weights (sum=1), K=1 weight is 1 -> same loss
    np.testing.assert_allclose(float(m_tf["rel_l2"]), float(m_cu["rel_l2"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_tf.params),
                    jax.tree_util.tree_leaves(s_cu.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_delta_loss_space_oracle():
    """loss_space="delta" normalizes each step's error by the TRUE per-step
    displacement, floored at 10% of the batch-mean displacement, under
    stop_gradient. K=1 oracle: loss == sum_b ||pred - y|| / floor(||y -
    last||). (On slowly varying data the absolute form's learning signal is
    ~1e-4 of its baseline term, so training parks at copy-last-frame; delta
    space makes the motion the unit-scale objective.)"""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.models import gkn_apply
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    cfg, tcfg, traj, ds = _setup()
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = {k: jnp.asarray(v) for k, v in
             ds.get_batch(np.arange(8), rollout_horizon=1).items()}
    gbatch = featurize_batch(cfg, batch, "first")

    loss_d, _ = curriculum_loss_batched(
        state.params, cfg, gbatch, batch["y_seq"], loss_space="delta")
    pred = gkn_apply(state.params, cfg, gbatch)
    y = batch["y_seq"][:, 0]
    last = gbatch.window[:, -1]
    num = jnp.sqrt(jnp.sum((pred - y) ** 2, axis=(1, 2)))
    den = jnp.sqrt(jnp.sum((y - last) ** 2, axis=(1, 2)))
    den = jnp.maximum(jnp.maximum(den, 0.1 * jnp.mean(den)), 1e-6)
    np.testing.assert_allclose(float(loss_d), float(jnp.sum(num / den)),
                               rtol=1e-5)

    # the normalizer carries no gradient: grads through the delta loss
    # match grads of the same loss with the denominator held constant
    def loss_fixed_den(params):
        p = gkn_apply(params, cfg, gbatch)
        n = jnp.sqrt(jnp.sum((p - y) ** 2, axis=(1, 2)))
        return jnp.sum(n / den)

    def loss_delta(params):
        val, _ = curriculum_loss_batched(
            params, cfg, gbatch, batch["y_seq"], loss_space="delta")
        return val

    g1 = jax.grad(loss_delta)(state.params)
    g2 = jax.grad(loss_fixed_den)(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    # differs from absolute space, and K>1 delta training is finite
    loss_a, _ = curriculum_loss_batched(
        state.params, cfg, gbatch, batch["y_seq"], loss_space="absolute")
    assert not np.allclose(float(loss_d), float(loss_a))

    step = make_curriculum_train_step(cfg, tx, rollout_steps=3,
                                      coord_clip=1000.0, loss_space="delta")
    b3 = {k: jnp.asarray(v) for k, v in
          ds.get_batch(np.arange(8), rollout_horizon=3).items()}
    state2, m = step(state, b3)
    assert np.isfinite(float(m["rel_l2"]))
    # invalid space rejected
    try:
        curriculum_loss_batched(state.params, cfg, gbatch, batch["y_seq"],
                                loss_space="bogus")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_k3_training_reduces_multistep_loss():
    cfg, tcfg, traj, ds = _setup()
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_curriculum_train_step(cfg, tx, rollout_steps=3)
    losses = []
    for epoch in range(6):
        for batch in batch_iterator(ds, np.arange(len(ds)), 8, seed=0,
                                    epoch=epoch, rollout_horizon=3):
            state, m = step(state, batch)
        losses.append(float(m["rel_l2"]))
    assert losses[-1] < losses[0], losses


def test_horizon_bounds_respected():
    cfg, tcfg, traj, ds = _setup(k_frames=20)
    # iterator drops indices that would overrun the trajectory
    batches = list(batch_iterator(ds, np.arange(len(ds)), 4, shuffle=False,
                                  drop_last=False, rollout_horizon=5))
    max_idx = traj.num_frames - ds.window_size - 5
    total = sum(b["window"].shape[0] for b in batches)
    assert total == max_idx + 1
    import pytest

    with pytest.raises(ValueError, match="rollout_horizon"):
        ds.get_batch([len(ds) - 1], rollout_horizon=5)


def test_batched_curriculum_matches_per_example():
    """curriculum_loss_batched == vmapped curriculum_loss_single (the
    round-1 formulation) on the same batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
        curriculum_loss_single,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=12, max_edges=128, graph_mode="sparse",
                      compute_dtype="float32", predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=24, num_residues=12, seed=3)
    ds = WindowDataset(traj, window_size=4, graph_mode="sparse",
                       max_edges=128)
    batch = {k: jnp.asarray(v) for k, v in
             ds.get_batch(np.arange(5), rollout_horizon=3).items()}
    gbatch = featurize_batch(cfg, batch)

    loss_b, mse_b = jax.jit(
        lambda p: curriculum_loss_batched(p, cfg, gbatch, batch["y_seq"],
                                          coord_clip=50.0)
    )(params)

    fn = lambda w, g, y: curriculum_loss_single(
        params, cfg, gbatch.aa, w, g, y, 8.0, None, 50.0)
    losses, mses = jax.jit(
        lambda: jax.vmap(fn)(gbatch.window, gbatch.graph, batch["y_seq"])
    )()
    np.testing.assert_allclose(float(loss_b), float(jnp.sum(losses)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mse_b), float(jnp.mean(mses)),
                               rtol=1e-5)


def test_batched_curriculum_blocked_dataset_layout():
    """A blocked-layout dataset + scatter_mode='blocked' curriculum must
    equal the CSR + auto curriculum: step 1 consumes the stored (blocked)
    graph under cfg.scatter_mode, while the free steps' device rebuilds
    are CSR-packed and must use the explicit rebuilt-graph hint (the
    config's 'blocked' leaking onto them silently mis-aggregated)."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    r = 10
    cfg_csr = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                          num_residues=r, max_edges=13 * r,
                          graph_mode="sparse", compute_dtype="float32",
                          predict_delta=True)
    cfg_blk = dataclasses.replace(cfg_csr, scatter_mode="blocked")
    params = gkn_init(jax.random.PRNGKey(0), cfg_csr)
    traj = synthetic_trajectory(num_frames=24, num_residues=r, seed=6)
    ds_csr = WindowDataset(traj, window_size=4, graph_mode="sparse",
                           max_edges=13 * r)
    ds_blk = WindowDataset(traj, window_size=4, graph_mode="sparse",
                           max_edges=13 * r, edge_layout="blocked")
    losses = {}
    for name, cfg, ds in (("csr", cfg_csr, ds_csr),
                          ("blk", cfg_blk, ds_blk)):
        batch = {k: jnp.asarray(v) for k, v in
                 ds.get_batch(np.arange(4), rollout_horizon=3).items()}
        gbatch = featurize_batch(cfg, batch)
        loss, mse = jax.jit(
            lambda p, g=gbatch, c=cfg, y=batch["y_seq"]:
            curriculum_loss_batched(p, c, g, y, coord_clip=50.0)
        )(params)
        losses[name] = (float(loss), float(mse))
    np.testing.assert_allclose(losses["blk"][0], losses["csr"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(losses["blk"][1], losses["csr"][1],
                               rtol=1e-5)


def test_grad_steps_truncated_backprop():
    """grad_steps=j supervises only the LAST j rollout steps (burn-in +
    truncated backprop): j=K reproduces the default bitwise; j=1's loss is
    the last step's relative L2 on the SAME rollout (burn-in forward math
    unchanged), its grads equal a hand-rolled reference that detaches the
    window at the burn-in boundary, and the mse metric still averages all
    K steps."""
    from molecular_dynamics_neural_operator_tpu.models import (
        GKNBatch,
        gkn_apply,
    )
    from molecular_dynamics_neural_operator_tpu.rollout.scan import (
        _build_graph,
        rebuilt_scatter_hint,
    )
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    cfg, tcfg, traj, ds = _setup()
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    # (a) j=K == default, loss and grads
    b3 = {k: jnp.asarray(v) for k, v in
          ds.get_batch(np.arange(6), rollout_horizon=3).items()}
    g3 = featurize_batch(cfg, b3, "first")

    def loss3(p, gs):
        return curriculum_loss_batched(p, cfg, g3, b3["y_seq"],
                                       grad_steps=gs)[0]

    v_full, grads_full = jax.value_and_grad(lambda p: loss3(p, None))(
        state.params)
    v_jk, grads_jk = jax.value_and_grad(lambda p: loss3(p, 3))(state.params)
    np.testing.assert_allclose(float(v_full), float(v_jk), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(grads_full),
                    jax.tree_util.tree_leaves(grads_jk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) K=2, j=1 vs a hand-rolled stop-gradient reference
    b2 = {k: jnp.asarray(v) for k, v in
          ds.get_batch(np.arange(6), rollout_horizon=2).items()}
    g2 = featurize_batch(cfg, b2, "first")
    y1 = b2["y_seq"][:, 1]

    def loss_j1(p):
        return curriculum_loss_batched(p, cfg, g2, b2["y_seq"],
                                       grad_steps=1)[0]

    def loss_manual(p):
        out = gkn_apply(p, cfg, g2)  # burn-in: teacher step, no loss
        window = jnp.concatenate([g2.window[:, 1:], out[:, None]], axis=1)
        window = jax.lax.stop_gradient(window)
        graph, _ = jax.vmap(
            lambda f: _build_graph(cfg, f, 8.0))(window[:, -1])
        out2 = gkn_apply(
            p, cfg, GKNBatch(aa=g2.aa, window=window, graph=graph, y=y1),
            scatter_hint=rebuilt_scatter_hint(cfg, g2.aa.shape[0]))
        num = jnp.sqrt(jnp.sum((out2 - y1) ** 2, axis=(1, 2)))
        den = jnp.sqrt(jnp.sum(y1 ** 2, axis=(1, 2)))
        return jnp.sum(num / den)

    v1, grads1 = jax.value_and_grad(loss_j1)(state.params)
    vm, gradsm = jax.value_and_grad(loss_manual)(state.params)
    np.testing.assert_allclose(float(v1), float(vm), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads1),
                    jax.tree_util.tree_leaves(gradsm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)

    # truncation actually changes the gradient vs full BPTT with the same
    # per-step weighting (weight 0 on the teacher step, 1 on the last)
    def loss_weighted_full(p):
        return curriculum_loss_batched(p, cfg, g2, b2["y_seq"],
                                       step_weights=[0.0, 1.0])[0]

    vw, gradsw = jax.value_and_grad(loss_weighted_full)(state.params)
    np.testing.assert_allclose(float(v1), float(vw), rtol=1e-6)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree_util.tree_leaves(grads1),
                             jax.tree_util.tree_leaves(gradsw))]
    assert max(diffs) > 0, "truncated grads unexpectedly equal full BPTT"

    # mse metric covers ALL K steps regardless of supervision span
    _, mse_j1 = curriculum_loss_batched(state.params, cfg, g2, b2["y_seq"],
                                        grad_steps=1)
    _, mse_full = curriculum_loss_batched(state.params, cfg, g2,
                                          b2["y_seq"])
    np.testing.assert_allclose(float(mse_j1), float(mse_full), rtol=1e-6)

    # (c) validation + end-to-end step
    import pytest

    with pytest.raises(ValueError, match="grad_steps"):
        curriculum_loss_batched(state.params, cfg, g2, b2["y_seq"],
                                grad_steps=0)
    with pytest.raises(ValueError, match="step_weights"):
        curriculum_loss_batched(state.params, cfg, g2, b2["y_seq"],
                                grad_steps=1, step_weights=[0.5, 0.5])
    with pytest.raises(ValueError, match="grad_steps"):
        make_curriculum_train_step(cfg, tx, rollout_steps=2, grad_steps=3)
    step = make_curriculum_train_step(cfg, tx, rollout_steps=3,
                                      grad_steps=1, coord_clip=1000.0)
    state2, m = step(state, b3)
    assert np.isfinite(float(m["rel_l2"]))


def test_recipe_k_switch_engages_mid_epoch(capsys):
    """The warmup -> K switch must happen at the step boundary even when
    the boundary falls inside an epoch (a one-epoch full-scale run used
    to train 100% teacher-forced while reporting a K-curriculum run)."""
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import (
        ModelConfig,
        TrainConfig,
    )
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.train.recipe import (
        train_curriculum_recipe,
    )

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, max_edges=128, graph_mode="sparse",
                      compute_dtype="float32", predict_delta=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=4)
    traj = synthetic_trajectory(num_frames=64, num_residues=10, seed=0)
    ds = WindowDataset(traj, window_size=4, graph_mode="sparse",
                       max_edges=128)
    # 12 train windows -> one epoch is 3 batches of 4; warmup=2 of 6 steps
    # crosses the K boundary mid-epoch.
    train_curriculum_recipe(cfg, tcfg, ds, np.arange(12), steps=6, k=3,
                            warmup_frac=0.34, min_warmup=2, log_every=1)
    lines = [l for l in capsys.readouterr().out.splitlines() if "step " in l]
    ks = [l.split("(K=")[1].split(",")[0] for l in lines]
    assert ks[:2] == ["1", "1"] and set(ks[2:]) == {"3"}, ks

    # runs shorter than log_every still report the final step's loss
    # (None crashed every caller that formats the returned loss)
    _, _, last_loss = train_curriculum_recipe(
        cfg, tcfg, ds, np.arange(12), steps=3, k=1, warmup_frac=1.0,
        min_warmup=1, log_every=100)
    assert last_loss is not None and np.isfinite(last_loss)

    # a run whose logged loss stays non-finite must ABORT, not burn the
    # remaining step budget doing nothing (params frozen by
    # skip_nonfinite_updates cannot recover once every unroll overflows)
    import dataclasses

    import pytest

    tcfg_div = dataclasses.replace(tcfg, lr=1e20,
                                   skip_nonfinite_updates=False,
                                   grad_clip_norm=0.0)
    with pytest.raises(RuntimeError, match="diverged"):
        train_curriculum_recipe(
            cfg, tcfg_div, ds, np.arange(12), steps=30, k=1,
            warmup_frac=1.0, min_warmup=1, log_every=2,
            divergence_limit=3)

    # on_divergence="backoff" restores the last-good params and halves
    # the lr before giving up: with an lr so large even the halved rates
    # diverge, the recovery messages appear max_backoffs times and THEN
    # the abort fires
    with pytest.raises(RuntimeError, match="diverged"):
        train_curriculum_recipe(
            cfg, tcfg_div, ds, np.arange(12), steps=200, k=1,
            warmup_frac=1.0, min_warmup=1, log_every=2,
            divergence_limit=3, on_divergence="backoff", max_backoffs=2)
    msgs = [l for l in capsys.readouterr().out.splitlines()
            if "DIVERGED" in l]
    assert len(msgs) == 2 and "backoff 2/2" in msgs[-1]


def test_burnin_dtype_bf16_prefix():
    """burnin_dtype runs the stop-gradient burn-in prefix with a bf16
    model body: ignored when there is no burn-in (bitwise == baseline),
    and with K=2/j=1 it matches a hand-rolled reference whose burn-in
    forward uses a bf16 cfg while the supervised step stays f32."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.models import (
        GKNBatch,
        gkn_apply,
    )
    from molecular_dynamics_neural_operator_tpu.rollout.scan import (
        _build_graph,
        rebuilt_scatter_hint,
    )
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    cfg, tcfg, traj, ds = _setup()
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    b2 = {k: jnp.asarray(v) for k, v in
          ds.get_batch(np.arange(6), rollout_horizon=2).items()}
    g2 = featurize_batch(cfg, b2, "first")

    # (a) no burn-in (full supervision): burnin_dtype must be a no-op
    v0, grads0 = jax.value_and_grad(
        lambda p: curriculum_loss_batched(p, cfg, g2, b2["y_seq"])[0]
    )(state.params)
    v0b, grads0b = jax.value_and_grad(
        lambda p: curriculum_loss_batched(p, cfg, g2, b2["y_seq"],
                                          burnin_dtype="bfloat16")[0]
    )(state.params)
    np.testing.assert_array_equal(float(v0), float(v0b))
    for a, b in zip(jax.tree_util.tree_leaves(grads0),
                    jax.tree_util.tree_leaves(grads0b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) K=2, j=1, bf16 burn-in == manual reference with a bf16 cfg on
    # the burn-in forward only
    cfg_bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    y1 = b2["y_seq"][:, 1]

    def loss_b(p):
        return curriculum_loss_batched(p, cfg, g2, b2["y_seq"],
                                       grad_steps=1,
                                       burnin_dtype="bfloat16")[0]

    def loss_manual(p):
        out = gkn_apply(p, cfg_bf, g2)  # burn-in at bf16
        window = jnp.concatenate([g2.window[:, 1:], out[:, None]], axis=1)
        window = jax.lax.stop_gradient(window)
        graph, _ = jax.vmap(
            lambda f: _build_graph(cfg, f, 8.0))(window[:, -1])
        out2 = gkn_apply(
            p, cfg, GKNBatch(aa=g2.aa, window=window, graph=graph, y=y1),
            scatter_hint=rebuilt_scatter_hint(cfg, g2.aa.shape[0]))
        num = jnp.sqrt(jnp.sum((out2 - y1) ** 2, axis=(1, 2)))
        den = jnp.sqrt(jnp.sum(y1 ** 2, axis=(1, 2)))
        return jnp.sum(num / den)

    vb, gradsb = jax.value_and_grad(loss_b)(state.params)
    vm, gradsm = jax.value_and_grad(loss_manual)(state.params)
    np.testing.assert_allclose(float(vb), float(vm), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gradsb),
                    jax.tree_util.tree_leaves(gradsm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)

    # the bf16 burn-in genuinely changes the exposure (vs f32 burn-in)
    v1 = curriculum_loss_batched(state.params, cfg, g2, b2["y_seq"],
                                 grad_steps=1)[0]
    assert float(vb) != float(v1)

    # (c) end-to-end step runs finite
    step = make_curriculum_train_step(cfg, tx, rollout_steps=3,
                                      grad_steps=1, coord_clip=1000.0,
                                      burnin_dtype="bfloat16")
    b3 = {k: jnp.asarray(v) for k, v in
          ds.get_batch(np.arange(6), rollout_horizon=3).items()}
    state2, m = step(state, b3)
    assert np.isfinite(float(m["rel_l2"]))


def test_unroll_scans_matches_scan():
    """unroll_scans=True (Python loops — the config-5 compile path) is
    equal to the lax.scan formulation — loss and every gradient leaf to
    1e-6 relative, for full BPTT and grad_steps in {1, 2} (burn-in +
    truncation). Not bitwise by design: lax.scan compiles its body as
    one fused program, so XLA's fusion reassociates float reductions in
    last ulps relative to the unrolled op sequence (and the scan
    transpose accumulates cotangents in reverse order)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, graph_mode="sparse", max_edges=128,
                      compute_dtype="float32", predict_delta=True)
    traj = synthetic_trajectory(num_frames=30, num_residues=10, seed=3)
    ds = WindowDataset(traj, window_size=4, graph_mode="sparse",
                       max_edges=128)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    b = {k: jnp.asarray(v) for k, v in
         ds.get_batch(np.arange(5), rollout_horizon=4).items()}
    gb = featurize_batch(cfg, b, "first")

    for gs in (None, 1, 2):
        def loss(p, unroll):
            return curriculum_loss_batched(
                p, cfg, gb, b["y_seq"], coord_clip=1000.0,
                grad_steps=gs, unroll_scans=unroll)[0]

        (v_s, g_s) = jax.value_and_grad(lambda p: loss(p, False))(params)
        (v_u, g_u) = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(v_s), float(v_u), rtol=1e-6)
        for a, bb in zip(jax.tree_util.tree_leaves(g_s),
                         jax.tree_util.tree_leaves(g_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-5, atol=1e-8)


def test_curriculum_cell_list_rebuild_matches_brute_force():
    """The free steps' device rebuild under neighbor_impl="cell_list"
    (block edge layout, the config-5 training path) must produce the same
    loss as the brute-force dense_rank rebuild (CSR layout) — the graphs
    differ only in edge ORDER and padding slots, and mean aggregation is
    order-insensitive. Covers the composition the 10k-atom campaign runs:
    blocked dataset graphs + cell-list free-step rebuilds + blocked
    scatter + grad_steps truncation + unrolled scans. (The brute-force
    rebuild at 10k nodes compiles 1e8-entry intermediates that crashed
    the TPU worker — cell_list is the only viable rebuild at scale, so
    its equivalence needs pinning at small scale.)"""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    r, deg = 10, 13
    cfg_bf = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                         num_residues=r, max_edges=deg * r,
                         graph_mode="sparse", compute_dtype="float32",
                         predict_delta=True)
    cfg_cl = dataclasses.replace(
        cfg_bf, neighbor_impl="cell_list", max_degree=deg,
        scatter_mode="blocked", cell_capacity=16, num_cells=512)
    params = gkn_init(jax.random.PRNGKey(0), cfg_bf)
    traj = synthetic_trajectory(num_frames=24, num_residues=r, seed=6)
    ds_csr = WindowDataset(traj, window_size=4, graph_mode="sparse",
                           max_edges=deg * r)
    ds_blk = WindowDataset(traj, window_size=4, graph_mode="sparse",
                           max_edges=deg * r, edge_layout="blocked")
    losses = {}
    for name, cfg, ds, kw in (
        ("bf", cfg_bf, ds_csr, {}),
        ("cl", cfg_cl, ds_blk, {}),
        ("cl_trunc", cfg_cl, ds_blk,
         {"grad_steps": 1, "unroll_scans": True}),
    ):
        batch = {k: jnp.asarray(v) for k, v in
                 ds.get_batch(np.arange(4), rollout_horizon=3).items()}
        gbatch = featurize_batch(cfg, batch)
        loss, (mse, ovf) = jax.jit(
            lambda p, g=gbatch, c=cfg, y=batch["y_seq"], kw=kw:
            curriculum_loss_batched(p, c, g, y, coord_clip=50.0,
                                    return_overflow=True, **kw)
        )(params)
        assert not bool(ovf), f"{name}: unexpected edge overflow"
        losses[name] = (float(loss), float(mse))
    np.testing.assert_allclose(losses["cl"][0], losses["bf"][0], rtol=1e-5)
    np.testing.assert_allclose(losses["cl"][1], losses["bf"][1], rtol=1e-5)
    # truncation changes WHICH steps carry loss weight, not the rollout
    # itself — the mse metric (all K steps, forward-only) must agree.
    np.testing.assert_allclose(losses["cl_trunc"][1], losses["bf"][1],
                               rtol=1e-5)


def test_curriculum_with_extrapolate_prior_trains():
    """K-step curriculum through the constant-velocity residual prior:
    free steps slide windows built from prior-corrected predictions;
    training stays finite and reduces the multi-step loss."""
    import dataclasses

    cfg, tcfg, traj, ds = _setup()
    cfg = dataclasses.replace(cfg, predict_delta=True,
                              predict_prior="extrapolate")
    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_curriculum_train_step(cfg, tx, rollout_steps=3,
                                      coord_clip=1000.0)
    losses = []
    for epoch in range(6):
        for batch in batch_iterator(ds, np.arange(len(ds)), 8, seed=0,
                                    epoch=epoch, rollout_horizon=3):
            state, m = step(state, batch)
        losses.append(float(m["rel_l2"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_graph_frame_rebuild_matches_first_on_static_trajectory():
    """graph_frame='rebuild' rebuilds the TEACHER step's graph from the
    window's LAST frame on device. On a static trajectory (every frame
    identical) the stored window-start graph and the last-frame rebuild
    describe the same geometry, so losses and parameter updates must
    coincide — pinning that the rebuild path changes the graph SOURCE
    and nothing else. (On moving data the two genuinely differ: the
    reference trains on the stale window-START graph, dataset.py:189,197,
    but rolls out on last-frame rebuilds, graph_kernel.py:363.)"""
    from molecular_dynamics_neural_operator_tpu.data.h5 import TrajectoryData
    from molecular_dynamics_neural_operator_tpu.data.synthetic import (
        _contact_edges,
        synthetic_trajectory,
    )

    cfg, tcfg, _, _ = _setup()
    base = synthetic_trajectory(num_frames=2, num_residues=10, seed=6)
    pos = np.repeat(base.positions[:1], 30, axis=0)  # static
    flat, _ = _contact_edges(pos, 8.0)
    traj = TrajectoryData(
        positions=pos,
        edge_indices=[e.reshape(2, -1) for e in flat],
        aminoacids=base.aminoacids,
        rmsd=np.zeros((30,), np.float32),
    )
    ds = WindowDataset(traj, window_size=4)
    batch = ds.get_batch(np.arange(8), rollout_horizon=2)

    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step_first = make_curriculum_train_step(cfg, tx, rollout_steps=2,
                                            graph_frame="first")
    step_rebuild = make_curriculum_train_step(cfg, tx, rollout_steps=2,
                                              graph_frame="rebuild")
    s_f, m_f = step_first(state0, batch)
    s_r, m_r = step_rebuild(state0, batch)
    np.testing.assert_allclose(float(m_f["rel_l2"]), float(m_r["rel_l2"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.params),
                    jax.tree_util.tree_leaves(s_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_graph_frame_rebuild_differs_on_moving_trajectory():
    """On data with real per-frame motion the teacher-step graphs differ
    (window start vs last frame), so the two modes must produce different
    gradients — the Langevin family's learnability depends on this."""
    from molecular_dynamics_neural_operator_tpu.data import (
        langevin_trajectory,
    )

    cfg, tcfg, _, _ = _setup()
    traj = langevin_trajectory(num_frames=40, num_residues=10, seed=3,
                               burn_in=50)
    ds = WindowDataset(traj, window_size=4)
    batch = ds.get_batch(np.arange(8), rollout_horizon=1)
    state0, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step_first = make_curriculum_train_step(cfg, tx, rollout_steps=1,
                                            graph_frame="first")
    step_rebuild = make_curriculum_train_step(cfg, tx, rollout_steps=1,
                                              graph_frame="rebuild")
    s_f, _ = step_first(state0, batch)
    s_r, _ = step_rebuild(state0, batch)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(s_f.params),
                             jax.tree_util.tree_leaves(s_r.params))]
    assert max(diffs) > 1e-6, diffs


def test_graph_frame_validation():
    import pytest

    cfg, tcfg, _, _ = _setup()
    _, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    with pytest.raises(ValueError, match="graph_frame"):
        make_curriculum_train_step(cfg, tx, rollout_steps=1,
                                   graph_frame="lst")
