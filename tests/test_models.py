"""GKN model invariants: shapes, dtypes, dense/sparse equivalence, latent
capture, kernel tying (``graph_kernel.py:245-309`` capability parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
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
    gkn_apply_single,
    gkn_init,
    lp_abs,
    lp_rel,
)


def _dense_batch(cfg, b=3, seed=0):
    r, t = cfg.num_residues, cfg.window_size
    key = jax.random.PRNGKey(seed)
    pos = jax.random.normal(key, (b, t, r, 3)) * 4
    aa = jnp.arange(r, dtype=jnp.int32) % 20
    adj = contact_map(pos[:, 0], 8.0)
    graph = DenseGraph(adj=adj, edge_feats=dense_edge_features(pos[:, 0]))
    y = jax.random.normal(jax.random.fold_in(key, 1), (b, r, 3))
    return GKNBatch(aa=aa, window=pos, graph=graph, y=y)


def test_forward_shapes_and_finite(tiny_model_cfg):
    cfg = tiny_model_cfg
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    batch = _dense_batch(cfg)
    out = gkn_apply(params, cfg, batch)
    assert out.shape == (3, cfg.num_residues, cfg.out_width)
    assert np.isfinite(np.asarray(out)).all()


def test_return_latent(tiny_model_cfg):
    cfg = tiny_model_cfg
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    batch = _dense_batch(cfg)
    out, latent = gkn_apply(params, cfg, batch, return_latent=True)
    assert latent.shape == (3, cfg.num_residues, cfg.width)
    # latent is the pre-head activation: fc2(latent) == out
    ref = latent @ params["fc2"]["w"] + params["fc2"]["b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_dense_sparse_forward_equivalence(tiny_model_cfg):
    cfg = tiny_model_cfg
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    batch = _dense_batch(cfg, b=2)
    out_dense = gkn_apply(params, cfg, batch)

    b, r = 2, cfg.num_residues
    edges_l, masks_l = [], []
    for i in range(b):
        e, m = dense_to_padded_edges(np.asarray(batch.graph.adj[i]), cfg.max_edges)
        edges_l.append(e)
        masks_l.append(m)
    edges = jnp.asarray(np.stack(edges_l))
    mask = jnp.asarray(np.stack(masks_l))
    ef = jax.vmap(edge_features_from_edges)(batch.window[:, 0], edges)
    sparse_batch = GKNBatch(
        aa=batch.aa,
        window=batch.window,
        graph=SparseGraph(edges=edges, mask=mask, edge_feats=ef),
        y=batch.y,
    )
    out_sparse = gkn_apply(params, cfg, sparse_batch)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_sparse), rtol=1e-4, atol=1e-4
    )


def test_edge_kernel_tying(tiny_model_cfg):
    import dataclasses

    cfg_tied = tiny_model_cfg
    cfg_untied = dataclasses.replace(cfg_tied, tie_edge_kernel=False)
    p_tied = gkn_init(jax.random.PRNGKey(0), cfg_tied)
    p_untied = gkn_init(jax.random.PRNGKey(0), cfg_untied)
    assert "edge_kernel2" not in p_tied
    assert "edge_kernel2" in p_untied
    batch = _dense_batch(cfg_tied)
    out_t = gkn_apply(p_tied, cfg_tied, batch)
    out_u = gkn_apply(p_untied, cfg_untied, batch)
    # untied second stack has different weights => different output
    assert np.abs(np.asarray(out_t) - np.asarray(out_u)).max() > 1e-6


def test_lp_loss_matches_torch_reference():
    """lp_rel/lp_abs vs the literal LpLoss math (graph_kernel.py:75-122)."""
    torch = __import__("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 36)).astype(np.float32)
    y = rng.normal(size=(8, 36)).astype(np.float32)

    tx, ty = torch.tensor(x), torch.tensor(y)
    diff = torch.norm(tx.view(8, -1) - ty.view(8, -1), 2, 1)
    ynorm = torch.norm(ty.view(8, -1), 2, 1)
    ref_rel_mean = float(torch.mean(diff / ynorm))
    ref_rel_sum = float(torch.sum(diff / ynorm))
    h = 1.0 / (x.shape[1] - 1.0)
    ref_abs = float(torch.mean(h ** (2 / 2) * diff))

    np.testing.assert_allclose(
        float(lp_rel(jnp.asarray(x), jnp.asarray(y))), ref_rel_mean, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(lp_rel(jnp.asarray(x), jnp.asarray(y), size_average=False)),
        ref_rel_sum,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(lp_abs(jnp.asarray(x), jnp.asarray(y))), ref_abs, rtol=1e-5
    )


def test_single_and_batched_agree(tiny_model_cfg):
    cfg = tiny_model_cfg
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    batch = _dense_batch(cfg, b=2)
    out = gkn_apply(params, cfg, batch)
    one = gkn_apply_single(
        params, cfg, batch.aa, batch.window[0],
        DenseGraph(batch.graph.adj[0], batch.graph.edge_feats[0]),
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(one), rtol=1e-5, atol=1e-6)


def test_window_diff_encoding(tiny_model_cfg):
    """window_diff encodes [last frame ; scaled diffs] with the SAME
    parameter tree (no LSTM shape change), changes the forward, and is
    exactly equivalent to feeding the transformed window to the default
    encoder. On slow trajectories raw frames hide per-step motion ~1e-4
    below the coordinate scale (copy-last-frame parking, see configs)."""
    import dataclasses

    cfg = tiny_model_cfg
    cfg_d = dataclasses.replace(cfg, window_diff=True, window_diff_scale=50.0)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    params_d = gkn_init(jax.random.PRNGKey(0), cfg_d)
    # identical parameter trees: checkpoints are interchangeable
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params_d)

    batch = _dense_batch(cfg)
    out = gkn_apply(params, cfg, batch)
    out_d = gkn_apply(params_d, cfg_d, batch)
    assert out_d.shape == out.shape
    assert np.isfinite(np.asarray(out_d)).all()
    assert not np.allclose(np.asarray(out_d), np.asarray(out))

    # equivalence oracle: window_diff == default encoder on the
    # transformed window (the rest of the model reads window[-1] only,
    # which the transform preserves in slot -1... anchor goes FIRST, so
    # build the transformed window explicitly and compare single-example
    # forwards with the graph fixed)
    w = batch.window[0]
    diffs = (w[1:] - w[:-1]) * cfg_d.window_diff_scale
    w_tr = jnp.concatenate([w[-1:], diffs], axis=0)
    g0 = jax.tree_util.tree_map(lambda a: a[0], batch.graph)
    a = gkn_apply_single(params_d, cfg_d, batch.aa, w, g0)
    b = gkn_apply_single(params, cfg, batch.aa, w_tr, g0)
    if cfg.predict_delta:
        b = b - w_tr[-1] + w[-1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_blocked_scatter_training_forward_matches_segment():
    """Blocked-layout training batches (WindowDataset edge_layout=
    'blocked' + ModelConfig scatter_mode='blocked') produce the same
    forward as the CSR/segment path — the large-R scatter-free training
    aggregation is math-equal to segment_sum."""
    import dataclasses

    import jax

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models import (
        gkn_apply,
        gkn_init,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    traj = synthetic_trajectory(num_frames=16, num_residues=12, seed=3)
    e_max = 16 * 12
    cfg = ModelConfig(width=8, ker_width=16, depth=2, window_size=4,
                      num_residues=12, graph_mode="sparse",
                      max_edges=e_max, compute_dtype="float32",
                      scatter_mode="segment")
    params = gkn_init(jax.random.PRNGKey(1), cfg)

    ds_csr = WindowDataset(traj, window_size=4, graph_mode="sparse",
                           max_edges=e_max)
    ds_blk = WindowDataset(traj, window_size=4, graph_mode="sparse",
                           max_edges=e_max, edge_layout="blocked")
    idx = [0, 3, 9]
    out_csr = gkn_apply(
        params, cfg, featurize_batch(cfg, ds_csr.get_batch(idx))
    )
    cfg_blk = dataclasses.replace(cfg, scatter_mode="blocked")
    out_blk = gkn_apply(
        params, cfg_blk, featurize_batch(cfg_blk, ds_blk.get_batch(idx))
    )
    np.testing.assert_allclose(out_blk, out_csr, rtol=2e-5, atol=2e-6)


def test_predict_prior_extrapolate_algebra(tiny_model_cfg):
    """predict_prior='extrapolate' shifts the SAME head output by the
    constant-velocity forecast: out_ex == out_last + (x_t - x_{t-1}).
    A zero head therefore equals linear extrapolation, not copy-last
    (models/gkn.py residual_prior)."""
    import dataclasses

    cfg_last = dataclasses.replace(tiny_model_cfg, predict_delta=True,
                                   predict_prior="last")
    cfg_ex = dataclasses.replace(cfg_last, predict_prior="extrapolate")
    params = gkn_init(jax.random.PRNGKey(0), cfg_last)
    batch = _dense_batch(cfg_last)
    out_last = gkn_apply(params, cfg_last, batch)
    out_ex = gkn_apply(params, cfg_ex, batch)
    vel = batch.window[:, -1] - batch.window[:, -2]
    np.testing.assert_allclose(np.asarray(out_ex),
                               np.asarray(out_last + vel),
                               rtol=1e-5, atol=1e-6)


def test_head_init_zero_forward_equals_prior(tiny_model_cfg):
    """head_init='zero': the untrained forecast IS the prior exactly —
    the residual head can never start worse than its baseline (GNS
    practice; round-4 standard-init heads measured 8-177x worse than
    bare extrapolation)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_model_cfg, predict_delta=True,
                              predict_prior="extrapolate",
                              head_init="zero")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    batch = _dense_batch(cfg)
    out = gkn_apply(params, cfg, batch)
    last = batch.window[:, -1]
    prior = last + 1.0 * (last - batch.window[:, -2])  # residual_prior's
    # exact float association (a + g(a-b), not 2a-b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(prior),
                               rtol=0, atol=0)


def test_prior_damping_algebra(tiny_model_cfg):
    """prior_damping=g: out = head + x_t + g (x_t - x_{t-1}); g=0 is
    copy-last, g=1 pure extrapolation."""
    import dataclasses

    base = dataclasses.replace(tiny_model_cfg, predict_delta=True,
                               predict_prior="extrapolate")
    params = gkn_init(jax.random.PRNGKey(0), base)
    batch = _dense_batch(base)
    vel = batch.window[:, -1] - batch.window[:, -2]
    out_full = gkn_apply(params, base, batch)
    cfg_half = dataclasses.replace(base, prior_damping=0.5)
    out_half = gkn_apply(params, cfg_half, batch)
    np.testing.assert_allclose(np.asarray(out_half),
                               np.asarray(out_full - 0.5 * vel),
                               rtol=1e-5, atol=1e-6)
    cfg_zero = dataclasses.replace(base, prior_damping=0.0)
    cfg_last = dataclasses.replace(base, predict_prior="last")
    np.testing.assert_allclose(
        np.asarray(gkn_apply(params, cfg_zero, batch)),
        np.asarray(gkn_apply(params, cfg_last, batch)),
        rtol=0, atol=0)


def test_init_gain_disease_and_fix_at_flagship_config():
    """Regression pin for the training-explosion root cause (VERDICT r4
    item 5): at the flagship BBA config (width 64, ker 1024, depth 6)
    the torch-default edge-kernel init gives the tied conv stack a
    ~3.2x/layer gain — latent rms ~1e6 at init and ~6600x amplification
    of input perturbations, which is what turned fed-back prediction
    errors into the deterministic K=1/K-switch explosions
    (tools/init_gain_probe.py, docs/PERFORMANCE.md "Init-gain root
    cause"). kernel_init_scale=0.25 must keep the init forward O(1)."""
    import dataclasses

    from molecular_dynamics_neural_operator_tpu.data import WindowDataset
    from molecular_dynamics_neural_operator_tpu.data.synthetic import (
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    traj = synthetic_trajectory(num_frames=16, num_residues=28, seed=11)
    base = ModelConfig(width=64, ker_width=1024, depth=6,
                       graph_mode="sparse", max_edges=512,
                       compute_dtype="float32", predict_delta=True)
    ds = WindowDataset(traj, window_size=base.window_size,
                       graph_mode="sparse", max_edges=512)
    batch = featurize_batch(base, ds.get_batch(np.array([0])))

    def latent_rms(cfg):
        params = gkn_init(jax.random.PRNGKey(0), cfg)
        _, lat = gkn_apply(params, cfg, batch, return_latent=True)
        return float(jnp.sqrt(jnp.mean(lat.astype(jnp.float32) ** 2)))

    assert latent_rms(base) > 1e4  # the disease (default init)
    fixed = dataclasses.replace(base, kernel_init_scale=0.25)
    assert latent_rms(fixed) < 10.0  # the fix


def test_kernel_init_scale_scales_final_layer(tiny_model_cfg):
    """kernel_init_scale multiplies ONLY the edge-kernel MLP's last layer
    (both convs' kernels shrink proportionally at init)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_model_cfg, kernel_init_scale=0.25)
    p_scaled = gkn_init(jax.random.PRNGKey(0), cfg)
    p_plain = gkn_init(jax.random.PRNGKey(0), tiny_model_cfg)
    last = f"layer_{len(p_plain['edge_kernel']) - 1}"
    np.testing.assert_allclose(
        np.asarray(p_scaled["edge_kernel"][last]["w"]),
        0.25 * np.asarray(p_plain["edge_kernel"][last]["w"]), rtol=1e-7)
    # earlier layers untouched
    np.testing.assert_array_equal(
        np.asarray(p_scaled["edge_kernel"]["layer_0"]["w"]),
        np.asarray(p_plain["edge_kernel"]["layer_0"]["w"]))


def test_predict_prior_validation(tiny_model_cfg):
    import dataclasses

    import pytest

    cfg = dataclasses.replace(tiny_model_cfg, predict_delta=True,
                              predict_prior="nonsense")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    batch = _dense_batch(cfg)
    with pytest.raises(ValueError, match="predict_prior"):
        gkn_apply(params, cfg, batch)
    cfg1 = dataclasses.replace(tiny_model_cfg, predict_delta=True,
                               predict_prior="extrapolate", window_size=1)
    params1 = gkn_init(jax.random.PRNGKey(0), cfg1)
    batch1 = _dense_batch(cfg1)
    with pytest.raises(ValueError, match="window"):
        gkn_apply(params1, cfg1, batch1)


def test_head_scale_algebra(tiny_model_cfg):
    """head_scale=s (GNS target normalization): out_s - prior ==
    s * (out_1 - prior) for the same parameters, across the vmapped
    sparse path (configs.ModelConfig.head_scale)."""
    import dataclasses

    base = dataclasses.replace(tiny_model_cfg, predict_delta=True,
                               predict_prior="extrapolate")
    params = gkn_init(jax.random.PRNGKey(0), base)
    batch = _dense_batch(base)
    last = batch.window[:, -1]
    prior = last + 1.0 * (last - batch.window[:, -2])
    out1 = gkn_apply(params, base, batch)
    cfg_s = dataclasses.replace(base, head_scale=0.01)
    outs = gkn_apply(params, cfg_s, batch)
    # atol covers f32 cancellation: prior is O(1), the scaled head
    # residual O(1e-5)
    np.testing.assert_allclose(np.asarray(outs - prior),
                               0.01 * np.asarray(out1 - prior),
                               rtol=1e-4, atol=2e-6)
    # head_scale is only read under predict_delta: the absolute head is
    # untouched
    cfg_abs = dataclasses.replace(tiny_model_cfg, predict_delta=False)
    cfg_abs_s = dataclasses.replace(cfg_abs, head_scale=0.01)
    np.testing.assert_allclose(
        np.asarray(gkn_apply(params, cfg_abs_s, batch)),
        np.asarray(gkn_apply(params, cfg_abs, batch)), rtol=0, atol=0)
