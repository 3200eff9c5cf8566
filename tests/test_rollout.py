"""Rollout semantics: scan == host-loop, window sliding, collect modes,
clip rail, predict_delta, dense == sparse rollout."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.geometry import contact_map
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.rollout import (
    make_rollout_fn,
    rollout_python_loop,
    rollout_scan,
    rollout_with_mse,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, max_edges=128,
                      compute_dtype="float32", predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=32, num_residues=10, seed=5)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    return cfg, params, traj, aa, w0


def test_scan_matches_python_loop(setup):
    cfg, params, traj, aa, w0 = setup
    coords, final, _ = rollout_scan(params, cfg, aa, w0, num_steps=6)
    coords_loop, final_loop = rollout_python_loop(params, cfg, aa, w0, 6)
    np.testing.assert_allclose(np.asarray(coords), coords_loop,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_loop),
                               rtol=1e-5, atol=1e-6)


def test_window_slide_semantics(setup):
    cfg, params, traj, aa, w0 = setup
    coords, final, _ = rollout_scan(params, cfg, aa, w0, num_steps=6)
    # final window = last window_size predictions (all original frames
    # dropped after >= window_size steps), graph_kernel.py:407-409
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(coords[-cfg.window_size:]),
                               rtol=1e-6)


def test_collect_modes_consistent(setup):
    cfg, params, traj, aa, w0 = setup
    coords, *_ = rollout_scan(params, cfg, aa, w0, 4, collect="coords")
    cms, *_ = rollout_scan(params, cfg, aa, w0, 4, collect="contact_maps")
    (c2, m2), *_ = rollout_scan(params, cfg, aa, w0, 4, collect="both")
    np.testing.assert_allclose(np.asarray(coords), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(cms), np.asarray(m2))
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(cms[i]), np.asarray(contact_map(coords[i], 8.0))
        )


def test_clip_rail_bounds_feedback(setup):
    cfg, params, traj, aa, w0 = setup
    # absolute-coordinate model from random init diverges; clip keeps finite
    cfg_abs = dataclasses.replace(cfg, predict_delta=False, depth=3)
    params_abs = gkn_init(jax.random.PRNGKey(1), cfg_abs)
    coords, *_ = rollout_scan(params_abs, cfg_abs, aa, w0, 12, clip=50.0)
    arr = np.asarray(coords)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() <= 50.0


def test_predict_delta_stays_stable(setup):
    cfg, params, traj, aa, w0 = setup
    coords, *_ = rollout_scan(params, cfg, aa, w0, 50)
    arr = np.asarray(coords)
    assert np.isfinite(arr).all()
    # residual model stays in the data's coordinate range
    assert np.abs(arr).max() < 10 * np.abs(traj.positions).max()


def test_dense_and_sparse_rollout_agree(setup):
    cfg, params, traj, aa, w0 = setup
    cfg_sp = dataclasses.replace(cfg, graph_mode="sparse")
    coords_d, *_ = rollout_scan(params, cfg, aa, w0, 5)
    coords_s, *_ = rollout_scan(params, cfg_sp, aa, w0, 5)
    np.testing.assert_allclose(np.asarray(coords_d), np.asarray(coords_s),
                               rtol=1e-4, atol=1e-5)


def test_rollout_with_mse_tracks_truth(setup):
    cfg, params, traj, aa, w0 = setup
    truth = jnp.asarray(traj.positions[4:10])
    coords, mses, _ = rollout_with_mse(params, cfg, aa, w0, truth)
    assert mses.shape == (6,)
    ref0 = np.mean((np.asarray(coords[0]) - traj.positions[4]) ** 2)
    np.testing.assert_allclose(float(mses[0]), ref0, rtol=1e-5)


def test_batched_rollout_matches_single(setup):
    cfg, params, traj, aa, w0 = setup
    w0b = jnp.stack([w0, w0 + 0.1])
    roll = make_rollout_fn(cfg, num_steps=3, batched=True)
    coords_b, *_ = roll(params, aa, w0b)
    single, *_ = rollout_scan(params, cfg, aa, w0, 3)
    np.testing.assert_allclose(np.asarray(coords_b[0]), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_edge_overflow_diagnostic(setup):
    """Device-side extraction cannot raise on overflow (static shapes);
    rollout diagnostics must flag the truncation instead."""
    cfg, params, traj, aa, w0 = setup
    # capacity far below the real edge count -> guaranteed truncation
    cfg_tiny = dataclasses.replace(cfg, graph_mode="sparse", max_edges=8)
    _, _, diags = rollout_scan(params, cfg_tiny, aa, w0, 2)
    assert bool(diags["edge_overflow"])
    cfg_ok = dataclasses.replace(cfg, graph_mode="sparse", max_edges=128)
    _, _, diags_ok = rollout_scan(params, cfg_ok, aa, w0, 2)
    assert not bool(diags_ok["edge_overflow"])


def test_scatter_mode_blocked_does_not_leak_into_rebuilds(setup):
    """cfg.scatter_mode='blocked' describes the DATASET's edge layout
    (--edge_layout blocked); rollout steps rebuild graphs on device in
    front-packed CSR order (padded_edges_device), which the blocked
    reduction would silently mis-aggregate. The rebuilt-graph hint must
    override the config: identical trajectories either way."""
    cfg, params, traj, aa, w0 = setup
    cfg_sp = dataclasses.replace(cfg, graph_mode="sparse", max_edges=130)
    # max_edges 130 = 13 * R(10): divisible, so the blocked layout's
    # divisibility guard would NOT save us — this is the silent case.
    cfg_blk = dataclasses.replace(cfg_sp, scatter_mode="blocked")
    ref, *_ = rollout_scan(params, cfg_sp, aa, w0, 5)
    got, *_ = rollout_scan(params, cfg_blk, aa, w0, 5)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_copy_last_baseline_oracle(setup):
    """The shared honesty-bar helper == the inline numpy computation the
    accuracy tools previously carried as drifting copies."""
    from molecular_dynamics_neural_operator_tpu.geometry import contact_map
    from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
        copy_last_baseline,
    )

    cfg, params, traj, aa, w0 = setup
    truth = traj.positions[4:12]
    mse, acc = copy_last_baseline(w0[-1], truth, 8.0)
    assert mse.shape == acc.shape == (8,)

    frozen = np.asarray(w0[-1])
    np.testing.assert_allclose(
        mse, np.mean((frozen[None] - truth) ** 2, axis=(1, 2)), rtol=1e-6)
    cm_frozen = np.asarray(contact_map(jnp.asarray(frozen[None]), 8.0))
    cm_true = np.asarray(contact_map(jnp.asarray(truth), 8.0))
    np.testing.assert_allclose(
        acc, np.mean(cm_frozen == cm_true, axis=(1, 2)))
    # step-0 truth IS within float noise of the frozen frame's successor:
    # accuracy must be in [0, 1] and the frozen frame's own map perfect
    assert np.all((0.0 <= acc) & (acc <= 1.0))


def test_linear_extrapolation_baseline_oracle(setup):
    """Constant-velocity honesty bar == the closed form, and it is EXACT
    on an exactly linear trajectory (where copy-last is not)."""
    from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
        copy_last_baseline,
        linear_extrapolation_baseline,
    )

    cfg, params, traj, aa, w0 = setup
    truth = traj.positions[4:12]
    mse, acc = linear_extrapolation_baseline(w0[-2], w0[-1], truth, 8.0)
    assert mse.shape == acc.shape == (8,)
    prev, last = np.asarray(w0[-2]), np.asarray(w0[-1])
    ahead = np.arange(1, 9, dtype=np.float32)[:, None, None]
    want = np.mean(
        ((last[None] + (last - prev)[None] * ahead) - truth) ** 2,
        axis=(1, 2))
    np.testing.assert_allclose(mse, want, rtol=1e-6)
    assert np.all((0.0 <= acc) & (acc <= 1.0))

    # exactness on a linear trajectory: x(t) = x0 + t*v
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(6, 3)).astype(np.float32) * 4
    v = rng.normal(size=(6, 3)).astype(np.float32) * 0.01
    frames = x0[None] + np.arange(6, dtype=np.float32)[:, None, None] * v
    lin_mse, _ = linear_extrapolation_baseline(
        frames[0], frames[1], frames[2:], 8.0)
    copy_mse, _ = copy_last_baseline(frames[1], frames[2:], 8.0)
    np.testing.assert_allclose(lin_mse, 0.0, atol=1e-10)
    assert np.all(copy_mse > 0)


def test_rebuilt_scatter_hint_choices():
    from molecular_dynamics_neural_operator_tpu.rollout.scan import (
        rebuilt_scatter_hint,
    )

    sp = ModelConfig(graph_mode="sparse", scatter_mode="blocked")
    assert rebuilt_scatter_hint(sp, 10) == "onehot"
    assert rebuilt_scatter_hint(sp, 10_000) == "segment"
    cl = dataclasses.replace(sp, neighbor_impl="cell_list")
    assert rebuilt_scatter_hint(cl, 10_000) == "blocked"
    assert rebuilt_scatter_hint(cl, 10) == "onehot"
    dn = ModelConfig(graph_mode="dense")
    assert rebuilt_scatter_hint(dn, 10) is None


def test_damped_extrapolation_baseline_limits():
    """gamma=1 == linear extrapolation; gamma=0 == copy-last; a
    mid-gamma forecast matches the explicit per-step recurrence
    (rollout/baseline.py::damped_extrapolation_baseline)."""
    from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
        copy_last_baseline,
        damped_extrapolation_baseline,
        linear_extrapolation_baseline,
    )

    rng = np.random.default_rng(0)
    prev = rng.normal(size=(7, 3)).astype(np.float32)
    last = (prev + 0.1 * rng.normal(size=(7, 3))).astype(np.float32)
    truth = rng.normal(size=(6, 7, 3)).astype(np.float32)

    m1, a1 = damped_extrapolation_baseline(prev, last, truth, 1.0)
    me, ae = linear_extrapolation_baseline(prev, last, truth)
    np.testing.assert_allclose(m1, me, rtol=1e-6)
    m0, a0 = damped_extrapolation_baseline(prev, last, truth, 0.0)
    mc, ac = copy_last_baseline(last, truth)
    np.testing.assert_allclose(m0, mc, rtol=1e-6)

    g = 0.6
    mg, _ = damped_extrapolation_baseline(prev, last, truth, g)
    x, v = last.copy(), (last - prev).copy()
    for kstep in range(truth.shape[0]):
        v = g * v
        x = x + v
        np.testing.assert_allclose(
            float(np.mean((x - truth[kstep]) ** 2)), float(mg[kstep]),
            rtol=1e-4)
