"""Persistent grid-over-steps Pallas rollout vs the XLA scan (interpret
mode on CPU; the perf claim is measured on the chip, the MATH is pinned
here)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (
    persistent_rollout,
)
from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan


def _cfg(**kw):
    base = dict(width=16, ker_width=32, depth=2, window_size=4,
                num_residues=12, max_edges=128, graph_mode="sparse",
                compute_dtype="float32", predict_delta=True)
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("r,predict_delta,prior", [
    (12, True, "last"), (11, True, "last"), (12, False, "last"),
    (12, True, "extrapolate")])
def test_persistent_matches_scan(r, predict_delta, prior):
    """Same trajectory as the XLA rollout scan, including non-multiple-of-8
    residue counts (pad rows must never contaminate the graph) and the
    constant-velocity residual prior (in-kernel prev-frame read)."""
    cfg = _cfg(num_residues=r, predict_delta=predict_delta,
               predict_prior=prior)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=r, seed=5)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])

    steps = 6
    clip = 50.0 if not predict_delta else None
    ref, _, ref_diags = jax.jit(
        lambda p, a, w: rollout_scan(p, cfg, a, w, steps, clip=clip)
    )(params, aa, w0)
    got, diags = persistent_rollout(params, cfg, aa, w0, steps,
                                    clip=clip, interpret=True)
    assert got.shape == (steps, r, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert bool(diags["edge_overflow"]) == bool(ref_diags["edge_overflow"])


def test_persistent_matches_scan_with_damped_prior():
    """prior_damping < 1 inside the kernel (the in-kernel prev-frame read
    scaled by gamma) must track the XLA scan exactly."""
    cfg = _cfg(predict_prior="extrapolate", prior_damping=0.5)
    params = gkn_init(jax.random.PRNGKey(3), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=12, seed=7)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    steps = 5
    ref, _, _ = jax.jit(
        lambda p, a, w: rollout_scan(p, cfg, a, w, steps)
    )(params, aa, w0)
    got, _ = persistent_rollout(params, cfg, aa, w0, steps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # and the damping actually changes the trajectory vs gamma = 1
    cfg1 = _cfg(predict_prior="extrapolate", prior_damping=1.0)
    undamped, _ = persistent_rollout(params, cfg1, aa, w0, steps,
                                     interpret=True)
    assert not np.allclose(np.asarray(got), np.asarray(undamped))


def test_persistent_matches_scan_with_electrostatics():
    """electrostatics="dh" inside the kernel: the screened-Coulomb node
    feature recomputes from the flat pair distances and must match the
    XLA path's debye_huckel_at_atoms exactly."""
    cfg = _cfg(electrostatics="dh")
    params = gkn_init(jax.random.PRNGKey(2), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=12, seed=8)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    steps = 5
    ref, _, _ = jax.jit(
        lambda p, a, w: rollout_scan(p, cfg, a, w, steps)
    )(params, aa, w0)
    got, _ = persistent_rollout(params, cfg, aa, w0, steps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_persistent_multi_stream_matches_batched_scan():
    """window0 (S, T, R, 3): the in-kernel stream loop must reproduce the
    batched (vmapped) XLA rollout stream for stream."""
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    cfg = _cfg()
    params = gkn_init(jax.random.PRNGKey(4), cfg)
    traj = synthetic_trajectory(num_frames=16, num_residues=12, seed=9)
    aa = jnp.asarray(traj.aminoacids)
    windows = jnp.stack([jnp.asarray(traj.positions[i : i + 4])
                         for i in (0, 5, 10)])  # (3, 4, 12, 3)
    steps = 5
    ref, ref_final, _ = make_rollout_fn(cfg, num_steps=steps, batched=True)(
        params, aa, windows
    )
    got, diags = persistent_rollout(params, cfg, aa, windows, steps,
                                    interpret=True)
    assert got.shape == (3, steps, 12, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (
        make_persistent_rollout_fn,
    )

    fn = make_persistent_rollout_fn(cfg, num_steps=steps, interpret=True)
    coords, final_w, _ = fn(params, aa, windows)
    np.testing.assert_allclose(np.asarray(final_w), np.asarray(ref_final),
                               rtol=2e-4, atol=2e-4)


def test_persistent_matches_scan_beyond_48_residues():
    """The (R, R)-layout extraction removed the old flat formulation's
    48-residue cap (its (R^2, R^2) ranking constant); a 56-residue system
    must now match the XLA scan too."""
    cfg = _cfg(num_residues=56, max_edges=512)
    params = gkn_init(jax.random.PRNGKey(3), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=56, seed=11)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    steps = 4
    ref, _, ref_diags = jax.jit(
        lambda p, a, w: rollout_scan(p, cfg, a, w, steps)
    )(params, aa, w0)
    got, diags = persistent_rollout(params, cfg, aa, w0, steps,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert bool(diags["edge_overflow"]) == bool(ref_diags["edge_overflow"])


def test_persistent_rejects_window_diff():
    """The in-kernel LSTM consumes raw window frames; window_diff configs
    must be rejected up front, not silently rolled out with the wrong
    encoder (parity with rollout_scan would break undetectably)."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), window_diff=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=12, seed=5)
    with pytest.raises(ValueError, match="window_diff"):
        persistent_rollout(params, cfg, jnp.asarray(traj.aminoacids),
                           jnp.asarray(traj.positions[:4]), 2,
                           interpret=True)


def test_persistent_vmem_budget_guard():
    """Configurations whose working set cannot fit VMEM raise up front."""
    cfg = _cfg(num_residues=28, max_edges=8192, width=128, ker_width=1024)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=28, seed=5)
    with pytest.raises(ValueError, match="VMEM budget"):
        persistent_rollout(params, cfg, jnp.asarray(traj.aminoacids),
                           jnp.asarray(traj.positions[:4]), 2,
                           interpret=True)


def test_persistent_overflow_diagnostic():
    """Capacity smaller than the real edge count must raise the overflow
    flag (static shapes cannot error under jit)."""
    cfg = _cfg(max_edges=16)  # far below the ~80 real contacts
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=12, seed=5)
    _, diags = persistent_rollout(
        params, cfg, jnp.asarray(traj.aminoacids),
        jnp.asarray(traj.positions[:4]), 2, clip=100.0, interpret=True,
    )
    assert bool(diags["edge_overflow"])


def test_persistent_fn_wrapper_final_window():
    from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (
        make_persistent_rollout_fn,
    )

    cfg = _cfg()
    params = gkn_init(jax.random.PRNGKey(1), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=12, seed=7)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    fn = make_persistent_rollout_fn(cfg, num_steps=6, interpret=True)
    coords, final_w, _ = fn(params, aa, w0)
    np.testing.assert_array_equal(np.asarray(final_w),
                                  np.asarray(coords[-4:]))


def test_persistent_matches_scan_with_head_scale():
    """head_scale != 1 folds into the kernel's fc2 operands exactly
    (linear head) and must track the XLA scan."""
    cfg = _cfg(predict_prior="extrapolate", head_scale=0.05)
    params = gkn_init(jax.random.PRNGKey(3), cfg)
    traj = synthetic_trajectory(num_frames=6, num_residues=12, seed=7)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:4])
    steps = 5
    ref, _, _ = jax.jit(
        lambda p, a, w: rollout_scan(p, cfg, a, w, steps)
    )(params, aa, w0)
    got, _ = persistent_rollout(params, cfg, aa, w0, steps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
