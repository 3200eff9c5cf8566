"""FNO operator: shape/finiteness, spectral-conv correctness against a
naive full-FFT oracle, training-step loss decrease, rollout semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import FNOConfig, TrainConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.models.fno import (
    FNOBatch,
    distance_matrix_channels,
    fno_apply,
    fno_init,
    fno_rollout_scan,
    make_fno_train_step,
    _spectral_conv,
)
from molecular_dynamics_neural_operator_tpu.train.optim import make_optimizer
from molecular_dynamics_neural_operator_tpu.train.state import TrainState


def _cfg():
    return FNOConfig(width=8, modes1=4, modes2=4, depth=2, in_channels=5,
                     out_channels=1, num_residues=16)


def test_forward_shapes():
    cfg = _cfg()
    params = fno_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 5))
    out = fno_apply(params, cfg, x)
    assert out.shape == (3, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
    out2, latent = fno_apply(params, cfg, x, return_latent=True)
    assert latent.shape == (3, 16, 16, cfg.width)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_spectral_conv_matches_full_fft_oracle():
    """Mode-truncated multiply == full-spectrum multiply with weights that
    are zero outside the kept modes."""
    cfg = _cfg()
    r, w, m = 16, 4, 3
    key = jax.random.PRNGKey(2)
    sp = {
        "w_real": jax.random.normal(key, (w, w, m, m)),
        "w_imag": jax.random.normal(jax.random.fold_in(key, 1), (w, w, m, m)),
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (r, r, w))
    ours = np.asarray(_spectral_conv(sp, x, m, m))

    # oracle: embed the weights into the full (w, w, r, r//2+1) spectrum
    wfull = np.zeros((w, w, r, r // 2 + 1), np.complex64)
    wc = np.asarray(sp["w_real"]) + 1j * np.asarray(sp["w_imag"])
    wfull[:, :, :m, :m] = wc
    wfull[:, :, -m:, :m] = np.conj(wc)
    xf = np.fft.rfft2(np.asarray(x), axes=(0, 1))
    outf = np.einsum("xyi,ioxy->xyo", xf, wfull.transpose(0, 1, 2, 3))
    ref = np.fft.irfft2(outf, s=(r, r), axes=(0, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_spectral_dft_matches_fft_impl():
    """The matmul (truncated-DFT) spectral path is mathematically
    identical to the FFT path — including non-power-of-two grids (the
    Bluestein sizes it exists to avoid), odd sizes, and weights touching
    the Nyquist column."""
    import pytest

    key = jax.random.PRNGKey(5)
    w = 4
    for r, m1, m2 in [(16, 3, 3), (28, 12, 12), (14, 5, 5), (15, 4, 4),
                      (16, 4, 9)]:  # m2=9=r//2+1: Nyquist column included
        sp = {
            "w_real": jax.random.normal(key, (w, w, m1, m2)),
            "w_imag": jax.random.normal(jax.random.fold_in(key, 1),
                                        (w, w, m1, m2)),
        }
        x = jax.random.normal(jax.random.fold_in(key, r), (2, r, r, w))
        fft = np.asarray(_spectral_conv(sp, x, m1, m2, impl="fft"))
        dft = np.asarray(_spectral_conv(sp, x, m1, m2, impl="dft"))
        np.testing.assert_allclose(dft, fft, rtol=2e-4, atol=2e-4,
                                   err_msg=f"r={r} m=({m1},{m2})")


def test_spectral_dft_rejects_overlapping_modes():
    """2*modes1 > R makes the two impls inequivalent (the FFT path's
    scatter overwrites the overlapping rows, a sum would not): explicit
    dft must refuse, and auto must route such configs to fft."""
    import pytest

    r, w, m1, m2 = 16, 4, 12, 4  # row overlap: 2*12 > 16; cols valid
    key = jax.random.PRNGKey(6)
    sp = {
        "w_real": jax.random.normal(key, (w, w, m1, m2)),
        "w_imag": jax.random.normal(jax.random.fold_in(key, 1),
                                    (w, w, m1, m2)),
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (r, r, w))
    with pytest.raises(ValueError, match="2\\*modes1"):
        _spectral_conv(sp, x, m1, m2, impl="dft")
    # auto falls back to fft and matches it
    auto = np.asarray(_spectral_conv(sp, x, m1, m2, impl="auto"))
    fft = np.asarray(_spectral_conv(sp, x, m1, m2, impl="fft"))
    np.testing.assert_allclose(auto, fft, rtol=1e-5, atol=1e-5)


def test_training_reduces_loss():
    cfg = _cfg()
    traj = synthetic_trajectory(num_frames=64, num_residues=16, seed=4)
    pos = jnp.asarray(traj.positions)
    xs, ys = [], []
    for i in range(40):
        ch = distance_matrix_channels(pos[i : i + 5])
        xs.append(ch)
        ys.append(distance_matrix_channels(pos[i + 5 : i + 6]))
    x = jnp.stack(xs)
    y = jnp.stack(ys)

    params = fno_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(lr=3e-3, weight_decay=0.0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(0))
    step = make_fno_train_step(cfg, tx)
    losses = []
    for _ in range(80):
        state, m = step(state, FNOBatch(x=x, y=y))
        losses.append(float(m["rel_l2"]))
    assert losses[-1] < 0.5 * losses[0], losses[::20]


def test_rollout_slides_channels_and_is_symmetric():
    cfg = _cfg()
    params = fno_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=16, num_residues=16, seed=5)
    ch0 = distance_matrix_channels(jnp.asarray(traj.positions[:5]))
    preds, final = fno_rollout_scan(params, cfg, ch0, num_steps=4)
    assert preds.shape == (4, 16, 16)
    p = np.asarray(preds)
    np.testing.assert_allclose(p, np.swapaxes(p, -1, -2), rtol=1e-5,
                               atol=1e-5)
    assert np.abs(np.diagonal(p, axis1=-2, axis2=-1)).max() < 1e-5
    # final window's newest channel is the last prediction
    np.testing.assert_allclose(
        np.asarray(final[..., -1]), p[-1], rtol=1e-6
    )


def test_fno_curriculum_k1_matches_teacher_step():
    """K=1 FNO curriculum == the teacher-forced window step (same loss,
    same updated params), mirroring the GKN curriculum invariant."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models.fno import (
        fno_init,
        make_fno_curriculum_train_step,
        make_fno_window_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.optim import (
        make_optimizer,
    )
    from molecular_dynamics_neural_operator_tpu.train.state import TrainState

    cfg = FNOConfig(width=8, modes1=3, modes2=3, depth=1, in_channels=4,
                    num_residues=12)
    traj = synthetic_trajectory(num_frames=24, num_residues=12, seed=6)
    ds = WindowDataset(traj, window_size=4, graph_mode="none")
    batch = {k: jnp.asarray(v) for k, v in
             ds.get_batch(np.arange(5), rollout_horizon=1).items()}

    outs = {}
    for name, make in (("teacher", lambda tx: make_fno_window_train_step(cfg, tx)),
                       ("k1", lambda tx: make_fno_curriculum_train_step(cfg, tx, 1))):
        tx, _ = make_optimizer(lr=1e-3)
        params = fno_init(jax.random.PRNGKey(0), cfg)
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32), jax.random.PRNGKey(0))
        new, m = make(tx)(state, batch)
        outs[name] = (new, float(m["rel_l2"]))
    # teacher step's y is the same frame as y_seq[:, 0]; rel on the
    # (R, R, 1) channels equals rel on the (R, R) matrix
    assert abs(outs["teacher"][1] - outs["k1"][1]) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(outs["teacher"][0].params),
                    jax.tree_util.tree_leaves(outs["k1"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fno_curriculum_k3_trains():
    """K=3 FNO curriculum: finite loss that decreases over steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        batch_iterator,
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models.fno import (
        fno_init,
        make_fno_curriculum_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train.optim import (
        make_optimizer,
    )
    from molecular_dynamics_neural_operator_tpu.train.state import TrainState

    cfg = FNOConfig(width=8, modes1=3, modes2=3, depth=1, in_channels=4,
                    num_residues=12)
    traj = synthetic_trajectory(num_frames=40, num_residues=12, seed=6)
    ds = WindowDataset(traj, window_size=4, graph_mode="none")
    tx, _ = make_optimizer(lr=3e-3)
    params = fno_init(jax.random.PRNGKey(0), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(0))
    step = make_fno_curriculum_train_step(cfg, tx, 3)
    losses = []
    for epoch in range(6):
        for batch in batch_iterator(ds, np.arange(30), 8, seed=0,
                                    epoch=epoch, rollout_horizon=3):
            state, m = step(state, batch)
            losses.append(float(m["rel_l2"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_predict_delta_residual_head():
    """predict_delta output == absolute output + last input channel (the
    residual head only adds the most recent distance matrix), and the
    rollout/curriculum paths compose with it unchanged."""
    import dataclasses

    cfg = _cfg()
    cfg_d = dataclasses.replace(cfg, predict_delta=True)
    params = fno_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 5))
    base = np.asarray(fno_apply(params, cfg, x))
    delta = np.asarray(fno_apply(params, cfg_d, x))
    np.testing.assert_allclose(
        delta, base + np.asarray(x[..., -1:]), rtol=0, atol=1e-6)

    # at init the head is small, so a delta model starts near copy-last
    ch0 = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 5))
    preds, _ = fno_rollout_scan(params, cfg_d, ch0, 3)
    assert preds.shape == (3, 16, 16)
    assert np.isfinite(np.asarray(preds)).all()


def test_fno_predict_prior_extrapolate_algebra():
    """FNO residual prior: out_ex == out_last + (D_t - D_{t-1}) for the
    same params (constant-velocity on distance matrices)."""
    import dataclasses

    import jax
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.models.fno import (
        fno_apply,
        fno_init,
    )

    cfg = FNOConfig(width=8, modes1=4, modes2=4, depth=2, in_channels=4,
                    num_residues=12, predict_delta=True)
    cfg_ex = dataclasses.replace(cfg, predict_prior="extrapolate")
    params = fno_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 4))
    out_last = fno_apply(params, cfg, x)
    out_ex = fno_apply(params, cfg_ex, x)
    vel = x[..., -1:] - x[..., -2:-1]
    np.testing.assert_allclose(np.asarray(out_ex),
                               np.asarray(out_last + vel),
                               rtol=1e-5, atol=1e-6)
    # damped prior: g contracts the implied velocity
    cfg_damp = dataclasses.replace(cfg_ex, prior_damping=0.5)
    out_damp = fno_apply(params, cfg_damp, x)
    np.testing.assert_allclose(np.asarray(out_damp),
                               np.asarray(out_ex - 0.5 * vel),
                               rtol=1e-5, atol=1e-6)


def test_fno_head_init_zero_and_extrapolate_guard():
    import dataclasses

    import jax
    import numpy as np
    import pytest

    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.models.fno import (
        fno_apply,
        fno_init,
    )

    cfg = FNOConfig(width=8, modes1=4, modes2=4, depth=2, in_channels=4,
                    num_residues=12, predict_delta=True,
                    predict_prior="extrapolate", head_init="zero")
    params = fno_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 4))
    out = fno_apply(params, cfg, x)
    # fno_apply's exact float association: D_t + g (D_t - D_{t-1})
    prior = x[..., -1:] + 1.0 * (x[..., -1:] - x[..., -2:-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(prior),
                               rtol=0, atol=0)
    # in_channels=1 cannot form the velocity: clear error at init, not an
    # obscure broadcast failure deep in the forward
    bad = dataclasses.replace(cfg, in_channels=1)
    with pytest.raises(ValueError, match="in_channels"):
        fno_init(jax.random.PRNGKey(0), bad)
