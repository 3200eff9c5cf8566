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
