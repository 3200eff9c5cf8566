"""Copy-last-frame baseline: the accuracy honesty bar.

On slowly varying MD trajectories, freezing the last observed window frame
scores high contact accuracy with NO model at all (the reference's own
eval never checks this — its per-step MSE curves in ``bba_analysis.ipynb``
cells 19-23 are reported without a skill-free control). Every accuracy
tool in this repo reports rollout quality AGAINST this baseline; a result
only demonstrates learning if it beats these numbers. ONE definition so
the honesty bar cannot drift between tools (accuracy_eval /
full_scale_campaign previously carried separate copies).
"""

from __future__ import annotations

import numpy as np


def copy_last_baseline(last_frame, truth, threshold: float = 8.0):
    """Per-step metrics of the zero-motion forecast.

    last_frame: (R, 3) — the window's final observed frame.
    truth: (T, R, 3) — the ground-truth continuation.
    Returns (coord_mse, contact_accuracy), each shape (T,): the frozen
    frame's coordinate MSE against each true step and the fraction of
    contact-map entries it gets right (same threshold semantics as
    ``geometry.contact_map``, self-loops included).
    """
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.geometry import contact_map

    frozen = np.asarray(last_frame)
    truth_np = np.asarray(truth)
    mse = np.mean((frozen[None] - truth_np) ** 2, axis=(1, 2))
    cm_frozen = np.asarray(contact_map(jnp.asarray(frozen[None]), threshold))
    cm_true = np.asarray(contact_map(jnp.asarray(truth_np), threshold))
    acc = np.mean(cm_frozen == cm_true, axis=(1, 2))
    return mse, acc


def linear_extrapolation_baseline(prev_frame, last_frame, truth,
                                  threshold: float = 8.0):
    """Per-step metrics of the constant-velocity forecast.

    The second honesty bar: on smooth trajectories the linear
    extrapolation ``last + t * (last - prev)`` is the stronger trivial
    forecaster (copy-last is its zero-velocity special case) — it wins
    short horizons wherever per-step motion is locally linear, and it
    DIVERGES long-horizon, so a learned operator's value shows up as
    beating it at large t while staying bounded.

    prev_frame, last_frame: (R, 3) — the window's final two observed
    frames. truth: (T, R, 3). Returns (coord_mse, contact_accuracy),
    each shape (T,), same semantics as :func:`copy_last_baseline`.
    """
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.geometry import contact_map

    prev = np.asarray(prev_frame)
    last = np.asarray(last_frame)
    truth_np = np.asarray(truth)
    ahead = np.arange(1, truth_np.shape[0] + 1,
                      dtype=truth_np.dtype)[:, None, None]
    extrap = last[None] + (last - prev)[None] * ahead
    mse = np.mean((extrap - truth_np) ** 2, axis=(1, 2))
    cm_extrap = np.asarray(contact_map(jnp.asarray(extrap), threshold))
    cm_true = np.asarray(contact_map(jnp.asarray(truth_np), threshold))
    acc = np.mean(cm_extrap == cm_true, axis=(1, 2))
    return mse, acc


def damped_extrapolation_baseline(prev_frame, last_frame, truth,
                                  gamma: float, threshold: float = 8.0):
    """Per-step metrics of the DAMPED constant-velocity forecast — the
    prior-only rollout of a ``predict_prior="extrapolate"`` /
    ``prior_damping=gamma`` model with a zero head.

    The third honesty bar: when a damped prior is in play, beating
    copy-last AND pure extrapolation is necessary but not sufficient —
    the damped prior alone interpolates between them and can clear both
    with no learning. A model's contribution is only demonstrated
    against ITS OWN prior rolled out headless, which this computes in
    closed form: each step the implied velocity contracts by gamma, so
    ``x_k = last + v * gamma * (1 - gamma^k) / (1 - gamma)`` with
    ``v = last - prev`` (the geometric partial sum; gamma=1 reduces to
    :func:`linear_extrapolation_baseline`, gamma=0 to copy-last).

    prev_frame, last_frame: (R, 3). truth: (T, R, 3). Returns
    (coord_mse, contact_accuracy), each (T,).
    """
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.geometry import contact_map

    prev = np.asarray(prev_frame)
    last = np.asarray(last_frame)
    truth_np = np.asarray(truth)
    t = truth_np.shape[0]
    k = np.arange(1, t + 1, dtype=np.float64)
    if gamma == 1.0:
        coef = k
    else:
        coef = gamma * (1.0 - gamma ** k) / (1.0 - gamma)
    coef = coef.astype(truth_np.dtype)[:, None, None]
    pred = last[None] + (last - prev)[None] * coef
    mse = np.mean((pred - truth_np) ** 2, axis=(1, 2))
    cm_pred = np.asarray(contact_map(jnp.asarray(pred), threshold))
    cm_true = np.asarray(contact_map(jnp.asarray(truth_np), threshold))
    acc = np.mean(cm_pred == cm_true, axis=(1, 2))
    return mse, acc
