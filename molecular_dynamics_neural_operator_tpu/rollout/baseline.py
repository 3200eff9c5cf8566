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
