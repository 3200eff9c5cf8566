"""Optimizer and LR schedule, reference-parity.

The reference trains with ``torch.optim.Adam(lr, weight_decay)`` plus
``StepLR(step_size, gamma)`` stepped per *epoch*
(``/root/reference/graph_kernel.py:541-546,622``). Torch's Adam
``weight_decay`` is classic L2 (decay added to the gradient *before* the
Adam moments — not decoupled AdamW), reproduced here with
``optax.add_decayed_weights`` ahead of ``scale_by_adam``.
"""

from __future__ import annotations

import optax


def step_lr_schedule(lr: float, step_size_epochs: int, gamma: float,
                     steps_per_epoch: int):
    """StepLR: lr * gamma^(epoch // step_size), expressed per train-step."""
    boundary = max(1, step_size_epochs * steps_per_epoch)
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=boundary,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizer(
    lr: float = 0.01,
    weight_decay: float = 5e-4,
    scheduler_step: int = 50,
    scheduler_gamma: float = 0.8,
    steps_per_epoch: int = 1,
    grad_clip_norm: float = 0.0,
    skip_nonfinite_updates: bool = False,
    grad_accum: int = 1,
):
    """grad_clip_norm > 0 prepends global-norm clipping, and
    ``skip_nonfinite_updates`` wraps the whole chain in
    ``optax.apply_if_finite`` (a non-finite gradient skips the step instead
    of poisoning the parameters — note clip_by_global_norm alone propagates
    NaN). Both matter for the rollout curriculum, whose unrolled
    multi-step backward can spike; the reference trains purely
    teacher-forced and has no counterpart.

    ``grad_accum > 1`` wraps the chain in ``optax.MultiSteps``: every
    optimizer apply averages that many micro-batch gradients (clipping and
    Adam moments see the *averaged* gradient). ``steps_per_epoch`` stays in
    micro-step units — the StepLR boundary is rescaled internally, because
    the inner chain's step count only advances on real applies. Order vs
    ``apply_if_finite``: the finiteness guard stays OUTERMOST so a
    non-finite micro-batch is dropped before it can poison the
    accumulation window."""
    # ceil division: with floor, steps_per_epoch < grad_accum collapses the
    # boundary to one optimizer apply (decay EVERY apply) and a non-divisible
    # epoch drifts the schedule early each epoch.
    schedule = step_lr_schedule(
        lr, scheduler_step, scheduler_gamma,
        -(-steps_per_epoch // max(1, grad_accum)))
    parts = []
    if grad_clip_norm and grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts += [
        optax.add_decayed_weights(weight_decay),  # torch-Adam-style L2
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*parts)
    if grad_accum and grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    if skip_nonfinite_updates:
        # NOTE: after max_consecutive_errors consecutive non-finite
        # gradients optax gives up and APPLIES the poisoned update — at the
        # old value of 100 a transiently-unstable run was guaranteed to
        # destroy its parameters ~100 steps after the first bad gradient.
        # A large bound keeps the protection effectively permanent; a stall
        # still surfaces as NaN losses in the metrics.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100_000)
    return tx, schedule
