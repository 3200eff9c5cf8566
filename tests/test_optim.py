"""Optimizer-factory semantics: gradient accumulation (``grad_accum``),
finiteness-guard ordering, and StepLR boundary units.

The reference trains with plain Adam+StepLR (``graph_kernel.py:541-546``)
and has no accumulation; ``grad_accum`` exists for memory-capped
large-system training (10k atoms force B=1 — the (E, w, w) kernel tensor
is GB-scale per example) where batch diversity must come from averaging
micro-batch gradients instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.train.optim import (
    make_optimizer,
    step_lr_schedule,
)


def _apply(tx, state, params, grads):
    updates, state = tx.update(grads, state, params)
    return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), state


def _params():
    return {"w": jnp.arange(4, dtype=jnp.float32) / 3.0,
            "b": jnp.float32(0.5)}


def _grad(seed):
    k = jax.random.PRNGKey(seed)
    ka, kb = jax.random.split(k)
    return {"w": jax.random.normal(ka, (4,), jnp.float32),
            "b": jax.random.normal(kb, (), jnp.float32)}


def test_grad_accum_matches_mean_gradient_step():
    """k accumulated micro-batches == ONE plain-optimizer apply on the
    mean gradient (the MultiSteps contract: clipping and the Adam moments
    see the averaged gradient, not the micro-batch gradients)."""
    k = 4
    kwargs = dict(lr=1e-2, weight_decay=5e-4, scheduler_step=50,
                  scheduler_gamma=0.8, steps_per_epoch=1,
                  grad_clip_norm=1.0)
    tx_acc, _ = make_optimizer(grad_accum=k, **kwargs)
    tx_ref, _ = make_optimizer(**kwargs)

    grads = [_grad(s) for s in range(k)]
    mean_grad = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *grads)

    p_acc = _params()
    s_acc = tx_acc.init(p_acc)
    for g in grads[:-1]:
        p_mid, s_acc = _apply(tx_acc, s_acc, p_acc, g)
        # accumulate-only micro-steps emit zero updates
        assert jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: jnp.allclose(a, b), p_mid, p_acc))
        p_acc = p_mid
    p_acc, s_acc = _apply(tx_acc, s_acc, p_acc, grads[-1])

    p_ref = _params()
    p_ref, _ = _apply(tx_ref, tx_ref.init(p_ref), p_ref, mean_grad)

    np.testing.assert_allclose(np.asarray(p_acc["w"]),
                               np.asarray(p_ref["w"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_acc["b"]),
                               np.asarray(p_ref["b"]), rtol=1e-5)


def test_grad_accum_nonfinite_microbatch_is_dropped_before_accumulation():
    """apply_if_finite sits OUTSIDE MultiSteps: a NaN micro-batch is
    rejected before it can poison the accumulation window — the remaining
    finite micro-batches still produce a finite apply."""
    tx, _ = make_optimizer(lr=1e-2, weight_decay=0.0, scheduler_step=50,
                           scheduler_gamma=0.8, steps_per_epoch=1,
                           grad_accum=2, skip_nonfinite_updates=True)
    p = _params()
    s = tx.init(p)
    bad = jax.tree_util.tree_map(lambda g: g * jnp.nan, _grad(0))
    p, s = _apply(tx, s, p, bad)          # dropped, window untouched
    p, s = _apply(tx, s, p, _grad(1))     # micro-step 1 of 2
    p, s = _apply(tx, s, p, _grad(2))     # micro-step 2 of 2 -> apply
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(p))
    # the window's apply actually moved the params
    assert not np.allclose(np.asarray(p["w"]),
                           np.asarray(_params()["w"]))


def test_grad_accum_steplr_boundary_counts_optimizer_applies():
    """steps_per_epoch stays in micro-step units; the schedule boundary is
    rescaled so StepLR still decays per *epoch* (the inner chain's count
    only advances on real applies)."""
    lr, gamma = 1e-2, 0.5
    _, sched = make_optimizer(lr=lr, weight_decay=0.0, scheduler_step=2,
                              scheduler_gamma=gamma, steps_per_epoch=8,
                              grad_accum=4)
    # 8 micro-steps/epoch at accum 4 -> 2 applies/epoch; StepLR(2 epochs)
    # -> boundary at 4 applies.
    assert float(sched(3)) == pytest.approx(lr)
    assert float(sched(4)) == pytest.approx(lr * gamma)
    # sanity: unaccumulated schedule has the boundary at 16 micro-steps
    plain = step_lr_schedule(lr, 2, gamma, 8)
    assert float(plain(15)) == pytest.approx(lr)
    assert float(plain(16)) == pytest.approx(lr * gamma)


def test_grad_accum_steplr_boundary_ceil_division():
    """steps_per_epoch < grad_accum must NOT collapse the boundary to one
    apply (floor division gave 0 applies/epoch -> decay every step);
    non-divisible epochs round UP so the schedule never decays early."""
    lr, gamma = 1e-2, 0.5
    # 10 micro-steps/epoch at accum 16 -> ceil = 1 apply/epoch;
    # StepLR(50 epochs) -> boundary at apply 50, NOT 1.
    _, sched = make_optimizer(lr=lr, weight_decay=0.0, scheduler_step=50,
                              scheduler_gamma=gamma, steps_per_epoch=10,
                              grad_accum=16)
    assert float(sched(49)) == pytest.approx(lr)
    assert float(sched(50)) == pytest.approx(lr * gamma)
    # 10 micro-steps at accum 3 -> ceil = 4 applies/epoch, boundary at
    # 2 * 4 = 8 applies (floor would put it at 6)
    _, sched2 = make_optimizer(lr=lr, weight_decay=0.0, scheduler_step=2,
                               scheduler_gamma=gamma, steps_per_epoch=10,
                               grad_accum=3)
    assert float(sched2(7)) == pytest.approx(lr)
    assert float(sched2(8)) == pytest.approx(lr * gamma)
