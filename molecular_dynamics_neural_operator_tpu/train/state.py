"""Train state: params + optimizer state + step + PRNG key.

The reference checkpoints ``{epoch, model, optimizer, scheduler}``
(``/root/reference/graph_kernel.py:631-639``) but has no mid-run resume.
Here the full state (including the step counter and RNG key) is one pytree,
so checkpoint/resume is symmetric (SURVEY.md section 5, checkpoint/resume).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig, TrainConfig
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    rng: jax.Array


def apply_update(state: TrainState, grads, tx) -> TrainState:
    """One optimizer application: the single definition of the
    tx.update -> params + updates -> step + 1 sequence used by every step
    factory (GKN teacher/curriculum, FNO, sharded steps) — previously
    seven inline copies that could drift."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u,
                                    state.params, updates)
    return TrainState(params, opt_state, state.step + 1, state.rng)


def create_train_state(
    key,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    steps_per_epoch: int = 1,
):
    """Init params + optimizer. Returns (state, optimizer, schedule)."""
    k_init, k_state = jax.random.split(key)
    params = gkn_init(k_init, model_cfg)
    tx, schedule = make_optimizer(
        lr=train_cfg.lr,
        weight_decay=train_cfg.weight_decay,
        scheduler_step=train_cfg.scheduler_step,
        scheduler_gamma=train_cfg.scheduler_gamma,
        steps_per_epoch=steps_per_epoch,
        grad_clip_norm=train_cfg.grad_clip_norm,
        skip_nonfinite_updates=train_cfg.skip_nonfinite_updates,
        grad_accum=train_cfg.grad_accum,
    )
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
    )
    return state, tx, schedule
