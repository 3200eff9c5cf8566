"""The flagship curriculum training recipe, in ONE place.

Teacher-forced (K=1) warmup then K-step rollout curriculum, with the
known-good stabilizers (grad clip + skip-nonfinite + the coord-clip rail).
tools/accuracy_eval.py, tools/fast_folder_eval.py and
tools/reference_parity.py all train with this function — previously three
drifting copies of the same loop.
"""

from __future__ import annotations

import math
import time

import jax

from molecular_dynamics_neural_operator_tpu.data import batch_iterator
from molecular_dynamics_neural_operator_tpu.train.curriculum import (
    make_curriculum_train_step,
)
from molecular_dynamics_neural_operator_tpu.train.state import (
    create_train_state,
)


def train_curriculum_recipe(
    cfg,
    tcfg,
    dataset,
    train_indices,
    *,
    steps: int,
    k: int = 4,
    warmup_frac: float = 0.25,
    coord_clip: float | None = 1000.0,
    threshold: float = 8.0,
    seed: int = 0,
    log_every: int = 200,
    log_prefix: str = "",
    min_warmup: int = 200,
    loss_space: str = "absolute",
    grad_steps="default",
    burnin_dtype: str | None = None,
    noise_std: float = 0.0,
    divergence_limit: int = 4,
    on_divergence: str = "abort",
    max_backoffs: int = 2,
    explosion_factor: float = 1e4,
    graph_frame: str = "first",
):
    """Train ``steps`` optimizer steps: the first ``warmup_frac`` fraction
    (at least ``min_warmup`` steps) teacher-forced (K=1), the rest with the
    K-step rollout-in-the-loss — the warmup -> K switch happens exactly at
    the step boundary, mid-epoch if needed. Returns
    (state, seconds, last_logged_loss).

    ``divergence_limit``: stop early once this many CONSECUTIVE ``log_every``
    checkpoints report a BAD loss — non-finite, or finite but more than
    ``explosion_factor`` times the best loss logged so far (the coord-clip
    rail keeps an exploded unroll finite: a full-scale f32 lr=5e-4 run sat
    at loss ~1.4e11 for thousands of steps without a single NaN).
    ``skip_nonfinite_updates`` freezes the params on a bad gradient, but
    once they have drifted into a region where every K-step unroll
    overflows, no later batch can recover — observed on a full-scale f32
    lr=1e-3 campaign that burned 17,000 steps of chip time producing NaN
    after step 4,000. Checked only at the existing log reads (a per-step
    device read would cost ~0.4 s each over the dev tunnel). What happens
    then is ``on_divergence``:

    - ``"abort"`` (default): raise RuntimeError naming the first bad log
      so the recipe (lr, clip) gets fixed instead of the artifact
      silently reporting a dead run.
    - ``"backoff"``: self-heal — restore the last params that produced a
      finite logged loss, halve the learning rate (fresh optimizer state;
      the StepLR schedule restarts), and continue from the same step
      count. At most ``max_backoffs`` recoveries, then abort as above.
      Each recovery re-jits the step functions (minutes over the dev
      tunnel) — expensive, but strictly cheaper than a dead campaign.

    ``divergence_limit=0`` disables both.

    ``grad_steps``: "default" resolves to 1 — truncated backprop through
    only the LAST curriculum step, with the K-1 burn-in rollout under
    stop_gradient. Measured a strict win on this recipe: 2.26x faster
    end-to-end with equal-or-better rollout quality
    (tools/accuracy_results_grad_steps_j1.json). Pass ``None`` for full
    backprop through all K steps, or an explicit j in [1, K]."""
    import dataclasses

    if grad_steps == "default":
        grad_steps = 1 if k > 1 else None

    lr_scale, backoffs = 1.0, 0

    def build(tcfg_eff):
        state, tx, _ = create_train_state(
            jax.random.PRNGKey(seed), cfg, tcfg_eff,
            steps_per_epoch=max(1, len(train_indices) // tcfg.batch_size),
        )
        step_k1 = make_curriculum_train_step(
            cfg, tx, rollout_steps=1, threshold=threshold,
            coord_clip=coord_clip, loss_space=loss_space,
            noise_std=noise_std, graph_frame=graph_frame,
        )
        step_k = make_curriculum_train_step(
            cfg, tx, rollout_steps=k, threshold=threshold,
            coord_clip=coord_clip, loss_space=loss_space,
            grad_steps=grad_steps, noise_std=noise_std,
            burnin_dtype=burnin_dtype, graph_frame=graph_frame,
        )
        return state, step_k1, step_k

    state, step_k1, step_k = build(tcfg)
    good_params = state.params
    warmup = max(min_warmup, int(steps * warmup_frac))

    t0 = time.time()
    seen, epoch, last_loss = 0, 0, None
    bad_logs, first_bad, best_loss = 0, None, None
    while seen < steps:
        k_now = 1 if seen < warmup else k
        for batch in batch_iterator(dataset, train_indices, tcfg.batch_size,
                                    seed=seed, epoch=epoch,
                                    rollout_horizon=k_now):
            state, m = (step_k1 if k_now == 1 else step_k)(state, batch)
            seen += 1
            if seen % log_every == 0:
                last_loss = float(m["rel_l2"])
                print(f"{log_prefix}step {seen}: loss {last_loss:.4f} "
                      f"(K={k_now}, {time.time() - t0:.0f}s)", flush=True)
                if divergence_limit:
                    exploded = (
                        best_loss is not None
                        and last_loss > explosion_factor
                        * max(best_loss, 1e-30)
                    )
                    if math.isfinite(last_loss) and not exploded:
                        bad_logs, first_bad = 0, None
                        good_params = state.params
                        best_loss = (last_loss if best_loss is None
                                     else min(best_loss, last_loss))
                    else:
                        bad_logs += 1
                        if first_bad is None:
                            first_bad = seen
                        if bad_logs >= divergence_limit:
                            if (on_divergence == "backoff"
                                    and backoffs < max_backoffs):
                                backoffs += 1
                                lr_scale *= 0.5
                                print(
                                    f"{log_prefix}DIVERGED at step "
                                    f"<= {first_bad}: restoring last-good "
                                    f"params, lr x{lr_scale} "
                                    f"(backoff {backoffs}/{max_backoffs})",
                                    flush=True,
                                )
                                state, step_k1, step_k = build(
                                    dataclasses.replace(
                                        tcfg, lr=tcfg.lr * lr_scale)
                                )
                                state = state._replace(params=good_params)
                                bad_logs, first_bad = 0, None
                                break  # fresh epoch iterator
                            raise RuntimeError(
                                f"training diverged: the logged loss has "
                                f"been non-finite or exploded (>{
                                explosion_factor:g}x the best logged "
                                f"loss) for {bad_logs} consecutive "
                                f"checkpoints (since step <= {first_bad})"
                                f" — lower the lr or tighten grad/coord "
                                f"clipping"
                            )
            if seen >= steps:
                # Always report the FINAL step's loss, even when the run
                # is shorter than log_every (last_loss would stay None and
                # crash callers that format it).
                last_loss = float(m["rel_l2"])
                break
            if k_now == 1 and seen >= warmup:
                # Cross the warmup -> K boundary MID-epoch: the batch
                # iterator was built with rollout_horizon=1, so restart it
                # at horizon=k. Without this, any run whose epoch length
                # exceeded the remaining step budget (e.g. a one-epoch
                # full-scale campaign) silently trained teacher-forced for
                # its entire "curriculum" phase.
                break
        epoch += 1
    return state, time.time() - t0, last_loss
