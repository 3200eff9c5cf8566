"""Multi-step rollout curriculum: teacher forcing -> free rollout, one graph.

The reference trains purely teacher-forced (single-step targets,
``graph_kernel.py:445-474``) and only rolls out at inference — a train/test
mismatch that drives its rollout collapse (``bba_analysis.ipynb`` cells
19-23). Here the training step itself unrolls K free-rollout steps inside
the jitted graph — step 1 uses the dataset's stored graph (teacher
semantics, ``dataset.py:189``), steps 2..K rebuild the graph on device from
the model's own predictions exactly as inference does (``rollout/scan.py``)
— and the loss is a weighted sum of per-step relative-L2 errors. K=1
reduces to the reference's teacher-forced objective; raising K (optionally
on a schedule) closes the exposure gap without recompilation per stage
(K is static per step function; schedules swap between a small set of
pre-jitted K values).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.models import gkn_apply_single
from molecular_dynamics_neural_operator_tpu.rollout.scan import _step as rollout_step
from molecular_dynamics_neural_operator_tpu.train.loop import featurize_batch
from molecular_dynamics_neural_operator_tpu.train.state import (
    TrainState,
    apply_update,
)


def _example_rel(pred, truth):
    """Per-example relative L2 on flattened coordinates."""
    diff = jnp.linalg.norm((pred - truth).reshape(-1))
    denom = jnp.linalg.norm(truth.reshape(-1))
    return diff / denom


def curriculum_loss_single(
    params,
    cfg: ModelConfig,
    aa,
    window,
    graph0,
    y_seq,
    threshold: float = 8.0,
    step_weights: Optional[Sequence[float]] = None,
    coord_clip: Optional[float] = None,
):
    """K-step rollout loss for one example.

    window: (T, R, 3); graph0: stored graph of the window's first frame;
    y_seq: (K, R, 3) ground-truth continuation. Returns (loss, last_pred).

    ``coord_clip`` bounds the coordinates fed back through the K-step
    unroll — the same safety rail the inference scan has. Without it an
    early-training model can push the inner rollout to inf within K steps
    and inf - inf poisons the loss with NaN (the bf16 curriculum's
    round-1 divergence mode). Clipped coordinates carry zero gradient
    outside the rail, so a diverging unroll contributes a large-but-finite
    loss instead of destroying the step.
    """
    k = y_seq.shape[0]
    weights = (
        jnp.asarray(step_weights, jnp.float32)
        if step_weights is not None
        else jnp.ones((k,), jnp.float32)
    )
    weights = weights / jnp.sum(weights)

    # Step 1: teacher-semantics graph (the stored contact map).
    out = gkn_apply_single(params, cfg, aa, window, graph0)
    loss = weights[0] * _example_rel(out, y_seq[0])
    sq_err = jnp.sum((out - y_seq[0]) ** 2)

    if k > 1:
        if coord_clip is not None:
            out = jnp.clip(out, -coord_clip, coord_clip)
        window = jnp.concatenate([window[1:], out[None]], axis=0)

        def body(carry, inputs):
            window, loss, sq = carry
            y_true, w = inputs
            new_window, out, _ = rollout_step(
                params, cfg, aa, window, threshold, "last", clip=coord_clip
            )
            loss = loss + w * _example_rel(out, y_true)
            sq = sq + jnp.sum((out - y_true) ** 2)
            return (new_window, loss, sq), None

        (window, loss, sq_err), _ = jax.lax.scan(
            body, (window, loss, sq_err), (y_seq[1:], weights[1:])
        )
    return loss, sq_err / (k * y_seq.shape[-2] * y_seq.shape[-1])


def curriculum_loss_batched(
    params,
    cfg: ModelConfig,
    gbatch,
    y_seq,
    threshold: float = 8.0,
    step_weights: Optional[Sequence[float]] = None,
    coord_clip: Optional[float] = None,
    return_overflow: bool = False,
    loss_space: str = "absolute",
    axis_name: Optional[str] = None,
    grad_steps: Optional[int] = None,
    burnin_dtype: Optional[str] = None,
    unroll_scans: bool = False,
    teacher_scatter_hint: Optional[str] = None,
):
    """Whole-batch K-step curriculum loss: ONE scan over rollout steps with
    batched graph rebuild and the batched forward — so the Pallas training
    conv stack (train_conv_impl="pallas") applies inside the curriculum
    too, where the vmapped per-example formulation could not route to it.
    Same math as ``curriculum_loss_single`` summed over the batch.

    ``grad_steps=j`` (1 <= j <= K, default K) supervises only the LAST j
    rollout steps: the first K-j steps are a free-running BURN-IN — the
    model rolls forward on its own predictions (the exposure the
    curriculum exists for) but contributes no loss, and the window handed
    to the supervised span is ``stop_gradient``-detached, so XLA skips
    the burn-in steps' entire backward pass. This is the
    scheduled-sampling credit-assignment model (model-generated inputs,
    no backprop through the generation); the full-BPTT default
    additionally differentiates the rebuild->forward chain across steps.
    Cost: K forwards + j backwards instead of K of each — the backward
    dominates the step (docs/PERFORMANCE.md training anatomy), so
    ``grad_steps=1`` cuts a K=4 curriculum step toward the teacher-forced
    rate while keeping the K-step exposure. Accuracy is recipe-dependent:
    gate it with tools/accuracy_eval.py before adopting.

    y_seq: (B, K, R, 3). Returns (summed loss, mean mse), or with
    ``return_overflow`` (summed loss, (mean mse, overflow)) where overflow
    flags any edge-capacity truncation in the free-step graph rebuilds —
    training on silently truncated graphs is the same condition inference
    reports as ``edge_overflow``.

    ``loss_space="delta"`` normalizes each step's relative L2 by the TRUE
    per-step displacement (``||y_t - y_{t-1}||`` between ground-truth
    frames) instead of the absolute coordinate norm. On slowly varying
    trajectories the absolute form's gradient toward real dynamics is
    ~|delta|/|coords| (1e-4) of its gradient toward the copy-last-frame
    baseline, so optimization parks there — and in bf16 the useful signal
    sits below the compute noise entirely (measured: bf16 ties the
    baseline, f32 beats it). Delta space makes "predict the MOTION" the
    unit-scale objective. Stability (both measured divergence modes):
    the denominator is ground-truth-only under ``stop_gradient`` — an
    earlier formulation normalized free steps by ``||y_t - model_prev||``,
    which shrinks exactly when the model tracks well (unbounded loss) and
    rewards inflating earlier-step error (bigger later denominators) —
    and near-static frames are floored at 10% of the batch-mean
    displacement so noise-only examples cannot dominate the gradient.
    "absolute" (default) is the reference's LpLoss objective
    (graph_kernel.py:445-474).

    ``axis_name``: set when this loss runs inside an explicit ``shard_map``
    over a batch-sharded axis (the Pallas data-parallel route) so the delta
    floor pools the displacement mean over the GLOBAL batch via ``pmean`` —
    otherwise sharded training would floor against per-shard statistics and
    diverge from the single-device objective. Under plain ``jit`` sharding
    propagation, leave None (jnp.mean is already global).

    ``burnin_dtype="bfloat16"``: run the BURN-IN free steps (the
    stop-gradient exposure prefix of ``grad_steps``) with the model body
    in bf16 even when the recipe is f32 — the burn-in's only output is
    the window handed (detached) to the supervised span, so its numerics
    only shift the exposure distribution by bf16 rounding, never the
    gradients' precision. Only meaningful when ``grad_steps < K`` in an
    f32 recipe; ignored otherwise.

    ``unroll_scans=True`` replaces the two ``lax.scan``s with Python
    loops (identical math — the lengths are static). At large node
    counts (config 5, 10k atoms / 400k-edge capacity) XLA's compile of
    a scan-wrapped rollout body over the network-attached dev rig takes
    28+ minutes, while the same body unrolled compiles in minutes; at
    small K the unrolled program is also free of scan-carry layout
    constraints. Protein-sized training keeps the scan (smaller HLO,
    same speed)."""
    from molecular_dynamics_neural_operator_tpu.models import (
        GKNBatch,
        gkn_apply,
    )
    from molecular_dynamics_neural_operator_tpu.rollout.scan import (
        _build_graph,
        rebuilt_scatter_hint,
    )

    b, k = y_seq.shape[0], y_seq.shape[1]
    j = k if grad_steps is None else int(grad_steps)
    if not 1 <= j <= k:
        raise ValueError(
            f"grad_steps must be in [1, K={k}], got {grad_steps}")
    burn = k - j  # leading steps that are exposure-only (no loss/grads)
    weights = (
        jnp.asarray(step_weights, jnp.float32)
        if step_weights is not None
        else jnp.ones((j,), jnp.float32)
    )
    if weights.shape != (j,):
        raise ValueError(
            f"step_weights must have one weight per SUPERVISED step "
            f"(grad_steps={j}), got shape {weights.shape}")
    weights = weights / jnp.sum(weights)

    if loss_space not in ("absolute", "delta"):
        raise ValueError(f"loss_space must be 'absolute' or 'delta', "
                         f"got {loss_space!r}")

    def rel(pred, truth, prev_true):  # per-example relative L2 -> (B,)
        diff = jnp.sqrt(jnp.sum((pred - truth) ** 2, axis=(1, 2)))
        if loss_space == "delta":
            # prev_true is a GROUND-TRUTH frame; no gradient through the
            # normalizer and no model dependence (see docstring).
            denom = jax.lax.stop_gradient(
                jnp.sqrt(jnp.sum((truth - prev_true) ** 2, axis=(1, 2)))
            )
            pooled = jnp.mean(denom)
            if axis_name is not None:
                pooled = jax.lax.pmean(pooled, axis_name)
            denom = jnp.maximum(denom, 0.1 * pooled)
            denom = jnp.maximum(denom, 1e-6)  # all-static batch guard
        else:
            denom = jnp.sqrt(jnp.sum(truth ** 2, axis=(1, 2)))
        return diff / denom

    if burnin_dtype is not None and burn > 0:
        import dataclasses
        cfg_burn = dataclasses.replace(cfg, compute_dtype=burnin_dtype)
    else:
        cfg_burn = cfg

    # Step 1: teacher-semantics stored graph (or, under
    # graph_frame="rebuild", a graph rebuilt on device from the window's
    # last frame — ``teacher_scatter_hint`` then carries the rebuild
    # layout, exactly like the free steps below). Supervised only when the
    # whole horizon is (burn == 0) — otherwise it opens the burn-in (no
    # cotangent reaches it, so it may run at the burn-in dtype).
    out = gkn_apply(params, cfg_burn, gbatch,
                    scatter_hint=teacher_scatter_hint)
    if burn == 0:
        loss_vec = weights[0] * rel(out, y_seq[:, 0], gbatch.window[:, -1])
    else:
        loss_vec = jnp.zeros((b,), jnp.float32)
    sq = jnp.sum((out - y_seq[:, 0]) ** 2, axis=(1, 2))

    overflow = jnp.zeros((), jnp.bool_)
    if k > 1:
        if coord_clip is not None:
            out = jnp.clip(out, -coord_clip, coord_clip)
        window = jnp.concatenate([gbatch.window[:, 1:], out[:, None]],
                                 axis=1)

        def make_free_step(cfg_x):
            def free_step(window, y_t):
                frame = window[:, -1]
                graph, ov = jax.vmap(
                    lambda f: _build_graph(cfg_x, f, threshold)
                )(frame)
                out = gkn_apply(
                    params, cfg_x,
                    GKNBatch(aa=gbatch.aa, window=window, graph=graph,
                             y=y_t),
                    scatter_hint=rebuilt_scatter_hint(
                        cfg_x, gbatch.aa.shape[0]),
                )
                if coord_clip is not None:
                    out = jnp.clip(out, -coord_clip, coord_clip)
                new_window = jnp.concatenate([window[:, 1:], out[:, None]],
                                             axis=1)
                return new_window, out, jnp.any(ov)
            return free_step

        free_step = make_free_step(cfg)
        burn_free_step = (free_step if cfg_burn is cfg
                          else make_free_step(cfg_burn))

        def sup_body(carry, inputs):
            window, loss_vec, sq, ovf = carry
            y_t, y_prev_true, w = inputs  # (B, R, 3) x2, scalar
            new_window, out, ov = free_step(window, y_t)
            loss_vec = loss_vec + w * rel(out, y_t, y_prev_true)
            sq = sq + jnp.sum((out - y_t) ** 2, axis=(1, 2))
            return (new_window, loss_vec, sq, ovf | ov), None

        def burn_body(carry, inputs):
            window, sq, ovf = carry
            (y_t,) = inputs
            new_window, out, ov = burn_free_step(window, y_t)
            sq = sq + jnp.sum((out - y_t) ** 2, axis=(1, 2))
            return (new_window, sq, ovf | ov), None

        y_steps = jnp.swapaxes(y_seq, 0, 1)  # (K, B, R, 3)
        if burn > 1:
            carry = (window, sq, overflow)
            if unroll_scans:
                for t in range(1, burn):
                    carry, _ = burn_body(carry, (y_steps[t],))
            else:
                carry, _ = jax.lax.scan(burn_body, carry,
                                        (y_steps[1:burn],))
            window, sq, overflow = carry
        if burn > 0:
            # The supervised span sees the burn-in rollout as DATA: no
            # cotangent enters the burn-in scan, so its backward never
            # runs (that is the entire cost saving).
            window = jax.lax.stop_gradient(window)
        sup_weights = weights if burn > 0 else weights[1:]
        first_sup = max(burn, 1)  # y_steps index of the first free sup step
        carry = (window, loss_vec, sq, overflow)
        if unroll_scans:
            for i, t in enumerate(range(first_sup, k)):
                carry, _ = sup_body(
                    carry, (y_steps[t], y_steps[t - 1], sup_weights[i]))
        else:
            carry, _ = jax.lax.scan(
                sup_body, carry,
                (y_steps[first_sup:], y_steps[first_sup - 1:-1],
                 sup_weights))
        window, loss_vec, sq, overflow = carry
    r3 = y_seq.shape[-2] * y_seq.shape[-1]
    loss, msem = jnp.sum(loss_vec), jnp.mean(sq / (k * r3))
    if return_overflow:
        return loss, (msem, overflow)
    return loss, msem


def make_curriculum_train_step(
    cfg: ModelConfig,
    tx,
    rollout_steps: int,
    threshold: float = 8.0,
    step_weights: Optional[Sequence[float]] = None,
    graph_frame: str = "first",
    coord_clip: Optional[float] = None,
    loss_space: str = "absolute",
    grad_steps: Optional[int] = None,
    noise_std: float = 0.0,
    burnin_dtype: Optional[str] = None,
    unroll_scans: bool = False,
):
    """Jitted (state, host_batch) -> (state, metrics). The host batch must
    carry ``y_seq`` (B, K, R, 3) (``WindowDataset.get_batch(...,
    rollout_horizon=K)``). ``coord_clip`` bounds the inner free-rollout
    coordinates (essential for bf16 curriculum stability). ``grad_steps``
    supervises only the last j rollout steps (burn-in + truncated
    backprop — see ``curriculum_loss_batched``); ``burnin_dtype`` runs
    that burn-in prefix at a cheaper dtype (see same). ``noise_std``
    corrupts the INITIAL window with GNS-style random-walk noise
    (train/noise.py); the K free steps feed back the model's own (clean)
    predictions as usual — noise widens the input distribution, the
    curriculum exposes the true model-error distribution, and they
    compose."""
    if grad_steps is not None and not 1 <= grad_steps <= rollout_steps:
        raise ValueError(
            f"grad_steps must be in [1, rollout_steps={rollout_steps}], "
            f"got {grad_steps}")
    if graph_frame not in ("first", "last", "rebuild"):
        raise ValueError(f"unknown graph_frame: {graph_frame!r} "
                         "(expected 'first', 'last' or 'rebuild')")
    from molecular_dynamics_neural_operator_tpu.train.noise import (
        noised_window,
    )

    def loss_fn(params, batch):
        if graph_frame == "rebuild":
            # Rebuild the TEACHER step's graph on device from the window's
            # last frame — the same geometry the free steps and the
            # inference rollout use (rollout/scan.py graph_frame="last").
            # The reference trains on the stored window-START graph
            # (dataset.py:189,197) but rolls out on last-frame rebuilds
            # (graph_kernel.py:363); on quasi-static data the mismatch is
            # invisible, but when real per-frame motion carries the signal
            # (the Langevin benchmark family) the force correction depends
            # on CURRENT pair geometry, which only this mode feeds the
            # edge-conditioned conv at train time.
            from molecular_dynamics_neural_operator_tpu.models import (
                GKNBatch,
            )
            from molecular_dynamics_neural_operator_tpu.rollout.scan import (
                _build_graph,
                rebuilt_scatter_hint,
            )
            frame = batch["window"][:, -1]
            graph, ov0 = jax.vmap(
                lambda f: _build_graph(cfg, f, threshold)
            )(frame)
            gbatch = GKNBatch(aa=batch["aa"], window=batch["window"],
                              graph=graph, y=batch["y"])
            loss, (m, ovf) = curriculum_loss_batched(
                params, cfg, gbatch, batch["y_seq"], threshold,
                step_weights, coord_clip, return_overflow=True,
                loss_space=loss_space, grad_steps=grad_steps,
                burnin_dtype=burnin_dtype, unroll_scans=unroll_scans,
                teacher_scatter_hint=rebuilt_scatter_hint(
                    cfg, batch["aa"].shape[0]),
            )
            return loss, (m, ovf | jnp.any(ov0))
        gbatch = featurize_batch(cfg, batch, graph_frame)
        return curriculum_loss_batched(
            params, cfg, gbatch, batch["y_seq"], threshold, step_weights,
            coord_clip, return_overflow=True, loss_space=loss_space,
            grad_steps=grad_steps, burnin_dtype=burnin_dtype,
            unroll_scans=unroll_scans,
        )

    @jax.jit
    def step(state: TrainState, batch):
        k = batch["y_seq"].shape[1]
        if k != rollout_steps:
            # K is taken from the batch; a horizon mismatch would silently
            # train a different objective than configured (the FNO
            # counterpart validates identically, models/fno.py).
            raise ValueError(
                f"batch carries y_seq with K={k} but the step was built "
                f"with rollout_steps={rollout_steps} — assemble batches "
                f"with get_batch(..., rollout_horizon={rollout_steps})"
            )
        if noise_std > 0.0:
            batch = dict(
                batch,
                window=noised_window(batch["window"], state.rng,
                                     state.step, noise_std),
            )
        (l2, (m, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        return apply_update(state, grads, tx), {
            "rel_l2": l2, "mse": m, "edge_overflow": overflow,
        }

    return step
