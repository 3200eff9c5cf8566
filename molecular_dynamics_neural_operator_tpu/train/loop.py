"""Jitted train/eval steps and host epoch loops.

Replaces the reference's ``train``/``validate``
(``/root/reference/graph_kernel.py:445-493``). Loss semantics are identical:
``LpLoss(size_average=False)`` — the *sum* over the batch of per-example
relative L2 errors on (R*3)-flattened coordinates (``graph_kernel.py:461-462,
547``) — with plain MSE tracked alongside (``:449,465``). Per-epoch numbers
are the mean over batches, like the reference's ``avg_loss /= len(loader)``.

Featurization (edge features from window coordinates, adjacency masking) is
fused into the jitted step: the host ships only coordinates + adjacency,
and the device builds the graph (geometry/contact.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.geometry import (
    dense_edge_features,
    edge_features_from_edges,
)
from molecular_dynamics_neural_operator_tpu.models import (
    DenseGraph,
    GKNBatch,
    SparseGraph,
    gkn_apply,
    lp_rel,
    mse,
)
from molecular_dynamics_neural_operator_tpu.train.state import (
    TrainState,
    apply_update,
)


def featurize_batch(cfg: ModelConfig, batch: dict, graph_frame: str = "first") -> GKNBatch:
    """Build the on-device GKNBatch from a host batch dict.

    graph_frame: which window frame edge features come from. "first" matches
    the reference's training dataset (``dataset.py:189,197``), "last" its
    rollout rebuild (``graph_kernel.py:363``).
    """
    if graph_frame not in ("first", "last"):
        raise ValueError(f"unknown graph_frame: {graph_frame!r} "
                         "(expected 'first' or 'last')")
    window = batch["window"]
    frame = window[:, 0] if graph_frame == "first" else window[:, -1]
    if "adj" in batch:
        graph = DenseGraph(adj=batch["adj"], edge_feats=dense_edge_features(frame))
    else:
        edge_feats = jax.vmap(edge_features_from_edges)(frame, batch["edges"])
        graph = SparseGraph(
            edges=batch["edges"], mask=batch["mask"], edge_feats=edge_feats
        )
    return GKNBatch(aa=batch["aa"], window=window, graph=graph, y=batch["y"])


def _loss_fn(params, cfg: ModelConfig, gbatch: GKNBatch):
    out = gkn_apply(params, cfg, gbatch)  # (B, R, 3)
    b = out.shape[0]
    l2 = lp_rel(
        out.reshape(b, -1), gbatch.y.reshape(b, -1), size_average=False
    )
    m = mse(out, gbatch.y)
    return l2, (m, out)


def make_train_step(cfg: ModelConfig, tx, graph_frame: str = "first",
                    donate: bool = True, noise_std: float = 0.0):
    """Returns jitted (state, host_batch) -> (state, metrics).

    ``noise_std > 0`` corrupts the input window with GNS-style
    random-walk noise (train/noise.py) while the target stays clean, so
    the model learns to correct drifting inputs — the rollout-robustness
    trick the reference's teacher-forced objective lacks. Edge FEATURES
    follow the noised coordinates (featurize rebuilds them from the
    frame); edge CONNECTIVITY stays the stored contact map, whose 8 A
    threshold dwarfs the noise scale."""
    from molecular_dynamics_neural_operator_tpu.train.noise import (
        noised_window,
    )

    def step(state: TrainState, batch: dict):
        if noise_std > 0.0:
            batch = dict(
                batch,
                window=noised_window(batch["window"], state.rng,
                                     state.step, noise_std),
            )
        gbatch = featurize_batch(cfg, batch, graph_frame)
        (l2, (m, _)), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state.params, cfg, gbatch
        )
        new_state = apply_update(state, grads, tx)
        return new_state, {"rel_l2": l2, "mse": m}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: ModelConfig, graph_frame: str = "first"):
    """Eval step honoring an optional per-example 0/1 weight vector
    ``batch["w"]`` (batch_iterator's ``pad_last``): padded duplicate rows
    contribute nothing, so every eval batch shares one static shape and
    the remainder batch never triggers a recompile."""
    import jax.numpy as jnp

    def step(params, batch: dict):
        gbatch = featurize_batch(cfg, batch, graph_frame)
        out = gkn_apply(params, cfg, gbatch)
        b = out.shape[0]
        w = batch.get("w")
        if w is None:
            w = jnp.ones((b,), jnp.float32)
        diff = (out - gbatch.y).reshape(b, -1)
        truth = gbatch.y.reshape(b, -1)
        per_rel = jnp.linalg.norm(diff, axis=1) / jnp.linalg.norm(truth,
                                                                  axis=1)
        l2 = jnp.sum(per_rel * w)  # LpLoss(size_average=False) convention
        per_sq = jnp.sum(diff * diff, axis=1)
        m = jnp.sum(per_sq * w) / (jnp.sum(w) * diff.shape[1])
        # "n" (real-example count) lets eval_epoch weight the padded
        # remainder batch by its true size instead of as a full batch.
        return {"rel_l2": l2, "mse": m, "n": jnp.sum(w)}

    return jax.jit(step)


def train_epoch(state, train_step, dataset, indices, batch_size, *,
                shuffle=True, drop_last=True, seed=0, epoch=0,
                put: Optional[Callable] = None, rollout_horizon: int = 0,
                prefetch: int = 2):
    """Host loop over one epoch.

    ``put`` maps a host batch to device arrays (``parallel.shard_batch``
    for a mesh; plain ``device_put`` by default). Batches flow through the
    double-buffered ``prefetch_to_device`` pipeline (the TPU replacement
    for the reference's DataLoader worker knobs,
    ``graph_kernel.py:332-335,515-519``) so host assembly and the
    host->HBM transfer hide behind device compute, and per-step metrics
    are materialized ONCE at epoch end instead of syncing every step —
    the device queue runs ahead of the host. ``rollout_horizon=K``
    attaches y_seq for the curriculum step. The returned metrics include
    the epoch's ``steps_per_sec`` / ``examples_per_sec``."""
    from molecular_dynamics_neural_operator_tpu.data import batch_iterator
    from molecular_dynamics_neural_operator_tpu.data.prefetch import (
        prefetch_to_device,
    )
    from molecular_dynamics_neural_operator_tpu.utils.profiling import (
        StepTimer,
    )

    batches = batch_iterator(
        dataset, indices, batch_size, shuffle=shuffle, drop_last=drop_last,
        seed=seed, epoch=epoch, rollout_horizon=rollout_horizon,
    )
    timer = StepTimer(warmup=1)
    acc = []
    for batch in prefetch_to_device(batches, size=prefetch, put=put):
        state, metrics = train_step(state, batch)
        acc.append(metrics)
        timer.tick(examples=batch_size)
    if not acc:
        return state, {"rel_l2": 0.0, "mse": 0.0,
                       "steps_per_sec": 0.0, "examples_per_sec": 0.0}
    n = len(acc)
    # Materialize ALL per-step metrics in ONE transfer (2N separate
    # float() reads would pay 2N tunnel round-trips on a remote backend),
    # which also forces device completion BEFORE reading the timer: ticks
    # fire at dispatch time, and the whole epoch may still be in flight
    # here (the deferred-materialization design).
    acc = jax.device_get(acc)
    timer.stop()
    total = {
        k: sum(float(m[k]) for m in acc) / n for k in ("rel_l2", "mse")
    }
    total["steps_per_sec"] = timer.steps_per_sec
    total["examples_per_sec"] = timer.examples_per_sec
    return state, total


def eval_epoch(params, eval_step, dataset, indices, batch_size, *,
               drop_last=False, put: Optional[Callable] = None):
    """Evaluation keeps the remainder batch by default (unlike training,
    which drops it for static shapes like the reference's loaders) — with
    drop_last a validation set smaller than the batch size would silently
    evaluate nothing. An empty evaluation returns NaN, not 0.0, so a
    meaningless loss can never become the "best" checkpoint."""
    from molecular_dynamics_neural_operator_tpu.data import batch_iterator
    from molecular_dynamics_neural_operator_tpu.data.prefetch import (
        prefetch_to_device,
    )

    acc = []
    for batch in prefetch_to_device(
        batch_iterator(dataset, indices, batch_size, shuffle=False,
                       drop_last=drop_last, pad_last=not drop_last),
        size=2, put=put,
    ):
        acc.append(eval_step(params, batch))
    if not acc:
        return {"rel_l2": float("nan"), "mse": float("nan")}
    # one transfer for all per-batch metrics (not one round-trip per value)
    acc = jax.device_get(acc)
    if "n" in acc[0]:
        # rel_l2 is a per-batch SUM over real examples, so dividing the
        # grand total by the batch count already weighs every example
        # equally (the reference's validate() convention — kept for value
        # parity). mse is a per-batch MEAN, where averaging over batches
        # would overweight the remainder batch's few real examples —
        # weight it by real counts instead (equal to the old mean when
        # every batch is full).
        total_n = sum(float(m["n"]) for m in acc)
        rel = sum(float(m["rel_l2"]) for m in acc) / len(acc)
        mse = sum(float(m["mse"]) * float(m["n"]) for m in acc) / total_n
        return {"rel_l2": rel, "mse": mse}
    return {
        k: sum(float(m[k]) for m in acc) / len(acc)
        for k in ("rel_l2", "mse")
    }
