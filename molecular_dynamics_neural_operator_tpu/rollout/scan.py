"""Autoregressive rollout as one jitted ``lax.scan`` — the signature capability.

The reference's free-running inference loop
(``/root/reference/graph_kernel.py:396-413``) crosses the host<->device
boundary twice per step and rebuilds the graph with scipy on the host CPU
(``construct_pairdata``, ``:362-393``) — measured at 80.56 steps/s
(``bba_analysis.ipynb`` cell 20). Here the whole loop — contact-map rebuild
from *predicted* coordinates (8 A threshold), edge featurization, operator
forward, window slide — is a single compiled ``lax.scan`` with zero host
round-trips, and rollout shares the exact forward kernels with training
(one jitted graph for the teacher-forcing -> free-rollout curriculum).

Semantics parity: each step (a) predicts coordinates from the current
window, (b) drops the oldest frame and appends the prediction
(``graph_kernel.py:407-409``), (c) rebuilds the graph from the new window's
LAST frame (``:363``, ``x_position[-1]``). Self-loops are included, as in
the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.geometry import (
    contact_map,
    dense_edge_features,
    edge_features_from_edges,
    padded_edges_device,
)
from molecular_dynamics_neural_operator_tpu.models import (
    DenseGraph,
    SparseGraph,
    gkn_apply_single,
)


def rebuilt_scatter_hint(cfg: ModelConfig, num_nodes: int) -> str | None:
    """Aggregation choice for graphs REBUILT on device inside a rollout or
    curriculum step. Rebuilt graphs are never in the dataset's edge
    layout: ``cell_list_edges`` emits the block layout (slot
    n*max_degree+d targets node n), ``padded_edges_device`` emits
    front-packed CSR. ``cfg.scatter_mode`` describes dataset-PROVIDED
    graphs (``--edge_layout blocked``) and must not leak onto rebuilds —
    a "blocked" setting applied to a CSR-packed rebuild sums arbitrary
    consecutive edge slots into each node, silently corrupting every
    free-rollout step. Returns None in dense mode (no scatter there)."""
    if cfg.graph_mode != "sparse":
        return None
    from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
        SCATTER_ONEHOT_MAX_NODES,
    )

    if (cfg.neighbor_impl == "cell_list"
            and num_nodes > SCATTER_ONEHOT_MAX_NODES):
        return "blocked"
    return ("onehot" if num_nodes <= SCATTER_ONEHOT_MAX_NODES
            else "segment")


def _build_graph(cfg: ModelConfig, frame, threshold: float):
    """Returns (graph, overflow): overflow is True when the rebuild lost
    edges to a static capacity (max_edges for dense_rank; cell capacity or
    max_degree for cell_list) — static shapes cannot raise under jit."""
    if cfg.graph_mode == "dense":
        adj = contact_map(frame, threshold)
        return DenseGraph(adj=adj, edge_feats=dense_edge_features(frame)), \
            jnp.zeros((), jnp.bool_)
    if cfg.neighbor_impl == "cell_list":
        from molecular_dynamics_neural_operator_tpu.geometry.cells import (
            cell_list_edges,
        )

        out = cell_list_edges(frame, threshold, cfg.max_degree,
                              cfg.cell_capacity, cfg.num_cells)
        graph = SparseGraph(
            edges=out.edges, mask=out.mask,
            edge_feats=edge_features_from_edges(frame, out.edges),
        )
        return graph, out.cell_overflow | out.degree_overflow
    adj = contact_map(frame, threshold)
    edges, mask, count = padded_edges_device(adj, cfg.max_edges,
                                             return_count=True)
    graph = SparseGraph(
        edges=edges, mask=mask, edge_feats=edge_features_from_edges(frame, edges)
    )
    return graph, count > cfg.max_edges


def _step(params, cfg: ModelConfig, aa, window, threshold: float,
          graph_frame: str, clip: float | None = None):
    frame = window[-1] if graph_frame == "last" else window[0]
    graph, overflow = _build_graph(cfg, frame, threshold)
    # cell_list_edges emits the block layout (slot n*max_degree + d
    # targets node n), so large-system aggregation can skip the scatter
    # entirely (edge_conv.py "blocked"); small systems keep the one-hot
    # MXU path. The hint is always explicit here: the rebuilt graph's
    # layout is decided by this step, not by cfg.scatter_mode.
    hint = rebuilt_scatter_hint(cfg, aa.shape[0])
    out = gkn_apply_single(params, cfg, aa, window, graph,
                           scatter_hint=hint)  # (R, 3)
    if clip is not None:
        # Safety rail on the feedback loop: bounds the coordinates fed back
        # into the next step so an off-distribution model cannot push the
        # rollout to inf/NaN. No-op for on-distribution predictions.
        out = jnp.clip(out, -clip, clip)
    new_window = jnp.concatenate([window[1:], out[None]], axis=0)
    return new_window, out, overflow


def rollout_scan(
    params,
    cfg: ModelConfig,
    aa,
    window0,
    num_steps: int,
    threshold: float = 8.0,
    graph_frame: str = "last",
    collect: str = "coords",
    clip: float | None = None,
):
    """Roll the operator forward ``num_steps`` steps from window0 (T, R, 3).

    collect: "coords" -> (num_steps, R, 3) predicted coordinates;
    "contact_maps" -> (num_steps, R, R) contact maps of the predictions;
    "both" -> tuple of the two. Returns (collected, final_window).
    """
    if graph_frame not in ("last", "first"):
        # 'last' is the reference rollout semantics (graph_kernel.py:363);
        # an unvalidated typo would silently select window[0].
        raise ValueError(f"unknown graph_frame: {graph_frame!r} "
                         "(expected 'last' or 'first')")

    def body(carry, _):
        window, overflowed = carry
        new_window, out, overflow = _step(params, cfg, aa, window, threshold,
                                          graph_frame, clip)
        if collect == "coords":
            y = out
        elif collect == "contact_maps":
            y = contact_map(out, threshold)
        elif collect == "both":
            y = (out, contact_map(out, threshold))
        else:
            raise ValueError(f"unknown collect mode: {collect}")
        return (new_window, overflowed | overflow), y

    (final_window, overflowed), collected = jax.lax.scan(
        body, (window0, jnp.zeros((), jnp.bool_)), None, length=num_steps
    )
    return collected, final_window, {"edge_overflow": overflowed}


def make_rollout_fn(
    cfg: ModelConfig,
    num_steps: int,
    threshold: float = 8.0,
    graph_frame: str = "last",
    collect: str = "coords",
    batched: bool = False,
    clip: float | None = None,
    stream_chunk: int | None = None,
):
    """Jit-compiled rollout; ``batched=True`` vmaps over leading stream axis
    of window0 for multi-stream throughput.

    ``stream_chunk=C`` (batched mode) processes streams in sequential chunks
    of C via ``lax.map``: peak live state drops from (S, E, w, w) kernel
    tensors to (C, E, w, w), which removes the HBM spill cliff past ~32
    concurrent streams on one chip — total work is identical, only the
    schedule changes. Requires S % C == 0."""
    if stream_chunk is not None and not batched:
        raise ValueError("stream_chunk only applies to batched=True "
                         "rollouts (single-stream has no stream axis)")

    def fn(params, aa, window0):
        return rollout_scan(
            params, cfg, aa, window0, num_steps, threshold, graph_frame,
            collect, clip,
        )

    if batched:
        inner = fn

        def batched_fn(params, aa, window0):
            run = jax.vmap(lambda w: inner(params, aa, w))
            if stream_chunk is None:
                return run(window0)
            s = window0.shape[0]
            if s % stream_chunk:
                raise ValueError(
                    f"stream count {s} not divisible by stream_chunk "
                    f"{stream_chunk}"
                )
            chunked = window0.reshape((s // stream_chunk, stream_chunk)
                                      + window0.shape[1:])
            out = jax.lax.map(run, chunked)
            return jax.tree_util.tree_map(
                lambda x: x.reshape((s,) + x.shape[2:]), out
            )

        fn = batched_fn
    return jax.jit(fn)


def rollout_with_mse(
    params,
    cfg: ModelConfig,
    aa,
    window0,
    truth,
    threshold: float = 8.0,
    graph_frame: str = "last",
    clip: float | None = None,
):
    """Rollout tracking per-step coordinate MSE against ground truth
    (``bba_analysis.ipynb`` cell 19 parity). truth: (num_steps, R, 3)."""

    def body(window, y_true):
        new_window, out, _ = _step(params, cfg, aa, window, threshold,
                                   graph_frame, clip)
        step_mse = jnp.mean((out - y_true) ** 2)
        return new_window, (out, step_mse)

    final_window, (coords, mses) = jax.lax.scan(body, window0, truth)
    return coords, mses, final_window


def rollout_python_loop(
    params,
    cfg: ModelConfig,
    aa,
    window0,
    num_steps: int,
    threshold: float = 8.0,
    graph_frame: str = "last",
):
    """Reference-shaped host loop (one device call per step). Exists only as
    the test oracle for scan-vs-loop equivalence and as the baseline the
    benchmark compares against — mirrors ``recursive_propagation``'s
    per-step host round-trip structure."""
    window = window0

    @jax.jit
    def step(params, aa, window):
        new_window, out, _ = _step(params, cfg, aa, window, threshold,
                                   graph_frame)
        return new_window, out

    outs = []
    for _ in range(num_steps):
        window, out = step(params, aa, window)
        outs.append(jax.device_get(out))  # host round-trip every step
    import numpy as np

    return np.stack(outs), window
