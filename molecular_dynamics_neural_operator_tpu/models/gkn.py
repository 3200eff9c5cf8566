"""Graph Kernel Network (GKN) neural operator — TPU-native.

Capability parity with the reference's ``KernelNN``
(``/root/reference/graph_kernel.py:245-309``):

- per-residue LSTM window encoder over the ``window_size`` coordinate
  frames, keeping the last frame's output (``:279-288``; implemented as a
  time-axis ``lax.scan`` — see ``ops/lstm.py`` for the deliberate fix of the
  reference's batch-axis scanning),
- amino-acid ``Embedding(20, 4)`` concatenated with the encoded positions
  into 7 node features (``:267,292-296``),
- ``fc1`` 7 -> width lift (``:269,298``),
- ``depth``x weight-tied conv1 then ``depth``x conv2, ReLU between
  (``:299-302``), with the **edge-kernel MLP shared between both conv
  stacks** exactly as the reference ties them (``:271-273``; one DenseNet
  instance passed to both NNConv_old constructors) — toggleable via
  ``ModelConfig.tie_edge_kernel``,
- optional latent capture before the head (``:303-304``),
- ``fc2`` width -> 3 coordinate head (``:275,305``).

TPU-first execution strategy (differs from the reference, same math):
kernel matrices are evaluated once per forward and reused across all
2*depth conv applications, and aggregation is matmul-only (see
``ops/edge_conv.py``). The graph is passed explicitly as either a dense
masked adjacency or a padded edge list — no PyG batching, no module-global
config access.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.geometry import degree_from_adjacency
from molecular_dynamics_neural_operator_tpu.ops import (
    edge_conv_dense,
    edge_conv_init,
    edge_conv_sparse,
    edge_kernel_matrices,
    linear_apply,
    linear_init,
    lstm_apply,
    lstm_init,
    mlp_init,
)
from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
    SCATTER_ONEHOT_MAX_NODES,
    sparse_inv_degree,
)
from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (
    AMINO_ACID_CHARGES,
    debye_huckel_at_atoms,
)

Array = jax.Array


class DenseGraph(NamedTuple):
    """All-pairs graph: adjacency mask + all-pairs edge features.

    adj: (..., R, R) 0/1 with [source, target] axis order.
    edge_feats: (..., R, R, 6) = [pos_src ; pos_dst].
    """

    adj: Array
    edge_feats: Array


class SparseGraph(NamedTuple):
    """Fixed-capacity padded edge list.

    edges: (..., 2, E) int32 [src; dst]; mask: (..., E) float32;
    edge_feats: (..., E, 6).
    """

    edges: Array
    mask: Array
    edge_feats: Array


Graph = Union[DenseGraph, SparseGraph]


class GKNBatch(NamedTuple):
    """One training/eval batch.

    aa: (R,) int32 amino-acid labels (shared across the batch — one protein).
    window: (B, T, R, 3) coordinate history.
    graph: DenseGraph or SparseGraph with leading batch axis B.
    y: (B, R, 3) target coordinates (may be a dummy for inference).
    """

    aa: Array
    window: Array
    graph: Graph
    y: Array


def gkn_init(key, cfg: ModelConfig):
    """Initialize all GKN parameters as a pytree."""
    keys = jax.random.split(key, 8)
    w = cfg.width
    params = {
        "emb": jax.random.normal(
            keys[0], (cfg.num_embeddings, cfg.embedding_dim), jnp.float32
        ),
        "lstm": lstm_init(keys[1], cfg.x_position_dim, cfg.x_position_dim),
        "lstm_fc": linear_init(keys[2], cfg.x_position_dim, cfg.x_position_dim),
        "fc1": linear_init(keys[3], _node_in_features(cfg), w),
        "edge_kernel": mlp_init(
            keys[4], [cfg.edge_features, cfg.ker_width, cfg.ker_width, w * w]
        ),
        "conv1": edge_conv_init(keys[5], w),
        "conv2": edge_conv_init(keys[6], w),
        "fc2": linear_init(keys[7], w, cfg.out_width),
    }
    if cfg.legacy_no_lstm:
        # older reference variant (bba_analysis.ipynb cell 8): no window
        # encoder, one conv stack
        for name in ("lstm", "lstm_fc", "conv2"):
            del params[name]
    if not cfg.tie_edge_kernel:
        k2 = jax.random.fold_in(keys[4], 1)
        params["edge_kernel2"] = mlp_init(
            k2, [cfg.edge_features, cfg.ker_width, cfg.ker_width, w * w]
        )
    if getattr(cfg, "head_init", "default") == "zero":
        # GNS-style residual-head init: the step-0 forecast IS the prior
        # (see configs.ModelConfig.head_init for the measured motivation).
        params["fc2"] = jax.tree.map(jnp.zeros_like, params["fc2"])
    elif getattr(cfg, "head_init", "default") != "default":
        raise ValueError(f"unknown head_init: {cfg.head_init!r}")
    scale = getattr(cfg, "kernel_init_scale", 1.0)
    if scale != 1.0:
        # Scale the edge-kernel MLP's final layer so the per-edge kernel
        # matrices start ~scale x smaller — the conv stack's init-forward
        # magnitude compounds through 2*depth layers and overflows f32 at
        # depth 6 / 10k atoms with the torch-default init.
        for name in ("edge_kernel", "edge_kernel2"):
            if name in params:
                last = f"layer_{len(params[name]) - 1}"
                layer = params[name][last]
                params[name][last] = {
                    "w": layer["w"] * scale, "b": layer["b"] * scale,
                }
    return params


def _compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _node_in_features(cfg: ModelConfig) -> int:
    """fc1 input width: the 7 base features plus the electrostatic
    potential when enabled (BASELINE config 5)."""
    return cfg.node_features + (1 if cfg.electrostatics == "dh" else 0)


def _encode_nodes(params, cfg: ModelConfig, aa: Array, window: Array) -> Array:
    """window (T, R, 3) + aa (R,) -> node features (R, width) after fc1+ReLU."""
    if cfg.legacy_no_lstm:
        # legacy variant: node features = [emb ; last-frame coordinates]
        # (the notebook model runs window_size=1, item shape
        # x_position=[28, 3], bba_analysis.ipynb cell 32)
        h = window[-1]
    elif cfg.window_diff:
        # Velocity-form encoding: [last frame ; scaled successive diffs],
        # same (T, R, 3) shape (T-1 diffs + the anchor frame), so the LSTM
        # parameters are unchanged. Raw frames differ by ~1e-4 relative on
        # slow MD data — the recurrence must then recover motion as a
        # catastrophic cancellation of large inputs, and training parks at
        # the copy-last-frame baseline (see configs.ModelConfig).
        diffs = (window[1:] - window[:-1]) * cfg.window_diff_scale
        enc_in = jnp.concatenate([window[-1:], diffs], axis=0)
    else:
        enc_in = window
    if not cfg.legacy_no_lstm:
        h = lstm_apply(params["lstm"], enc_in)  # (R, 3)
        h = linear_apply(params["lstm_fc"], h)
    emb = params["emb"][aa]  # (R, embedding_dim)
    feats = [emb, h]
    if cfg.electrostatics == "dh":
        # On-device screened-Coulomb potential at each residue from the
        # window's LAST frame: recomputed from predicted coordinates every
        # rollout step — the feature the reference's preprocessing computes
        # grids for but never consumes (/root/reference/preprocess.py:79-93).
        phi = debye_huckel_at_atoms(
            window[-1], jnp.asarray(AMINO_ACID_CHARGES)[aa % 20],
            eps_s=cfg.eps_solvent, temperature=cfg.temperature,
            ionic_strength_M=cfg.ionic_strength,
        )
        feats.append(phi[:, None])
    x = jnp.concatenate(feats, axis=-1)  # (R, 7 [+1])
    return jax.nn.relu(linear_apply(params["fc1"], x))


def _head_scale(cfg: ModelConfig) -> float:
    return float(getattr(cfg, "head_scale", 1.0))


def residual_prior(cfg: ModelConfig, window: Array) -> Array:
    """Base forecast corrected by the ``predict_delta`` head. ``window``
    carries the time axis at -3: (T, R, 3) or (B, T, R, 3).

    "last" reproduces copy-last (out = head + x_t, the round-1 residual
    head); "extrapolate" is the GNS-style constant-velocity prior
    (out = head + x_t + gamma (x_t - x_{t-1}), gamma =
    ``cfg.prior_damping``, 1.0 = pure extrapolation): a zero head output
    equals linear extrapolation instead of a frozen frame, so
    optimization starts from the stronger baseline and the head learns
    the acceleration-scale correction. (Motivated by the measured
    10k-atom zero-delta attractor: training with the copy-last prior
    parks AT copy-last even when the next delta is linearly
    representable from the window — docs/PERFORMANCE.md,
    tools/config5_results_rough.json.) gamma < 1 contracts the implied
    velocity toward copy-last each step, bounding long-horizon drift."""
    last = window[..., -1, :, :]
    if cfg.predict_prior == "last":
        return last
    if cfg.predict_prior == "extrapolate":
        if window.shape[-3] < 2:
            raise ValueError(
                "predict_prior='extrapolate' needs a window of >= 2 "
                f"frames, got window_size={window.shape[-3]}"
            )
        gamma = getattr(cfg, "prior_damping", 1.0)
        return last + gamma * (last - window[..., -2, :, :])
    raise ValueError(f"unknown predict_prior: {cfg.predict_prior!r}")


def gkn_apply_single(
    params,
    cfg: ModelConfig,
    aa: Array,
    window: Array,
    graph: Graph,
    return_latent: bool = False,
    scatter_hint: str | None = None,
):
    """Forward one example. window: (T, R, 3). Returns (R, out_width)
    [and the (R, width) latent if requested].

    ``scatter_hint`` overrides the node-count-based aggregation choice
    ("onehot" below 512 nodes, "segment" above). Pass "blocked" ONLY for
    graphs in the cell-list block layout (slot n*max_degree+d targets
    node n, geometry/cells.py) — the rollout scan does this for its own
    rebuilds, turning the large-system scatter into a dense reduction."""
    cd = _compute_dtype(cfg)
    if cfg.legacy_no_lstm and cfg.conv_impl == "pallas":
        raise ValueError(
            "legacy_no_lstm (single conv stack) supports conv_impl='xla' "
            "only — the fused Pallas kernel bakes in both stacks"
        )
    x = _encode_nodes(params, cfg, aa, window)
    w = cfg.width

    kernel2_params = params.get("edge_kernel2", params["edge_kernel"])

    if cfg.kernel_quant not in ("none", "int8"):
        raise ValueError(f"unknown kernel_quant: {cfg.kernel_quant!r}")
    if cfg.kernel_quant != "none" and (
        isinstance(graph, DenseGraph) or cfg.conv_impl == "pallas"
    ):
        raise ValueError(
            "kernel_quant='int8' requires the sparse XLA conv path "
            "(graph_mode='sparse', conv_impl='xla') — the dense and "
            "fused-Pallas paths keep the kernel tensor in bf16"
        )

    if isinstance(graph, DenseGraph):
        kernels = edge_kernel_matrices(
            params["edge_kernel"], graph.edge_feats, w, compute_dtype=cd
        )
        masked = (kernels * graph.adj[..., None, None]).astype(cd)
        inv_deg = 1.0 / degree_from_adjacency(graph.adj)
        if cfg.tie_edge_kernel:
            masked2 = masked
        else:
            k2 = edge_kernel_matrices(
                kernel2_params, graph.edge_feats, w, compute_dtype=cd
            )
            masked2 = (k2 * graph.adj[..., None, None]).astype(cd)
        for _ in range(cfg.depth):
            x = jax.nn.relu(
                edge_conv_dense(params["conv1"], x, masked, inv_deg, cd)
            )
        if not cfg.legacy_no_lstm:
            for _ in range(cfg.depth):
                x = jax.nn.relu(
                    edge_conv_dense(params["conv2"], x, masked2, inv_deg,
                                    cd)
                )
    elif cfg.conv_impl == "pallas":
        # Fused TPU kernel: edge-kernel MLP + both conv stacks in one
        # pallas_call with weights and the kernel tensor VMEM-resident
        # (ops/pallas/fused_gkn.py). Interpret mode off-TPU keeps the path
        # testable on CPU.
        from molecular_dynamics_neural_operator_tpu.ops.pallas import (
            fused_gkn,
        )

        x = fused_gkn.fused_conv_stack_from_graph(
            params, cfg, x, graph.edges, graph.mask, graph.edge_feats,
            interpret=not fused_gkn.pallas_available(),
        )
    else:
        kfn = functools.partial(edge_kernel_matrices, width=w,
                                compute_dtype=cd)
        if cfg.remat_edge_mlp:
            kfn = jax.checkpoint(kfn)
        kernels = kfn(params["edge_kernel"], graph.edge_feats)
        if cfg.tie_edge_kernel:
            kernels2 = kernels
        else:
            kernels2 = kfn(kernel2_params, graph.edge_feats)
        num_nodes = aa.shape[0]
        from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
            SCATTER_ONEHOT_MAX_NODES,
        )

        if cfg.scatter_mode != "auto" and scatter_hint is None:
            scatter_hint = cfg.scatter_mode
        scatter = scatter_hint or (
            "onehot" if num_nodes <= SCATTER_ONEHOT_MAX_NODES
            else "segment"
        )
        inv_deg = sparse_inv_degree(graph.edges, graph.mask, num_nodes,
                                    scatter)
        # int8 serving mode: store the kernel tensor as int8 and fold the
        # per-edge dequantization scale into the message mask — the convs
        # below run unmodified (the astype load dequantizes in the fused
        # reduction) and the per-layer HBM re-read halves.
        msg_mask = msg_mask2 = graph.mask
        if cfg.kernel_quant == "int8":
            from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
                quantize_kernels_int8,
            )

            kernels, kscale = quantize_kernels_int8(kernels)
            msg_mask = graph.mask * kscale
            if cfg.tie_edge_kernel:
                kernels2, msg_mask2 = kernels, msg_mask
            else:
                kernels2, kscale2 = quantize_kernels_int8(kernels2)
                msg_mask2 = graph.mask * kscale2
        if (cfg.fused_conv_vjp and cfg.tie_edge_kernel
                and scatter == "onehot" and cfg.depth > 0
                and cfg.kernel_quant == "none"
                and not cfg.legacy_no_lstm):
            # Hand-written VJP over the whole tied stack: one-pass
            # kernel-tensor gradient (ops/conv_stack.py).
            from molecular_dynamics_neural_operator_tpu.ops.conv_stack import (
                tied_conv_stack,
            )

            rng_nodes = jnp.arange(num_nodes)
            g1h = (graph.edges[0][:, None] == rng_nodes[None, :]).astype(cd)
            d1h = (graph.edges[1][:, None] == rng_nodes[None, :]).astype(cd)
            x = tied_conv_stack(
                cfg.depth, cd, x, kernels, g1h, d1h, graph.mask, inv_deg,
                params["conv1"]["root"], params["conv1"]["bias"],
                params["conv2"]["root"], params["conv2"]["bias"],
            )
        else:
            for _ in range(cfg.depth):
                x = jax.nn.relu(
                    edge_conv_sparse(
                        params["conv1"], x, kernels, graph.edges, msg_mask,
                        inv_deg, scatter, cd,
                    )
                )
            if not cfg.legacy_no_lstm:
                for _ in range(cfg.depth):
                    x = jax.nn.relu(
                        edge_conv_sparse(
                            params["conv2"], x, kernels2, graph.edges,
                            msg_mask2, inv_deg, scatter, cd,
                        )
                    )

    latent = x
    out = linear_apply(params["fc2"], x)
    if cfg.predict_delta:
        # Residual prediction: head outputs a displacement from the prior
        # forecast (copy-last or constant-velocity, residual_prior),
        # scaled by head_scale (GNS target normalization — see
        # configs.ModelConfig.head_scale). New capability — the reference
        # predicts absolute coordinates, graph_kernel.py:305, which
        # destabilizes free rollout.
        out = _head_scale(cfg) * out + residual_prior(cfg, window)
    if return_latent:
        return out, latent
    return out


def gkn_apply(
    params,
    cfg: ModelConfig,
    batch: GKNBatch,
    return_latent: bool = False,
    scatter_hint: str | None = None,
):
    """Batched forward via vmap over the batch axis of window and graph.

    With ``train_conv_impl="pallas"`` (sparse + tied, TPU) the conv stack
    instead runs as one batched Pallas kernel with the per-edge kernel
    tensor VMEM-resident across all 2*depth layers — forward and backward
    (ops/pallas/train_conv.py).

    ``scatter_hint`` overrides ``cfg.scatter_mode`` for the vmapped
    sparse path — callers whose graphs were rebuilt on device (curriculum
    free steps) pass ``rollout.scan.rebuilt_scatter_hint`` so a
    "blocked" dataset layout setting never mis-reduces CSR-packed
    rebuilds. The Pallas batched path is layout-agnostic (it builds
    incidence from the actual edge indices) and ignores it."""
    if (cfg.train_conv_impl == "pallas"
            and isinstance(batch.graph, SparseGraph)
            and cfg.tie_edge_kernel and cfg.depth > 0
            and cfg.kernel_quant == "none"
            and not cfg.legacy_no_lstm
            # same node-count bound as the one-hot scatter path: the
            # kernel builds (B, E, R) incidence tensors and per-example
            # VMEM blocks — large systems stay on the segment/XLA path
            and batch.aa.shape[0] <= SCATTER_ONEHOT_MAX_NODES):
        return _gkn_apply_pallas_batched(params, cfg, batch, return_latent)
    fn = lambda window, graph: gkn_apply_single(
        params, cfg, batch.aa, window, graph, return_latent,
        scatter_hint=scatter_hint,
    )
    return jax.vmap(fn)(batch.window, batch.graph)


def _gkn_apply_pallas_batched(params, cfg: ModelConfig, batch: GKNBatch,
                              return_latent: bool):
    from molecular_dynamics_neural_operator_tpu.ops.mlp import mlp_apply
    from molecular_dynamics_neural_operator_tpu.ops.pallas.train_conv import (
        kernel_permutation,
        pallas_available,
        pallas_tied_conv_stack,
    )

    cd = _compute_dtype(cfg)
    graph: SparseGraph = batch.graph
    x = jax.vmap(
        lambda window: _encode_nodes(params, cfg, batch.aa, window)
    )(batch.window)                                        # (B, R, w)
    w = cfg.width
    r = batch.aa.shape[0]

    # kernel tensor straight in the TILE layout (column-permuted last MLP
    # layer; autodiff through the gather handles the weight gradient),
    # pre-masked so the kernel never needs the mask.
    perm = kernel_permutation(w)
    mlp = params["edge_kernel"]
    mlp_perm = {
        **mlp,
        "layer_2": {"w": mlp["layer_2"]["w"][:, perm],
                    "b": mlp["layer_2"]["b"][perm]},
    }
    kt = mlp_apply(mlp_perm, graph.edge_feats, compute_dtype=cd).astype(cd)
    kt = kt * graph.mask[..., None].astype(cd)             # (B, E, w^2)

    rng_nodes = jnp.arange(r)
    g1h = (graph.edges[:, 0, :, None] == rng_nodes).astype(cd)  # (B, E, R)
    d1h = (graph.edges[:, 1, :, None] == rng_nodes).astype(cd)
    inv_deg = jax.vmap(
        lambda e, m: sparse_inv_degree(e, m, r, "onehot")
    )(graph.edges, graph.mask)[..., None]                  # (B, R, 1)

    x = pallas_tied_conv_stack(
        cfg.depth, cfg.compute_dtype, True, not pallas_available(),
        x, kt, g1h, d1h, inv_deg,
        params["conv1"]["root"], params["conv1"]["bias"],
        params["conv2"]["root"], params["conv2"]["bias"],
    )
    latent = x
    out = jax.vmap(lambda xx: linear_apply(params["fc2"], xx))(x)
    if cfg.predict_delta:
        out = _head_scale(cfg) * out + residual_prior(cfg, batch.window)
    if return_latent:
        return out, latent
    return out
