"""Edge-axis model parallelism via shard_map — scaling axis for big systems.

For ~10k-atom systems the padded neighbor list (E, w, w kernel tensor) is
the memory/FLOP giant; the natural mesh axis is the EDGE dimension — the
graph-world analogue of sequence parallelism (SURVEY.md section 5). Each
"model" shard owns a contiguous slice of the padded edge list:

- the edge-kernel MLP (the dominant FLOPs) evaluates only local edges,
- each conv layer computes a partial segment-sum over local edges and
  ``psum``s the (R, width) partial aggregates across the "model" axis,
- node state stays replicated across the model axis (it is tiny: R x width),
- degrees psum once up front.

Composes with batch-axis data parallelism on the same mesh: in_specs shard
batch over "data" and edges over "model". The reference has no counterpart
(its only parallelism is single-process DataParallel replication,
``graph_kernel.py:528``); this is the TPU-native scaling story.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.models.gkn import (
    _compute_dtype,
    _encode_nodes,
    residual_prior,
)
from molecular_dynamics_neural_operator_tpu.ops import (
    edge_kernel_matrices,
    linear_apply,
)


def _forward_edge_shard(params, cfg: ModelConfig, aa, window, edges, mask,
                        edge_feats, axis_name: str,
                        blocked_offset=None):
    """Per-example forward with a LOCAL edge shard; psums over
    ``axis_name``. The ONE shared implementation for both the training
    step here and the edge-sharded rollout (rollout_edge_sharded.py) —
    they previously carried two copies that diverged (the rollout copy
    had the ``predict_delta`` residual, this one had silently lost it).

    ``blocked_offset`` (traced scalar): when the shard is an atom-aligned
    slice of the cell-list block layout (slot a*max_degree + d targets
    local atom a; dst indices global, starting at this offset), the
    edges->nodes reduction runs scatter-free — a dense (n_local, deg, w)
    sum placed into the global node array by dynamic_update_slice —
    instead of segment_sum (TPU scatters serialize; see
    ops/edge_conv.py "blocked")."""
    cd = _compute_dtype(cfg)
    r = aa.shape[0]
    x = _encode_nodes(params, cfg, aa, window)  # (R, w) replicated

    w = cfg.width
    kernels = edge_kernel_matrices(
        params["edge_kernel"], edge_feats, w, compute_dtype=cd
    ).astype(cd)
    kernels2 = kernels if cfg.tie_edge_kernel else edge_kernel_matrices(
        params["edge_kernel2"], edge_feats, w, compute_dtype=cd
    ).astype(cd)

    src, dst = edges[0], edges[1]
    if blocked_offset is not None:
        n_local = mask.shape[0] // cfg.max_degree

        def place(local_block):
            full = jnp.zeros((r,) + local_block.shape[1:],
                             local_block.dtype)
            return jax.lax.dynamic_update_slice(
                full, local_block,
                (blocked_offset,) + (0,) * (local_block.ndim - 1),
            )

        def local_aggregate(m):
            return place(m.reshape(n_local, cfg.max_degree, -1).sum(1))

        deg = jax.lax.psum(
            place(mask.reshape(n_local, cfg.max_degree).sum(1)), axis_name
        )
    else:
        def local_aggregate(m):
            return jax.ops.segment_sum(m, dst, num_segments=r)

        deg = jax.lax.psum(
            jax.ops.segment_sum(mask, dst, num_segments=r), axis_name
        )
    inv_deg = 1.0 / jnp.maximum(deg, 1.0)

    def layer(x, conv_params, ks):
        m = jnp.einsum(
            "ew,ewv->ev", x[src].astype(cd), ks,
            preferred_element_type=jnp.float32,
        ) * mask[:, None]
        agg = jax.lax.psum(local_aggregate(m), axis_name) * inv_deg[:, None]
        root = jnp.dot(x.astype(cd), conv_params["root"].astype(cd),
                       preferred_element_type=jnp.float32)
        return jax.nn.relu(agg + root + conv_params["bias"])

    for _ in range(cfg.depth):
        x = layer(x, params["conv1"], kernels)
    if not getattr(cfg, "legacy_no_lstm", False):
        for _ in range(cfg.depth):
            x = layer(x, params["conv2"], kernels2)
    out = linear_apply(params["fc2"], x)
    if cfg.predict_delta:
        # Residual head, exactly as gkn_apply (residual_prior covers the
        # copy-last AND constant-velocity priors).
        out = out + residual_prior(cfg, window)
    return out


# Training-step call sites use the segment-sum form.
_forward_local = _forward_edge_shard


def make_edge_sharded_forward(cfg: ModelConfig, mesh: Mesh,
                              data_axis: str = "data",
                              model_axis: str = "model"):
    """Batched forward with batch sharded over ``data_axis`` and the edge
    axis sharded over ``model_axis``.

    Inputs: params (replicated), aa (R,), window (B, T, R, 3),
    edges (B, 2, E), mask (B, E), edge_feats (B, E, F).
    Returns (B, R, out_width).
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),                                # params replicated
            P(),                                # aa replicated
            P(data_axis),                       # window: batch sharded
            P(data_axis, None, model_axis),     # edges: batch x edge sharded
            P(data_axis, model_axis),           # mask
            P(data_axis, model_axis, None),     # edge_feats
        ),
        out_specs=P(data_axis),
    )
    def fwd(params, aa, window, edges, mask, edge_feats):
        fn = lambda w_, e_, m_, f_: _forward_local(
            params, cfg, aa, w_, e_, m_, f_, model_axis
        )
        return jax.vmap(fn)(window, edges, mask, edge_feats)

    return fwd


def make_edge_sharded_train_step(cfg: ModelConfig, tx, mesh: Mesh,
                                 data_axis: str = "data",
                                 model_axis: str = "model"):
    """Full data+edge-parallel training step: forward through the
    shard_map'd 2-D-sharded model, batch-sum relative-L2 loss, grads
    (autodiff through the psums), optax update. Params and optimizer state
    replicated; gradients all-reduce automatically."""
    from molecular_dynamics_neural_operator_tpu.models.losses import lp_rel, mse
    from molecular_dynamics_neural_operator_tpu.train.state import (
        TrainState,
        apply_update,
    )

    fwd = make_edge_sharded_forward(cfg, mesh, data_axis, model_axis)

    def loss_fn(params, aa, window, edges, mask, edge_feats, y):
        out = fwd(params, aa, window, edges, mask, edge_feats)
        b = out.shape[0]
        return lp_rel(out.reshape(b, -1), y.reshape(b, -1),
                      size_average=False), mse(out, y)

    @jax.jit
    def step(state: TrainState, aa, window, edges, mask, edge_feats, y):
        (l2, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, aa, window, edges, mask, edge_feats, y
        )
        return apply_update(state, grads, tx), {
            "rel_l2": l2, "mse": m,
        }

    return step
