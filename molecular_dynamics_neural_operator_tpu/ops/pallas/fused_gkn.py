"""Fused Pallas TPU kernel: edge-kernel MLP + weight-tied conv stacks.

The GKN hot path (``ops/edge_conv.py`` + the depth loops in
``models/gkn.py``) is HBM-bound under plain XLA: the edge-kernel MLP
weights (~10.5 MB bf16 at reference size) are re-read from HBM every
rollout step, and the (E, width^2) kernel tensor is re-read by each of the
2*depth conv layers (~36 MB/step). This kernel runs the whole section —

    ef (E, F) --MLP--> K (E, w^2)   [stays in VMEM]
    repeat 2*depth: x <- relu(mean-aggregate(x_src @ K) + x @ root + bias)

— in ONE ``pallas_call`` with every operand resident in VMEM, so HBM
traffic per invocation is just the inputs/outputs (~11 MB of weights once,
vs ~50 MB re-streamed).

The per-edge matvec m[e, v] = sum_wi xs[e, wi] * K[e, wi*w + v] is a
statically-unrolled VPU FMA over lane slices of the resident kernel tensor
(an earlier REP/RED one-hot-matmul formulation moved it to the MXU but
inflated FLOPs width-fold). Gather and scatter ride one-hot incidence
matmuls (G, D) as in the XLA path; the op is intrinsically
elementwise-bound since every data-dependent kernel weight is used exactly
once (arithmetic intensity O(1)).

**Status: superseded.** This per-step kernel measured SLOWER than the XLA
scan in round 1 (6.1-7.7k vs 16.4k steps/s at E=384) because weights
re-stream every invocation and the lane-slice FMA form fights Mosaic's
layouts. Round 2 built what this kernel was missing:
``ops/pallas/persistent_rollout.py`` runs the WHOLE rollout as one
grid-over-steps launch (weights VMEM-resident, tile-layout matvec) at
28.7k steps/s, and ``ops/pallas/train_conv.py`` covers the training-side
conv stack. This kernel stays available via
``ModelConfig.conv_impl="pallas"`` as a documented negative result and is
exact vs the XLA path in f32 (tests/test_pallas_fused.py).

Static shapes: R padded to a multiple of 8, E a multiple of 8, w = width.
Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def pallas_available() -> bool:
    if not _PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=4)
def _rep_red_np(width: int):
    rep = np.zeros((width, width * width), np.float32)
    for wi in range(width):
        rep[wi, wi * width : (wi + 1) * width] = 1.0
    red = np.zeros((width * width, width), np.float32)
    idx = np.arange(width * width)
    red[idx, idx % width] = 1.0
    return rep, red


def _kernel(
    # inputs
    ef_ref, mask_ref, g_ref, d_ref, invdeg_ref, x0_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    root1_ref, bias1_ref, root2_ref, bias2_ref,
    # outputs
    out_ref,
    # scratch
    k_scratch,
    *,
    depth: int,
    width: int,
    compute_dtype: str = "bfloat16",
):
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    f32 = jnp.float32

    # ---- edge-kernel MLP (weights resident) -> K in VMEM scratch
    h = jnp.dot(ef_ref[:].astype(cd), w1_ref[:].astype(cd),
                preferred_element_type=f32) + b1_ref[:]
    h = jnp.maximum(h, 0.0).astype(cd)
    h = jnp.dot(h, w2_ref[:].astype(cd), preferred_element_type=f32) + b2_ref[:]
    h = jnp.maximum(h, 0.0).astype(cd)
    k = jnp.dot(h, w3_ref[:].astype(cd), preferred_element_type=f32) + b3_ref[:]
    # pre-mask the kernels so padded edges are inert everywhere below
    k_scratch[:] = (k * mask_ref[:]).astype(cd)

    g = g_ref[:].astype(cd)            # (E, R) source one-hot
    d = d_ref[:].astype(cd)            # (E, R) target one-hot
    inv_deg = invdeg_ref[:]            # (R, 1) f32

    x = x0_ref[:]                      # (R, w) f32
    kt = k_scratch[:]                  # (E, w*w) resident

    for layer in range(2 * depth):
        root = root1_ref[:] if layer < depth else root2_ref[:]
        bias = bias1_ref[:] if layer < depth else bias2_ref[:]
        xs = jnp.dot(g, x.astype(cd), preferred_element_type=f32)  # (E, w)
        # per-edge matvec as a statically-unrolled FMA over input channels:
        # m[e, v] = sum_wi xs[e, wi] * K[e, wi*w + v]. Lane slices of the
        # resident kernel tensor; accumulate in f32 on the VPU.
        xs = xs.astype(cd)
        m = (xs[:, 0:1] * kt[:, 0:width]).astype(f32)
        for wi in range(1, width):
            m = m + (
                xs[:, wi : wi + 1] * kt[:, wi * width : (wi + 1) * width]
            ).astype(f32)
        # scatter-add to targets: D^T @ m without materializing D^T
        agg = jax.lax.dot_general(
            d, m.astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                          # (R, w)
        agg = agg * inv_deg
        rootx = jnp.dot(x.astype(cd), root.astype(cd),
                        preferred_element_type=f32)
        x = jnp.maximum(agg + rootx + bias, 0.0)

    out_ref[:] = x


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_conv_stack_from_graph(params, cfg, x, edges, mask, edge_feats,
                                interpret: bool = False):
    """Adapter from the GKN sparse-graph representation to the fused kernel.

    x: (R, width) post-fc1 node features; edges (2, E); mask (E,);
    edge_feats (E, F). Pads R to a multiple of 8 and F to 8, builds the
    one-hot incidence matrices, and returns (R, width). Requires
    ``cfg.tie_edge_kernel`` (the reference's configuration,
    graph_kernel.py:271-273) — one K tensor drives both conv stacks.
    """
    if not cfg.tie_edge_kernel:
        raise ValueError("pallas conv_impl requires tie_edge_kernel=True")
    r, width = x.shape
    e = mask.shape[0]
    r_pad = _round_up(r, 8)
    f = edge_feats.shape[-1]
    f_pad = _round_up(f, 8)

    src, dst = edges[0], edges[1]
    g = (src[:, None] == jnp.arange(r_pad)[None, :]).astype(jnp.float32)
    d = (dst[:, None] == jnp.arange(r_pad)[None, :]).astype(jnp.float32)
    deg = jnp.sum(d * mask[:, None], axis=0)
    inv_deg = (1.0 / jnp.maximum(deg, 1.0))[:, None]  # (R_pad, 1)

    ef = jnp.pad(edge_feats, ((0, 0), (0, f_pad - f)))
    x0 = jnp.pad(x, ((0, r_pad - r), (0, 0)))

    mlp = params["edge_kernel"]
    w1 = jnp.pad(mlp["layer_0"]["w"], ((0, f_pad - f), (0, 0)))
    out = fused_edge_conv_stack(
        ef, mask[:, None], g, d, inv_deg, x0,
        w1, mlp["layer_0"]["b"][None, :],
        mlp["layer_1"]["w"], mlp["layer_1"]["b"][None, :],
        mlp["layer_2"]["w"], mlp["layer_2"]["b"][None, :],
        params["conv1"]["root"], params["conv1"]["bias"][None, :],
        params["conv2"]["root"], params["conv2"]["bias"][None, :],
        depth=cfg.depth,
        width=width,
        interpret=interpret,
        compute_dtype=cfg.compute_dtype,
    )
    return out[:r]


@functools.partial(
    jax.jit,
    static_argnames=("depth", "width", "interpret", "compute_dtype"),
)
def fused_edge_conv_stack(
    ef, mask, g, d, inv_deg, x0,
    w1, b1, w2, b2, w3, b3,
    root1, bias1, root2, bias2,
    depth: int,
    width: int,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
):
    """Run the fused MLP + conv-stack kernel.

    ef: (E, F_pad) edge features; mask: (E, 1); g/d: (E, R_pad) one-hots;
    inv_deg: (R_pad, 1); x0: (R_pad, width); MLP weights w1 (F_pad, ker),
    w2 (ker, ker), w3 (ker, width^2) with (1, ker)/(1, w^2) biases; conv
    root (width, width) / bias (1, width) pairs. Returns (R_pad, width).
    """
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    e, _ = ef.shape
    r = x0.shape[0]

    kernel = functools.partial(_kernel, depth=depth, width=width,
                               compute_dtype=compute_dtype)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM if _PALLAS else None)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, width), jnp.float32),
        in_specs=[vmem] * 16,
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((e, width * width), cd)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        ef, mask, g, d, inv_deg, x0,
        w1, b1, w2, b2, w3, b3,
        root1, bias1, root2, bias2,
    )
