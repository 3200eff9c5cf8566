"""Pallas training kernel for the weight-tied conv stack (fwd + bwd).

The training step is bandwidth-bound on the per-edge kernel tensor: XLA
schedules the 2*depth conv layers one HLO at a time, so K ((B, E, w, w),
~2 MB/example bf16) streams from HBM once per layer per pass — ~24+ reads
per step. Here the stack runs as ONE kernel with ``grid=(B,)``: each grid
step DMAs one example's K block into VMEM ONCE (double-buffered behind the
previous example's compute) and runs all layers against the resident copy;
the backward kernel does the same for the reverse sweep and accumulates
the kernel-tensor gradient in VMEM, writing it once.

Layout: K is consumed in the TILE layout K'[e, v*w + wi] = K[e, wi*w + v]
(each edge's matrix transposed) so the per-edge matvec is
``pltpu.repeat`` (np.tile semantics) + elementwise multiply + 0/1 group-sum
matmuls — the formulation measured fastest in the persistent rollout
kernel. The caller produces K' by permuting the last MLP layer's columns
(a relabeling; autodiff through the gather handles the gradient).

Exposed as ``pallas_tied_conv_stack`` — a ``jax.custom_vjp`` whose forward
and backward are both pallas_calls — with the same signature/semantics as
``ops/conv_stack.tied_conv_stack`` except K arrives pre-masked and
pre-permuted. Exactness vs the XLA stack is pinned in
tests/test_train_conv.py (interpret mode, where the tile expansion uses an
equivalent 0/1 matmul since interpret-mode ``pltpu.repeat`` semantics are
unverified).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.ops.pallas.fused_gkn import (
    _PALLAS,
    pallas_available,
)

if _PALLAS:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def kernel_permutation(width: int) -> np.ndarray:
    """Column permutation turning K[e, wi*w + v] into K'[e, v*w + wi]."""
    return np.arange(width * width).reshape(width, width).T.ravel()


@functools.lru_cache(maxsize=4)
def _mats(width: int, dtype_str: str):
    """0/1 helpers for the tile layout (p = v*w + wi):
    REPEAT[v, v*w+wi] = 1 (np.repeat expansion), TILE[wi, v*w+wi] = 1
    (np.tile expansion), RED_V[p, v] (group-sum -> v), RED_WI[p, wi]."""
    w = width
    repeat = np.zeros((w, w * w), np.float32)
    tile = np.zeros((w, w * w), np.float32)
    for v in range(w):
        repeat[v, v * w : (v + 1) * w] = 1.0
    for wi in range(w):
        tile[wi, wi::w] = 1.0
    red_v = np.kron(np.eye(w, dtype=np.float32), np.ones((w, 1), np.float32))
    red_wi = np.tile(np.eye(w, dtype=np.float32), (w, 1))
    dt = np.float32
    if dtype_str != "float32":
        import ml_dtypes

        dt = ml_dtypes.bfloat16
    return (repeat.astype(dt), tile.astype(dt), red_v.astype(dt),
            red_wi.astype(dt))


def _expand_tile(xs, width, tile_ref, use_repeat, cd):
    """np.tile-expand (E, w) -> (E, w*w): position v*w+wi holds xs[wi]."""
    if use_repeat:
        return pltpu.repeat(xs.astype(cd), width, axis=1)
    return jnp.dot(
        xs.astype(cd), tile_ref[:], preferred_element_type=jnp.float32
    ).astype(cd)


def _fwd_kernel(
    x0_ref, k_ref, g_ref, d_ref, invdeg_ref,
    root1_ref, bias1_ref, root2_ref, bias2_ref, tile_ref, red_v_ref,
    out_ref, stack_ref,
    *,
    depth: int,
    width: int,
    compute_dtype: str,
    use_repeat: bool,
):
    f32 = jnp.float32
    cd = f32 if compute_dtype == "float32" else jnp.bfloat16
    g = g_ref[0].astype(cd)          # (E, R)
    d = d_ref[0].astype(cd)          # (E, R)
    kt = k_ref[0]                    # (E, w^2) tile layout, pre-masked
    inv_deg = invdeg_ref[0]          # (R, 1)
    x = x0_ref[0]                    # (R, w) f32
    stack_ref[0, 0] = x
    for layer in range(2 * depth):
        root = root1_ref[:] if layer < depth else root2_ref[:]
        bias = bias1_ref[:] if layer < depth else bias2_ref[:]
        xs = jnp.dot(g, x.astype(cd), preferred_element_type=f32)
        rep = _expand_tile(xs, width, tile_ref, use_repeat, cd)
        prod = rep * kt                                      # (E, w^2)
        node_prod = jax.lax.dot_general(
            d, prod,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                    # (R, w^2)
        agg = jnp.dot(
            node_prod.astype(cd), red_v_ref[:], preferred_element_type=f32
        ) * inv_deg                                          # (R, w)
        rootx = jnp.dot(x.astype(cd), root.astype(cd),
                        preferred_element_type=f32)
        x = jnp.maximum(agg + rootx + bias, 0.0)
        stack_ref[0, layer + 1] = x
    out_ref[0] = x


def _bwd_kernel(
    gout_ref, stack_ref, k_ref, g_ref, d_ref, invdeg_ref,
    root1_ref, root2_ref, repeat_ref, tile_ref, red_wi_ref,
    dx0_ref, dk_ref, droot1_ref, dbias1_ref, droot2_ref, dbias2_ref,
    dk_acc,
    *,
    depth: int,
    width: int,
    compute_dtype: str,
    use_repeat: bool,
):
    f32 = jnp.float32
    cd = f32 if compute_dtype == "float32" else jnp.bfloat16
    g = g_ref[0].astype(cd)
    d = d_ref[0].astype(cd)
    kt = k_ref[0]
    inv_deg = invdeg_ref[0]
    dx = gout_ref[0]                  # (R, w) f32
    dr1 = jnp.zeros((width, width), f32)
    dr2 = jnp.zeros((width, width), f32)
    db1 = jnp.zeros((1, width), f32)
    db2 = jnp.zeros((1, width), f32)
    for layer in range(2 * depth - 1, -1, -1):
        root = root1_ref[:] if layer < depth else root2_ref[:]
        x_in = stack_ref[0, layer]
        x_out = stack_ref[0, layer + 1]
        dz = dx * (x_out > 0.0).astype(f32)                  # (R, w)
        dr = jax.lax.dot_general(
            x_in.astype(cd), dz.astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        db = jnp.sum(dz, axis=0, keepdims=True)
        if layer < depth:
            dr1, db1 = dr1 + dr, db1 + db
        else:
            dr2, db2 = dr2 + dr, db2 + db
        dagg = dz * inv_deg
        dm = jnp.dot(d, dagg.astype(cd), preferred_element_type=f32)
        # np.repeat-expand dm: position v*w+wi holds dm[v]
        dm_rep = jnp.dot(
            dm.astype(cd), repeat_ref[:], preferred_element_type=f32
        ).astype(cd)                                         # (E, w^2)
        xs = jnp.dot(g, x_in.astype(cd), preferred_element_type=f32)
        xs_tile = _expand_tile(xs, width, tile_ref, use_repeat, cd)
        # first processed layer assigns (no zero-init pass over the 4 MB
        # f32 accumulator); the rest accumulate in place
        if layer == 2 * depth - 1:
            dk_acc[:] = (dm_rep * xs_tile).astype(f32)
        else:
            dk_acc[:] = dk_acc[:] + (dm_rep * xs_tile).astype(f32)
        # Message-gradient reduction REORDERED (the forward conv's trick,
        # run in reverse): (G^T @ (dm_rep*K)) @ RED == G^T @ ((dm_rep*K)
        # @ RED), so the w^2-wide contraction streams R rows instead of E
        # rows through the MXU and the (E, w) dxs tensor never
        # materializes.
        z = jax.lax.dot_general(
            g, (dm_rep * kt).astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                    # (R, w^2)
        dx = (
            jnp.dot(dz.astype(cd), root.astype(cd).T,
                    preferred_element_type=f32)
            + jnp.dot(z.astype(cd), red_wi_ref[:],
                      preferred_element_type=f32)
        )
    dx0_ref[0] = dx
    dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
    droot1_ref[0] = dr1
    dbias1_ref[0] = db1               # block (1, 1, w); db1 is (1, w)
    droot2_ref[0] = dr2
    dbias2_ref[0] = db2


def _specs(shapes, const_idx):
    """Per-example blocks (leading dim 1 indexed by the grid) except the
    constants (full block, index 0)."""
    specs = []
    for i, s in enumerate(shapes):
        if i in const_idx:
            specs.append(pl.BlockSpec(
                s, lambda b, s=s: tuple(0 for _ in s),
                memory_space=pltpu.VMEM))
        else:
            specs.append(pl.BlockSpec(
                (1,) + s[1:], lambda b, n=len(s): (b,) + (0,) * (n - 1),
                memory_space=pltpu.VMEM))
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def pallas_tied_conv_stack(
    depth: int,
    compute_dtype_str: str,
    use_repeat: bool,
    interpret: bool,
    x0, kt, g, d, inv_deg,
    root1, bias1, root2, bias2,
):
    """Batched tied conv stack. x0 (B, R, w) f32; kt (B, E, w^2) tile-layout
    pre-masked kernel tensor; g/d (B, E, R) one-hots; inv_deg (B, R, 1).
    Returns (B, R, w). Requires depth >= 1: the backward kernel's dK
    accumulator is assigned by the first processed layer (no zero-init
    pass), so an empty stack would return uninitialized VMEM scratch."""
    if depth < 1:
        raise ValueError("pallas_tied_conv_stack requires depth >= 1")
    out, _ = _fwd(depth, compute_dtype_str, use_repeat, interpret,
                  x0, kt, g, d, inv_deg, root1, bias1, root2, bias2)
    return out


def _fwd(depth, cd_str, use_repeat, interpret,
         x0, kt, g, d, inv_deg, root1, bias1, root2, bias2):
    b, r, width = x0.shape
    e = kt.shape[1]
    cd = jnp.float32 if cd_str == "float32" else jnp.bfloat16
    repeat_m, tile_m, red_v, red_wi = _mats(width, cd_str)
    kernel = functools.partial(
        _fwd_kernel, depth=depth, width=width, compute_dtype=cd_str,
        use_repeat=use_repeat and not interpret,
    )
    inputs = (x0, kt, g, d, inv_deg,
              root1.astype(cd), bias1.reshape(1, width).astype(jnp.float32),
              root2.astype(cd), bias2.reshape(1, width).astype(jnp.float32),
              jnp.asarray(tile_m), jnp.asarray(red_v))
    shapes = tuple(jnp.shape(x) for x in inputs)
    out, stack = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, r, width), jnp.float32),
            jax.ShapeDtypeStruct((b, 2 * depth + 1, r, width), jnp.float32),
        ),
        in_specs=_specs(shapes, const_idx={5, 6, 7, 8, 9, 10}),
        out_specs=(
            pl.BlockSpec((1, r, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * depth + 1, r, width),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    res = (stack, kt, g, d, inv_deg, root1, root2)
    return out, res


def _bwd(depth, cd_str, use_repeat, interpret, res, g_out):
    stack, kt, g, d, inv_deg, root1, root2 = res
    b, _, r, width = stack.shape
    e = kt.shape[1]
    cd = jnp.float32 if cd_str == "float32" else jnp.bfloat16
    repeat_m, tile_m, red_v, red_wi = _mats(width, cd_str)
    kernel = functools.partial(
        _bwd_kernel, depth=depth, width=width, compute_dtype=cd_str,
        use_repeat=use_repeat and not interpret,
    )
    inputs = (g_out, stack, kt, g, d, inv_deg,
              root1.astype(cd), root2.astype(cd),
              jnp.asarray(repeat_m), jnp.asarray(tile_m),
              jnp.asarray(red_wi))
    shapes = tuple(jnp.shape(x) for x in inputs)
    dx0, dk, droot1, dbias1, droot2, dbias2 = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, r, width), jnp.float32),
            jax.ShapeDtypeStruct((b, e, width * width), kt.dtype),
            jax.ShapeDtypeStruct((b, width, width), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, width), jnp.float32),
            jax.ShapeDtypeStruct((b, width, width), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, width), jnp.float32),
        ),
        in_specs=_specs(shapes, const_idx={6, 7, 8, 9, 10}),
        out_specs=(
            pl.BlockSpec((1, r, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, width * width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((e, width * width), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    # per-example partials for the shared parameters reduce outside (tiny)
    return (dx0, dk, None, None, None,
            jnp.sum(droot1, axis=0), jnp.sum(dbias1, axis=(0, 1)),
            jnp.sum(droot2, axis=0), jnp.sum(dbias2, axis=(0, 1)))


pallas_tied_conv_stack.defvjp(_fwd, _bwd)
