"""Mesh-sharded autoregressive rollout — multi-chip trajectory serving.

Scales the signature capability (``rollout/scan.py``, the TPU-native
replacement for ``/root/reference/graph_kernel.py:396-413``) across a
device mesh: independent rollout *streams* shard over the "data" axis via
``shard_map``, each device running the full jitted scan — operator forward
+ on-device graph rebuild from its own predictions — on its local streams
with ZERO inter-chip traffic during the rollout (one psum at the end for
the overflow diagnostic). Aggregate throughput is therefore
chips x per-chip rate by construction; combined with ``stream_chunk`` each
chip can also carry many streams without the (S, E, w, w) kernel-tensor
HBM cliff.

The reference's rollout is strictly single-GPU (it unwraps DataParallel via
``model.module`` before rolling out, ``graph_kernel.py:404``); this is the
capability it never had.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.rollout.scan import rollout_scan


def make_sharded_rollout_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    num_steps: int,
    threshold: float = 8.0,
    graph_frame: str = "last",
    collect: str = "coords",
    clip: float | None = None,
    stream_chunk: int | None = None,
    data_axis: str = "data",
):
    """Returns jitted ``fn(params, aa, window0)`` with window0 (S, T, R, 3);
    S must be divisible by the "data" axis size. Outputs keep the stream
    axis sharded (collected (S, num_steps, ...), final windows (S, T, R, 3));
    the overflow diagnostic is reduced across the mesh.
    """
    n_shards = mesh.shape[data_axis]

    def local_rollout(params, aa, window0):
        # window0 here is the LOCAL (S/n, T, R, 3) shard.
        def one(w):
            return rollout_scan(params, cfg, aa, w, num_steps, threshold,
                                graph_frame, collect, clip)

        run = jax.vmap(one)
        if stream_chunk is None:
            collected, final_w, diags = run(window0)
        else:
            s_local = window0.shape[0]
            if s_local % stream_chunk:
                raise ValueError(
                    f"local stream count {s_local} not divisible by "
                    f"stream_chunk {stream_chunk}"
                )
            chunked = window0.reshape(
                (s_local // stream_chunk, stream_chunk) + window0.shape[1:]
            )
            collected, final_w, diags = jax.lax.map(run, chunked)
            collected = jax.tree_util.tree_map(
                lambda x: x.reshape((s_local,) + x.shape[2:]), collected
            )
            final_w = final_w.reshape((s_local,) + final_w.shape[2:])
            diags = {k: v.reshape(-1) for k, v in diags.items()}
        # Any-stream overflow, reduced over both the local and mesh axes.
        overflow = jnp.any(diags["edge_overflow"])
        overflow = jax.lax.psum(overflow.astype(jnp.int32), data_axis) > 0
        return collected, final_w, {"edge_overflow": overflow}

    # check_vma=False: the rollout scan's overflow carry is initialized from
    # a constant (device-invariant) and becomes device-varying after the
    # first step, which the varying-manual-axes checker rejects even though
    # the program is correct (streams are independent; the only collective
    # is the final overflow psum).
    sharded = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis), P()),
        check_vma=False,
    )(local_rollout)

    def fn(params, aa, window0):
        if window0.shape[0] % n_shards:
            raise ValueError(
                f"stream count {window0.shape[0]} not divisible by the "
                f"'{data_axis}' axis size {n_shards}"
            )
        return sharded(params, aa, window0)

    return jax.jit(fn)
