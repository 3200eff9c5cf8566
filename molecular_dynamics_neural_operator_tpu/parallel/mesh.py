"""Device mesh, shardings, and the multi-chip training step.

TPU-native replacement for the reference's only parallelism —
single-process PyG ``DataParallel`` scattering Python lists of graphs
across GPUs (``/root/reference/graph_kernel.py:21,528-537``, SURVEY.md
section 2 #18). Here parallelism is declarative:

- a 2-D ``jax.sharding.Mesh`` with axes ``("data", "model")``,
- **data parallelism**: batch axis of window/adjacency/target arrays
  sharded over "data"; XLA inserts the gradient ``psum`` automatically when
  the jitted loss reduces over the batch (static graph shapes make this
  possible — no variable-size list scattering),
- **model (edge) parallelism** hook: for systems whose padded edge list
  exceeds one chip, the edge axis of sparse graphs shards over "model" and
  partial segment-sums reduce with ``psum`` — the graph-world analogue of
  sequence parallelism (SURVEY.md section 5, long-context note).

Everything compiles with ``jit`` + ``NamedSharding`` (pjit); no explicit
collectives are written by hand for the data-parallel path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from molecular_dynamics_neural_operator_tpu.configs import MeshConfig, ModelConfig
from molecular_dynamics_neural_operator_tpu.train.loop import _loss_fn, featurize_batch
from molecular_dynamics_neural_operator_tpu.train.state import (
    TrainState,
    apply_update,
)


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh. With defaults (1, 1) collapses to one
    device. data*model must equal len(devices)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    data, model = cfg.data, cfg.model
    if data * model != n:
        # Auto-fill: all devices on the data axis unless model is given.
        if model > 1 and n % model == 0:
            data = n // model
        elif model > 1:
            # An explicit model-parallel request that cannot be honored
            # must not silently collapse to (n, 1): callers sized for
            # edge sharding would run unsharded and OOM instead.
            raise ValueError(
                f"model axis {model} does not divide the {n} available "
                f"devices (data={cfg.data}, model={model})"
            )
        else:
            data, model = n, 1
    grid = devices.reshape(data, model)
    return Mesh(grid, cfg.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put a host batch: batch-major arrays sharded over "data",
    the shared amino-acid labels replicated."""
    data_sh = batch_sharding(mesh)
    repl_sh = replicated_sharding(mesh)
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(v, repl_sh if k == "aa" else data_sh)
    return out


def _make_shardmapped_step(cfg, tx, mesh, loss_fn, data_axis="data",
                           noise_std: float = 0.0):
    """Explicit-shard_map data-parallel step for loss functions containing
    ``pallas_call`` (which sharding propagation cannot partition): each
    device runs the kernel on its local batch shard, gradients all-reduce
    with an explicit psum, and the (replicated) optimizer update happens
    outside the sharded region. ``loss_fn(params, batch_dict) ->
    (batch-sum loss, aux_mse)``.

    ``noise_std``: GNS-style input noise, generated OUTSIDE the shard_map
    from the GLOBAL batch shape (train/noise.py) — XLA shards the
    generation with the window, and the realized noise is bitwise the
    single-device step's, so the sharded==single-device parity pins hold
    with noise on."""
    from functools import partial as _partial

    from molecular_dynamics_neural_operator_tpu.train.noise import (
        noised_window,
    )

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker requires; the collectives here are
    # explicit (psum/pmean) so the check adds nothing.
    @_partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def grads_fn(params, aa, rest):
        batch = {"aa": aa, **rest}
        (l2, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        grads = jax.lax.psum(grads, data_axis)
        l2 = jax.lax.psum(l2, data_axis)
        m = jax.lax.pmean(m, data_axis)
        return l2, m, grads

    def step(state: TrainState, batch: dict):
        if noise_std > 0.0:
            batch = dict(
                batch,
                window=noised_window(batch["window"], state.rng,
                                     state.step, noise_std),
            )
        rest = {k: v for k, v in batch.items() if k != "aa"}
        l2, m, grads = grads_fn(state.params, batch["aa"], rest)
        new_state = apply_update(state, grads, tx)
        return new_state, {"rel_l2": l2, "mse": m}

    step_jit = jax.jit(step, donate_argnums=(0,))

    def put(host_batch: dict) -> dict:
        return shard_batch(mesh, host_batch)

    return step_jit, put


def data_parallel_put(batch_size: int):
    """Default data mesh + host-batch placement with the divisibility
    guard — ONE definition for every CLI/data-parallel entry point.
    Returns (mesh, put)."""
    n = len(jax.devices())
    if batch_size % n:
        raise ValueError(
            f"batch_size {batch_size} must be divisible by the device "
            f"count {n} for data parallelism"
        )
    mesh = make_mesh()
    return mesh, lambda b: shard_batch(mesh, b)


def make_sharded_train_step(
    cfg: ModelConfig,
    tx,
    mesh: Mesh,
    graph_frame: str = "first",
    noise_std: float = 0.0,
):
    """Data-parallel train step: params/opt-state replicated, batch sharded
    over the "data" mesh axis. The batch-sum loss makes gradients a psum,
    which XLA inserts from the sharding annotations alone — except with
    ``train_conv_impl="pallas"``, where the step wraps in an explicit
    shard_map so each device runs the Pallas conv stack on its local
    shard.

    Returns (step_fn, put_fn): call ``put_fn(host_batch)`` then
    ``step_fn(state, device_batch)``.
    """
    from molecular_dynamics_neural_operator_tpu.train.noise import (
        noised_window,
    )

    if cfg.train_conv_impl == "pallas":
        def loss(params, batch):
            gbatch = featurize_batch(cfg, batch, graph_frame)
            l2, (m, _) = _loss_fn(params, cfg, gbatch)
            return l2, m

        return _make_shardmapped_step(cfg, tx, mesh, loss,
                                      noise_std=noise_std)
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

    # Input shardings propagate from the device_put batch and replicated
    # state; XLA partitions the step and inserts the gradient psum. Donate
    # the state for in-place update.
    step_jit = jax.jit(step, donate_argnums=(0,))

    def put(host_batch: dict) -> dict:
        return shard_batch(mesh, host_batch)

    return step_jit, put


def make_sharded_curriculum_train_step(
    cfg: ModelConfig,
    tx,
    mesh: Mesh,
    rollout_steps: int,
    threshold: float = 8.0,
    step_weights=None,
    graph_frame: str = "first",
    coord_clip=None,
    loss_space: str = "absolute",
    grad_steps=None,
    noise_std: float = 0.0,
    burnin_dtype=None,
    unroll_scans: bool = False,
):
    """Data-parallel K-step rollout-curriculum training step — the flagship
    recipe (tools/accuracy_eval.py) on many chips.

    The curriculum loss is vmapped per example and summed over the batch
    (train/curriculum.py), so batch-axis sharding alone parallelizes it:
    each device unrolls the K-step scan — operator forward + on-device graph
    rebuild from its OWN predictions — for its local examples, and the
    batch-sum loss makes the gradient a psum that XLA inserts from the
    sharding annotations. No hand-written collectives; the K-step rollout
    scan stays entirely local to each device (zero inter-chip traffic until
    the gradient all-reduce). Supersedes the reference's DataParallel
    replication (``/root/reference/graph_kernel.py:528-537``), which never
    composed with multi-step objectives at all.

    Returns (step_fn, put_fn); host batches must carry ``y_seq`` (B, K, R, 3)
    (``WindowDataset.get_batch(..., rollout_horizon=K)``) with B divisible
    by the "data" axis size.
    """
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        curriculum_loss_batched,
        make_curriculum_train_step,
    )

    if cfg.train_conv_impl == "pallas":
        def loss(params, batch):
            gbatch = featurize_batch(cfg, batch, graph_frame)
            # axis_name="data": inside the explicit shard_map the delta
            # floor must pool over the GLOBAL batch (see
            # curriculum_loss_batched docstring).
            return curriculum_loss_batched(
                params, cfg, gbatch, batch["y_seq"], threshold,
                step_weights, coord_clip, loss_space=loss_space,
                axis_name="data", grad_steps=grad_steps,
                burnin_dtype=burnin_dtype, unroll_scans=unroll_scans,
            )

        return _make_shardmapped_step(cfg, tx, mesh, loss,
                                      noise_std=noise_std)

    step = make_curriculum_train_step(
        cfg, tx, rollout_steps=rollout_steps, threshold=threshold,
        step_weights=step_weights, graph_frame=graph_frame,
        coord_clip=coord_clip, loss_space=loss_space,
        grad_steps=grad_steps, noise_std=noise_std,
        burnin_dtype=burnin_dtype, unroll_scans=unroll_scans,
    )

    def put(host_batch: dict) -> dict:
        return shard_batch(mesh, host_batch)

    return step, put
