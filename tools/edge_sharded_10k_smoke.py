"""Edge-sharded TRAINING at config-5 scale (VERDICT r4 item 6).

The 10k-atom width-64 system's (E, w, w) kernel tensor is ~6.5 GB f32 —
with forward activations and backward gradients it exceeds a single v5e
chip's 16 GB HBM, which is exactly what `parallel/edge_sharded.py`
exists for; until now every sharded test ran toy shapes. This smoke runs
the REAL shape end to end on the 8-device virtual CPU mesh:

1. one 10k-atom blocked-layout teacher-forced training step through
   ``make_edge_sharded_train_step`` on a (data=1, model=8) mesh,
2. the same step single-device, asserting updated params match,
3. a rollout segment through ``make_edge_sharded_rollout_fn`` (sharded
   cell-list rebuild) vs the single-device scan,
4. per-device memory from XLA's compiled memory analysis for both
   partitionings — the feasibility evidence (per-device working set
   must drop ~model_axis-fold).

Usage (CPU; takes minutes per step at width 64 on one host core):

    python tools/edge_sharded_10k_smoke.py --out tools/edge_sharded_10k_results.json
    python tools/edge_sharded_10k_smoke.py --nodes 1000 --width 16   # quick

The system generator is the config-5 campaign's (serpentine grid +
breathing displacement field + exact KD-tree contacts).
"""

import os
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

# Force the 8-device virtual CPU mesh BEFORE jax initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import argparse  # noqa: E402
import json  # noqa: E402
import resource  # noqa: E402
import time  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from molecular_dynamics_neural_operator_tpu.configs import (  # noqa: E402
    MeshConfig, ModelConfig, TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data.h5 import (  # noqa: E402
    TrajectoryData,
)
from molecular_dynamics_neural_operator_tpu.data.windows import (  # noqa: E402
    WindowDataset,
)
from molecular_dynamics_neural_operator_tpu.parallel import (  # noqa: E402
    make_edge_sharded_rollout_fn,
    make_mesh,
)
from molecular_dynamics_neural_operator_tpu.parallel.edge_sharded import (  # noqa: E402
    make_edge_sharded_train_step,
)
from molecular_dynamics_neural_operator_tpu.rollout import (  # noqa: E402
    make_rollout_fn,
)
from molecular_dynamics_neural_operator_tpu.train import (  # noqa: E402
    create_train_state,
)
from molecular_dynamics_neural_operator_tpu.train.loop import (  # noqa: E402
    make_train_step,
)
from tools.config5_campaign import (  # noqa: E402
    breathing_trajectory,
    kdtree_edges,
    serpentine_grid,
)


def mem_analysis(lowered):
    """Compiled memory analysis -> dict (per ADDRESSABLE device: under
    shard_map each of the 8 virtual devices holds 1/8 of the sharded
    operands)."""
    try:
        m = lowered.compile().memory_analysis()
        return {
            "argument_bytes": int(m.argument_size_in_bytes),
            "output_bytes": int(m.output_size_in_bytes),
            "temp_bytes": int(m.temp_size_in_bytes),
            "peak_bytes_estimate": int(
                m.argument_size_in_bytes + m.output_size_in_bytes
                + m.temp_size_in_bytes
            ),
        }
    except Exception as e:  # CPU backends may not implement it
        return {"unavailable": str(e)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=10_000)
    p.add_argument("--spacing", type=float, default=4.0)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--ker_width", type=int, default=128)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--rollout_steps", type=int, default=3)
    p.add_argument("--threshold", type=float, default=8.0)
    p.add_argument("--skip_single_device", action="store_true",
                   help="skip the single-device comparison (for shapes "
                        "that only fit sharded)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    t_all = time.time()
    base = serpentine_grid(args.nodes, args.spacing)
    positions = breathing_trajectory(base, args.frames, seed=5,
                                     amplitude=0.35, dt=0.02)
    edge_lists = kdtree_edges(positions, args.threshold)
    max_deg = 0
    for el in edge_lists:
        deg = np.zeros(args.nodes, np.int64)
        np.add.at(deg, el[1], 1)
        max_deg = max(max_deg, int(deg.max()))
    max_degree = ((max_deg + 7) // 8) * 8
    max_edges = args.nodes * max_degree
    print(f"[graph] max in-degree {max_deg} -> blocked capacity "
          f"{max_edges} edges", flush=True)

    window = 4
    cfg = ModelConfig(
        compute_dtype="float32", graph_mode="sparse",
        num_residues=args.nodes, max_edges=max_edges,
        width=args.width, ker_width=args.ker_width, depth=args.depth,
        window_size=window, predict_delta=True,
        scatter_mode="blocked", neighbor_impl="cell_list",
        max_degree=max_degree, cell_capacity=32,
        num_cells=16384 if args.nodes > 2000 else 4096,
    )
    tcfg = TrainConfig(lr=3e-4, weight_decay=1e-6, batch_size=1,
                       grad_clip_norm=1.0)
    traj = TrajectoryData(
        positions=positions, edge_indices=edge_lists,
        aminoacids=np.random.default_rng(0).integers(
            0, 20, args.nodes).astype(np.int32),
        rmsd=None,
    )
    ds = WindowDataset(traj, window_size=window, graph_mode="sparse",
                       max_edges=max_edges, threshold=args.threshold,
                       edge_layout="blocked")
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch(
        np.array([0])).items()}

    kernel_tensor_gb = max_edges * args.width ** 2 * 4 / 2 ** 30
    out = {
        "config": vars(args),
        "system": {
            "nodes": args.nodes, "blocked_capacity": max_edges,
            "max_in_degree": max_deg,
            "kernel_tensor_gb_f32": round(kernel_tensor_gb, 2),
        },
    }

    # edge features for the sharded step (the single-device step
    # featurizes on device from the same edges + window)
    src, dst = batch["edges"][:, 0], batch["edges"][:, 1]
    frame0 = batch["window"][:, 0]
    ef = jnp.concatenate([
        jnp.take_along_axis(frame0, src[..., None], axis=1),
        jnp.take_along_axis(frame0, dst[..., None], axis=1),
    ], axis=-1)

    mesh = make_mesh(MeshConfig(data=1, model=8))
    state_sh, tx_sh, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                            tcfg)
    step_sh = make_edge_sharded_train_step(cfg, tx_sh, mesh)
    lowered_sh = step_sh.lower(state_sh, batch["aa"], batch["window"],
                               batch["edges"], batch["mask"], ef,
                               batch["y"])
    out["sharded_train_memory_per_device"] = mem_analysis(lowered_sh)
    t0 = time.time()
    new_sh, m_sh = step_sh(state_sh, batch["aa"], batch["window"],
                           batch["edges"], batch["mask"], ef, batch["y"])
    jax.block_until_ready(new_sh.params)
    out["sharded_train_step_seconds"] = round(time.time() - t0, 1)
    out["sharded_rel_l2"] = float(m_sh["rel_l2"])
    print(f"[sharded] rel_l2 {out['sharded_rel_l2']:.5f} in "
          f"{out['sharded_train_step_seconds']}s", flush=True)

    if not args.skip_single_device:
        state_1, tx_1, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                              tcfg)
        step_1 = make_train_step(cfg, tx_1, donate=False)
        lowered_1 = step_1.lower(state_1, batch)
        out["single_device_train_memory"] = mem_analysis(lowered_1)
        t0 = time.time()
        new_1, m_1 = step_1(state_1, batch)
        jax.block_until_ready(new_1.params)
        out["single_device_train_step_seconds"] = round(time.time() - t0, 1)
        out["single_device_rel_l2"] = float(m_1["rel_l2"])
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            new_1.params, new_sh.params)
        out["max_param_diff_after_step"] = float(
            max(jax.tree_util.tree_leaves(diffs)))
        assert out["max_param_diff_after_step"] < 1e-4, diffs
        print(f"[equivalence] max param diff "
              f"{out['max_param_diff_after_step']:.2e}", flush=True)

    # --- rollout segment: sharded cell-list rebuild vs single-device scan
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(positions[:window])
    roll_sh = make_edge_sharded_rollout_fn(cfg, mesh,
                                           num_steps=args.rollout_steps,
                                           clip=1000.0)
    t0 = time.time()
    coords_sh, _, diags_sh = roll_sh(state_sh.params, aa, w0)
    coords_sh = np.asarray(coords_sh)
    out["sharded_rollout_seconds"] = round(time.time() - t0, 1)
    out["sharded_rollout_edge_overflow"] = bool(
        np.asarray(diags_sh["edge_overflow"]).any())
    if not args.skip_single_device:
        roll_1 = make_rollout_fn(cfg, num_steps=args.rollout_steps,
                                 clip=1000.0)
        coords_1 = np.asarray(roll_1(state_sh.params, aa, w0)[0])
        # untrained params explode within a few free steps (known
        # behavior): compare over the common FINITE prefix and require
        # both paths to go non-finite at the same step
        fin_sh = np.isfinite(coords_sh).all(axis=(1, 2))
        fin_1 = np.isfinite(coords_1).all(axis=(1, 2))
        assert (fin_sh == fin_1).all(), (fin_sh, fin_1)
        n_fin = int(fin_sh.sum())
        out["rollout_finite_steps_both_paths"] = n_fin
        rollout_diff = (float(np.max(np.abs(
            coords_sh[fin_sh] - coords_1[fin_sh]))) if n_fin else 0.0)
        out["rollout_max_coord_diff_finite_prefix"] = rollout_diff
        assert rollout_diff < 1e-3, rollout_diff
        print(f"[rollout] sharded == single-device within "
              f"{rollout_diff:.2e} over {n_fin} finite steps", flush=True)

    out["host_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2 ** 20, 2)
    out["total_seconds"] = round(time.time() - t_all, 1)
    print(json.dumps(out, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
