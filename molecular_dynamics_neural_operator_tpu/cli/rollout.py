"""Rollout CLI — free-running trajectory generation from a checkpoint.

Covers the reference's offline analysis flow (``bba_analysis.ipynb`` cells
12-27): load a checkpoint, roll out N steps from a chosen start frame via
the jitted scan, write predicted coordinates / contact maps / per-step MSE,
and optionally render the forecast-vs-real movie.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=Path, required=True)
    p.add_argument("--checkpoint", type=Path, default=None,
                   help=".npz train-state checkpoint (random init if absent)")
    p.add_argument("--out_path", type=Path, required=True)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--threshold", type=float, default=8.0)
    p.add_argument("--window_size", type=int, default=10)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--kernel_width", type=int, default=1024)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--num_residues", type=int, default=28)
    p.add_argument("--graph_mode", choices=["dense", "sparse"], default="dense")
    p.add_argument("--max_edges", type=int, default=384,
                   help="padded edge capacity for sparse-mode rebuilds")
    p.add_argument("--neighbor_impl", choices=["dense_rank", "cell_list"],
                   default="dense_rank",
                   help="sparse-mode rebuild: exact dense ranking (<=~1k "
                        "nodes) or the O(N) cell list for large systems")
    p.add_argument("--max_degree", type=int, default=32)
    p.add_argument("--cell_capacity", type=int, default=16)
    p.add_argument("--num_cells", type=int, default=4096)
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--predict_delta", action="store_true")
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last",
                   help="must match the training flag (constant-velocity "
                        "vs copy-last residual base)")
    p.add_argument("--electrostatics", choices=["none", "dh"],
                   default="none",
                   help="must match the training flag: checkpoints trained "
                        "with dh have a wider fc1")
    p.add_argument("--prior_damping", type=float, default=1.0,
                   help="damping on the extrapolate prior (must match training)")
    p.add_argument("--window_diff", action="store_true",
                   help="must match the training flag: the parameter tree "
                        "is identical either way, so a mismatch is "
                        "UNDETECTABLE at restore time and silently feeds "
                        "the LSTM the wrong encoding")
    p.add_argument("--window_diff_scale", type=float, default=100.0)
    p.add_argument("--kernel_quant", choices=["none", "int8"],
                   default="none",
                   help="int8-quantize the per-edge kernel matrices with "
                        "per-edge scales (serving mode: halves the "
                        "batched-rollout HBM traffic on the kernel "
                        "tensor; sparse scan path only)")
    p.add_argument("--clip", type=float, default=None)
    p.add_argument("--impl", choices=["scan", "persistent"], default="scan",
                   help="'persistent' = grid-over-steps Pallas kernel with "
                        "VMEM-resident weights (fastest single stream on "
                        "TPU; sparse graph semantics, requires "
                        "tie_edge_kernel)")
    p.add_argument("--streams", type=int, default=1,
                   help=">1 rolls that many streams batched (start frames "
                        "spaced --stream_stride apart); combine with "
                        "--stream_chunk to bound memory at high counts")
    p.add_argument("--stream_stride", type=int, default=1)
    p.add_argument("--stream_chunk", type=int, default=None)
    p.add_argument("--movie", action="store_true")
    p.add_argument("--backbone", action="store_true",
                   help="render 3-D backbone frames of the first rollout "
                        "steps (bba_analysis.ipynb cell 31 parity)")
    p.add_argument("--compilation_cache", type=Path, default=None,
                   help="persistent XLA compilation-cache dir: repeated "
                        "runs of the same rollout skip the TPU compile")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.compilation_cache is not None:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (  # noqa: E501
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import load_trajectory
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
        rollout_with_mse,
    )
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_subtree,
    )

    cfg = ModelConfig(
        width=args.width,
        ker_width=args.kernel_width,
        depth=args.depth,
        window_size=args.window_size,
        num_residues=args.num_residues,
        graph_mode=args.graph_mode,
        max_edges=args.max_edges,
        neighbor_impl=args.neighbor_impl,
        max_degree=args.max_degree,
        cell_capacity=args.cell_capacity,
        num_cells=args.num_cells,
        compute_dtype=args.compute_dtype,
        predict_delta=args.predict_delta,
        predict_prior=args.predict_prior,
        prior_damping=args.prior_damping,
        electrostatics=args.electrostatics,
        window_diff=args.window_diff,
        window_diff_scale=args.window_diff_scale,
        kernel_quant=args.kernel_quant,
    )
    if args.kernel_quant != "none" and args.graph_mode != "sparse":
        raise SystemExit("--kernel_quant int8 requires --graph_mode sparse")
    traj = load_trajectory(args.data_path)

    if args.checkpoint is not None:
        # Restore ONLY the params subtree: rollout never needs the optimizer
        # state, and a full-TrainState restore would require rebuilding the
        # exact optax chain the run trained with (grad clipping /
        # apply_if_finite change the opt_state treedef).
        template = gkn_init(jax.random.PRNGKey(0), cfg)
        params, meta = restore_subtree(args.checkpoint, template, ".params")
        print(f"Loaded checkpoint (epoch {meta.get('epoch', '?')})")
    else:
        params = gkn_init(jax.random.PRNGKey(0), cfg)
        print("No checkpoint given: random init (throughput/debug mode)")

    aa = jnp.asarray(traj.aminoacids)
    s = args.start_frame
    window0 = jnp.asarray(traj.positions[s : s + cfg.window_size])

    out_dir = Path(args.out_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.streams > 1:
        # Multi-stream serving: S rollouts batched on one chip (lax.map
        # chunking bounds live memory); writes (S, num_steps, R, 3).
        starts = [s + i * args.stream_stride for i in range(args.streams)]
        hi = max(starts) + cfg.window_size
        if hi > traj.num_frames:
            raise ValueError(
                f"streams x stride needs frame {hi}, trajectory has "
                f"{traj.num_frames}"
            )
        w0s = jnp.stack([
            jnp.asarray(traj.positions[st : st + cfg.window_size])
            for st in starts
        ])
        if args.impl == "persistent":
            # all streams inside ONE kernel launch: weights resident
            # across the step grid AND the in-kernel stream loop, live
            # memory bounded at one stream's intermediates
            from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
                make_persistent_rollout_fn,
            )

            if args.stream_chunk is not None:
                print("NOTE: --stream_chunk applies to the XLA batched "
                      "path only; the persistent kernel's live memory is "
                      "already flat in the stream count (ignoring it)")
            roll = make_persistent_rollout_fn(cfg, args.num_steps,
                                              args.threshold,
                                              clip=args.clip)
        else:
            roll = make_rollout_fn(cfg, args.num_steps, args.threshold,
                                   clip=args.clip, batched=True,
                                   stream_chunk=args.stream_chunk)
        t0 = time.time()
        coords, _, diags = roll(params, aa, w0s)
        coords = np.asarray(jax.block_until_ready(coords))
        dt = time.time() - t0
        np.save(out_dir / "forecast_coords.npy", coords)
        summary = {
            "streams": args.streams,
            "num_steps": args.num_steps,
            "seconds": dt,
            "agg_steps_per_s": args.streams * args.num_steps / dt,
            "finite": bool(np.isfinite(coords).all()),
            "edge_overflow": bool(np.any(np.asarray(
                diags["edge_overflow"]))),
        }
        (out_dir / "rollout_summary.json").write_text(
            json.dumps(summary, indent=2))
        print(json.dumps(summary))
        return summary

    truth_lo = s + cfg.window_size
    have_truth = truth_lo + args.num_steps <= traj.num_frames
    t0 = time.time()
    mses = None
    if args.impl == "persistent":
        from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (
            make_persistent_rollout_fn,
        )

        roll = make_persistent_rollout_fn(cfg, args.num_steps,
                                          args.threshold, clip=args.clip)
        coords, _, diags = roll(params, aa, window0)
        if bool(diags["edge_overflow"]):
            print("WARNING: graph rebuild exceeded max_edges during the "
                  "rollout; edges were truncated (raise --max_edges)")
        if have_truth:
            truth = traj.positions[truth_lo : truth_lo + args.num_steps]
            mses = np.mean(
                (np.asarray(coords) - truth) ** 2, axis=(1, 2)
            )
    elif have_truth:
        truth = jnp.asarray(traj.positions[truth_lo : truth_lo + args.num_steps])
        coords, mses, _ = jax.jit(
            lambda p, a, w, t: rollout_with_mse(
                p, cfg, a, w, t, args.threshold, clip=args.clip
            )
        )(params, aa, window0, truth)
    else:
        roll = make_rollout_fn(cfg, args.num_steps, args.threshold,
                               clip=args.clip)
        coords, _, diags = roll(params, aa, window0)
        if bool(diags["edge_overflow"]):
            print("WARNING: graph rebuild exceeded max_edges during the "
                  "rollout; edges were truncated (raise --max_edges)")
    if mses is not None:
        np.save(out_dir / "per_step_mse.npy", np.asarray(mses))
    coords = np.asarray(jax.block_until_ready(coords))
    dt = time.time() - t0
    np.save(out_dir / "forecast_coords.npy", coords)

    summary = {
        "num_steps": args.num_steps,
        "seconds": dt,
        "steps_per_s": args.num_steps / dt,
        "finite": bool(np.isfinite(coords).all()),
    }
    if have_truth:
        m = np.asarray(mses)
        summary["mse_first"] = float(m[0])
        summary["mse_last"] = float(m[-1])
    (out_dir / "rollout_summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))

    if args.movie:
        from molecular_dynamics_neural_operator_tpu.geometry import contact_map as cm_fn
        from molecular_dynamics_neural_operator_tpu.utils.movie import (
            render_propagation_movie,
        )

        n = min(args.num_steps, 20)
        fc = [np.asarray(cm_fn(jnp.asarray(coords[i]), args.threshold))
              for i in range(n)]
        real = [
            np.asarray(cm_fn(jnp.asarray(traj.positions[truth_lo + i]),
                             args.threshold))
            for i in range(min(n, traj.num_frames - truth_lo))
        ]
        render_propagation_movie(out_dir, 0, fc, real[: len(fc)])

    if args.backbone:
        from molecular_dynamics_neural_operator_tpu.utils.backbone import (
            render_backbone_trajectory,
        )

        n = min(args.num_steps, 8)
        real_bb = None
        if have_truth:
            real_bb = [traj.positions[truth_lo + i] for i in range(n)]
        render_backbone_trajectory(out_dir, [coords[i] for i in range(n)],
                                   real_bb)
    return summary


if __name__ == "__main__":
    main()
