"""Accuracy loop vs the ACTUAL reference model (BASELINE north-star).

Trains the flagship GKN (curriculum recipe, tools/accuracy_eval.py), exports
the checkpoint into the faithful plain-torch replica of the reference
architecture (tools/torch_replica.py, utils/torch_export.py), rolls BOTH
implementations out from the identical window — ours as the jitted lax.scan
(rollout/scan.py), the replica with the reference's own host loop
(``/root/reference/graph_kernel.py:396-413`` semantics: scipy rebuild of the
last frame's contact map each step) — and reports the divergence:

- per-step coordinate RMSE between the two trajectories,
- per-step contact-map RMSE between their contact maps (the north-star:
  "rollout contact-map RMSE within 1% of the reference CPU model"),
- plus both models' fidelity vs ground truth for context.

    python tools/reference_parity.py [--train_steps 2000] [--horizon 128]

Writes tools/reference_parity_results.json.
"""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=2000)
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--frames", type=int, default=4000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out", type=Path,
                   default=Path(__file__).parent / "reference_parity_results.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from molecular_dynamics_neural_operator_tpu.configs import (
        ModelConfig, TrainConfig)
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset, synthetic_trajectory)
    from molecular_dynamics_neural_operator_tpu.geometry import contact_map
    from molecular_dynamics_neural_operator_tpu.rollout import make_rollout_fn
    from molecular_dynamics_neural_operator_tpu.train import (
        train_valid_split)
    from molecular_dynamics_neural_operator_tpu.train.recipe import (
        train_curriculum_recipe)
    from molecular_dynamics_neural_operator_tpu.utils.torch_export import (
        export_reference_state_dict)
    from tools.torch_replica import (
        TorchKernelNN, torch_recursive_propagation)

    # --- train (flagship recipe: f32 + clip + skip-nonfinite + K warmup)
    traj = synthetic_trajectory(num_frames=args.frames, num_residues=28,
                                seed=11)
    cfg = ModelConfig(compute_dtype="float32", graph_mode="sparse",
                      max_edges=512, predict_delta=True)
    tcfg = TrainConfig(lr=args.lr, weight_decay=1e-6, batch_size=args.batch,
                       grad_clip_norm=1.0, skip_nonfinite_updates=True)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=512)
    tr_idx, va_idx = train_valid_split(len(ds), 0.8, "partition")
    state, train_seconds, last_loss = train_curriculum_recipe(
        cfg, tcfg, ds, tr_idx, steps=args.train_steps, k=args.k)

    # --- export to the reference replica (identical weights)
    params_np = jax.tree_util.tree_map(np.asarray, state.params)
    sd = export_reference_state_dict(params_np, cfg)
    replica = TorchKernelNN(cfg.width, cfg.ker_width, cfg.depth,
                            cfg.window_size, cfg.num_residues,
                            predict_delta=cfg.predict_delta)
    replica.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                            strict=True)

    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        save_checkpoint)

    ckpt_path = args.out.parent / "reference_parity_ckpt.npz"
    save_checkpoint(ckpt_path, state, {"train_steps": args.train_steps})

    # --- roll out both from identical windows (two independent starts)
    aa_np = np.asarray(traj.aminoacids)
    roll = make_rollout_fn(cfg, num_steps=args.horizon)

    def cms(c):
        return np.asarray(contact_map(jnp.asarray(c), 8.0))

    torch_seconds = 0.0
    comparisons = []
    starts = [int(va_idx[0]), int(va_idx[len(va_idx) // 2])]
    pers = None
    try:
        from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
            make_persistent_rollout_fn, pallas_available)

        if pallas_available():
            pers = make_persistent_rollout_fn(cfg, num_steps=args.horizon)
    except Exception:
        pers = None

    for start in starts:
        w0_np = np.asarray(traj.positions[start : start + cfg.window_size])
        coords_jax, _, diags = roll(state.params, jnp.asarray(aa_np),
                                    jnp.asarray(w0_np))
        coords_jax = np.asarray(coords_jax)
        persistent_maxdiff = None
        if pers is not None:
            coords_p, _, _ = pers(state.params, jnp.asarray(aa_np),
                                  jnp.asarray(w0_np))
            persistent_maxdiff = float(
                np.abs(np.asarray(coords_p) - coords_jax).max())
        t1 = time.time()
        coords_ref = torch_recursive_propagation(replica, w0_np, aa_np,
                                                 args.horizon)
        torch_seconds += time.time() - t1

        cm_jax, cm_ref = cms(coords_jax), cms(coords_ref)
        lo = start + cfg.window_size
        truth = np.asarray(traj.positions[lo : lo + args.horizon])
        cm_true = cms(truth)
        coord_diff = np.abs(coords_jax - coords_ref).max(axis=(1, 2))
        coord_rmse = np.sqrt(
            np.mean((coords_jax - coords_ref) ** 2, axis=(1, 2)))
        cm_rmse = np.sqrt(np.mean((cm_jax - cm_ref) ** 2, axis=(1, 2)))
        qi = np.linspace(0, args.horizon - 1, 9).astype(int)
        comparisons.append({
            "start_frame": start,
            "edge_overflow": bool(diags["edge_overflow"]),
            "persistent_kernel_vs_scan_maxdiff": persistent_maxdiff,
            "coord_maxdiff_curve": [float(coord_diff[i]) for i in qi],
            "coord_rmse_mean": float(coord_rmse.mean()),
            "coord_rmse_max": float(coord_rmse.max()),
            "contact_map_rmse_mean": float(cm_rmse.mean()),
            "contact_map_rmse_max": float(cm_rmse.max()),
            "contact_map_agreement_mean": float(np.mean(cm_jax == cm_ref)),
            "within_1pct": bool(cm_rmse.mean() < 0.01),
            "vs_ground_truth": {
                "jax_contact_rmse_mean": float(np.sqrt(
                    np.mean((cm_jax - cm_true) ** 2, axis=(1, 2))).mean()),
                "reference_contact_rmse_mean": float(np.sqrt(
                    np.mean((cm_ref - cm_true) ** 2, axis=(1, 2))).mean()),
                "jax_contact_accuracy_mean": float(
                    np.mean(cm_jax == cm_true)),
                "reference_contact_accuracy_mean": float(
                    np.mean(cm_ref == cm_true)),
            },
        })

    out = {
        "train_steps": args.train_steps,
        "train_seconds": round(train_seconds, 1),
        "final_train_loss": last_loss,
        "horizon": args.horizon,
        "checkpoint": str(ckpt_path),
        "torch_rollout_seconds": round(torch_seconds, 1),
        "note": (
            "coord_maxdiff_curve samples max|coord_jax - coord_ref| along "
            "the rollout. Expect float-noise-level tracking (<= ~0.02 A "
            "drift over 128 steps; sometimes exactly 0.0 when the "
            "predict_delta head's sub-half-ulp noise is re-rounded away "
            "each step) with 100% contact-map agreement. "
            "persistent_kernel_vs_scan_maxdiff pins the Pallas kernel "
            "against the XLA scan on the same checkpoint."
        ),
        "comparisons": comparisons,
        "within_1pct_all": bool(all(c["within_1pct"] for c in comparisons)),
    }
    args.out.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
