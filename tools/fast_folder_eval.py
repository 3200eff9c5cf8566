"""BASELINE config 3: fast-folder presets (Trp-cage, villin) for real.

Per preset: synthesize a fast-folder-scale trajectory, train the
100-step-rollout curriculum recipe (K-step rollout-in-the-loss with K=1
warmup, f32 + clip + skip-nonfinite — tools/accuracy_eval.py), evaluate a
100-step free rollout (contact-map RMSE/accuracy vs ground truth), and
measure single-stream rollout throughput. Run on TPU:

    python tools/fast_folder_eval.py [--steps 1500] [--presets trp_cage villin]

Writes tools/fast_folder_results.json — the config-3 row alongside the BBA
numbers (docs/PERFORMANCE.md).
"""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def run_preset(name: str, train_steps: int, horizon: int, k: int,
               frames: int, batch: int, lr: float, prior="last",
               head_init="default", prior_damping=1.0,
               kernel_init_scale=1.0, generator="modes") -> dict:
    import jax
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.configs import TrainConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset, langevin_trajectory, synthetic_trajectory)
    from molecular_dynamics_neural_operator_tpu.geometry import contact_map
    from molecular_dynamics_neural_operator_tpu.presets import PRESETS
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn, rollout_with_mse)
    from molecular_dynamics_neural_operator_tpu.train import (
        train_valid_split)
    from molecular_dynamics_neural_operator_tpu.train.recipe import (
        train_curriculum_recipe)

    cfg = dataclasses.replace(
        PRESETS[name], compute_dtype="float32", graph_mode="sparse",
        max_edges=PRESETS[name].max_edges, predict_delta=True,
        predict_prior=prior, head_init=head_init,
        prior_damping=prior_damping, kernel_init_scale=kernel_init_scale,
    )
    r = cfg.num_residues
    gen = (langevin_trajectory if generator == "langevin"
           else synthetic_trajectory)
    traj = gen(num_frames=frames, num_residues=r, seed=13)
    tcfg = TrainConfig(lr=lr, weight_decay=1e-6, batch_size=batch,
                       grad_clip_norm=1.0, skip_nonfinite_updates=True)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=cfg.max_edges)
    tr_idx, va_idx = train_valid_split(len(ds), 0.8, "partition")
    state, train_seconds, last_loss = train_curriculum_recipe(
        cfg, tcfg, ds, tr_idx, steps=train_steps, k=k,
        log_prefix=f"[{name}] ")

    # 100-step free rollout accuracy from the validation region
    aa = jnp.asarray(traj.aminoacids)
    start = int(va_idx[0])
    w0 = jnp.asarray(traj.positions[start : start + cfg.window_size])
    lo = start + cfg.window_size
    truth = jnp.asarray(traj.positions[lo : lo + horizon])
    coords, mses, _ = jax.jit(
        lambda p, a, w, t: rollout_with_mse(p, cfg, a, w, t)
    )(state.params, aa, w0, truth)
    coords = np.asarray(coords)
    cm_pred = np.asarray(contact_map(jnp.asarray(coords), 8.0))
    cm_true = np.asarray(contact_map(truth, 8.0))
    cm_rmse = np.sqrt(np.mean((cm_pred - cm_true) ** 2, axis=(1, 2)))
    cm_acc = np.mean(cm_pred == cm_true, axis=(1, 2))

    # honesty bars (rollout/baseline.py): copy-last + constant-velocity
    from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
        copy_last_baseline, linear_extrapolation_baseline)
    base_mse, base_acc = copy_last_baseline(w0[-1], truth, 8.0)
    ex_mse, ex_acc = linear_extrapolation_baseline(w0[-2], w0[-1], truth, 8.0)

    # single-stream rollout throughput (slope between two lengths)
    def run_len(n):
        roll = make_rollout_fn(cfg, num_steps=n, clip=100.0)
        c, *_ = roll(state.params, aa, w0)
        float(jnp.sum(c))
        t0 = time.perf_counter()
        c, *_ = roll(state.params, aa, w0)
        float(jnp.sum(c))
        return time.perf_counter() - t0

    t1, t2 = run_len(1000), run_len(3000)
    steps_per_s = 2000 / max(t2 - t1, 1e-9)

    return {
        "preset": name,
        "generator": generator,
        "predict_prior": prior,
        "head_init": head_init,
        "prior_damping": prior_damping,
        "kernel_init_scale": kernel_init_scale,
        "num_residues": r,
        "train_steps": train_steps,
        "train_seconds": round(train_seconds, 1),
        "final_train_loss": last_loss,
        "horizon": horizon,
        "rollout_finite_steps": int(
            np.isfinite(coords).all(axis=(1, 2)).sum()),
        "contact_map_rmse_mean": float(cm_rmse.mean()),
        "contact_map_accuracy_mean": float(cm_acc.mean()),
        "baseline_copy_last_contact_accuracy_mean": float(base_acc.mean()),
        "baseline_extrapolation_contact_accuracy_mean": float(ex_acc.mean()),
        "model_over_copy_last_mse_mean": float(
            np.mean(np.asarray(mses)) / np.mean(base_mse)),
        "model_over_extrapolation_mse_mean": float(
            np.mean(np.asarray(mses)) / np.mean(ex_mse)),
        "rollout_steps_per_s": round(steps_per_s, 0),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--frames", type=int, default=4000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--presets", nargs="+", default=["trp_cage", "villin"])
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last")
    p.add_argument("--head_init", choices=["default", "zero"],
                   default="default")
    p.add_argument("--prior_damping", type=float, default=1.0)
    p.add_argument("--kernel_init_scale", type=float, default=1.0)
    p.add_argument("--generator", choices=["modes", "langevin"],
                   default="modes")
    p.add_argument("--out", type=Path,
                   default=Path(__file__).parent / "fast_folder_results.json")
    args = p.parse_args()

    results = [
        run_preset(name, args.steps, args.horizon, args.k, args.frames,
                   args.batch, args.lr, prior=args.predict_prior,
                   head_init=args.head_init,
                   prior_damping=args.prior_damping,
                   kernel_init_scale=args.kernel_init_scale,
                   generator=args.generator)
        for name in args.presets
    ]
    args.out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
