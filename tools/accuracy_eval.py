"""Train-and-evaluate accuracy gate: rollout contact-map fidelity.

Trains the flagship GKN (curriculum K) on a synthetic BBA-scale trajectory
and reports free-rollout quality vs ground truth: per-step coordinate MSE
and contact-map RMSE / accuracy over a horizon. Run on TPU:

    python tools/accuracy_eval.py [--steps 3000] [--horizon 100]

(The reference model itself is not runnable here — no torch_geometric —
so fidelity is measured against the trajectory's true contact maps, the
quantity the reference's own movies/metrics track,
bba_analysis.ipynb cells 19-27.)
"""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig, TrainConfig
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset, langevin_trajectory, synthetic_trajectory)
from molecular_dynamics_neural_operator_tpu.geometry import contact_map
from molecular_dynamics_neural_operator_tpu.train import train_valid_split
from molecular_dynamics_neural_operator_tpu.train.recipe import (
    train_curriculum_recipe)
from molecular_dynamics_neural_operator_tpu.rollout import rollout_with_mse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--frames", type=int, default=4000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--coord_clip", type=float, default=1000.0,
                   help="clip rail on the curriculum's inner rollout "
                        "coordinates (0 disables)")
    p.add_argument("--warmup_frac", type=float, default=0.25,
                   help="fraction of steps trained teacher-forced (K=1) "
                        "before switching to K")
    p.add_argument("--max_edges", type=int, default=512)
    p.add_argument("--train_conv_impl", default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scheduler_step", type=int, default=50,
                   help="StepLR decay interval in epochs of the train split")
    p.add_argument("--scheduler_gamma", type=float, default=0.8)
    p.add_argument("--loss_space", choices=["absolute", "delta"],
                   default="absolute")
    p.add_argument("--grad_steps", type=int, default=-1,
                   help="supervise only the last j curriculum steps "
                        "(burn-in + truncated backprop; 0 = full BPTT, "
                        "-1 = recipe default, currently j=1)")
    p.add_argument("--burnin_dtype", choices=["bfloat16"], default=None,
                   help="dtype for the curriculum burn-in prefix (see "
                        "train/curriculum.py)")
    p.add_argument("--noise_std", type=float, default=0.0,
                   help="GNS-style random-walk input-noise std on the "
                        "training windows (0 disables)")
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last",
                   help="residual-head base forecast (models/gkn.py "
                        "residual_prior)")
    p.add_argument("--prior_damping", type=float, default=1.0,
                   help="damping on the extrapolate prior's implied "
                        "velocity (1.0 = pure constant-velocity)")
    p.add_argument("--head_init", choices=["default", "zero"],
                   default="default",
                   help="'zero' zero-initializes the fc2 head so the "
                        "step-0 forecast is exactly the prior")
    p.add_argument("--head_scale", default="1.0",
                   help="GNS target normalization on the residual head "
                        "(configs.ModelConfig.head_scale): a float, or "
                        "'auto' to calibrate to std(y - prior) measured "
                        "on the training windows")
    p.add_argument("--kernel_init_scale", type=float, default=1.0,
                   help="multiplier on the edge-kernel MLP's final-layer "
                        "init — 0.25 tames the conv stack's 3.2x/layer "
                        "init gain (tools/init_gain_probe.py), the root "
                        "cause of the K=1 transient and K-switch "
                        "explosions")
    p.add_argument("--generator", choices=["modes", "langevin"],
                   default="modes",
                   help="synthetic family: 'modes' = noiseless 3-sinusoid "
                        "breathing (linear forecasters are near-optimal on "
                        "it); 'langevin' = anharmonic double-well network "
                        "under Langevin dynamics — the benchmark where "
                        "learning is required (data/synthetic.py)")
    p.add_argument("--graph_frame", choices=["first", "rebuild"],
                   default="first",
                   help="teacher-step graph source: 'first' = the stored "
                        "window-START graph (reference training semantics, "
                        "dataset.py:189,197); 'rebuild' = rebuild from the "
                        "window's LAST frame on device, matching the free "
                        "steps and the inference rollout — required on the "
                        "langevin family, where the force correction "
                        "depends on CURRENT pair geometry")
    p.add_argument("--window_diff", action="store_true",
                   help="encode the window as [last frame ; scaled frame "
                        "diffs] so the LSTM sees velocities directly")
    p.add_argument("--window_diff_scale", type=float, default=100.0,
                   help="multiplier on the frame diffs under --window_diff")
    p.add_argument("--compilation_cache", type=str, default=None,
                   help="persistent XLA compilation cache dir (sweeps "
                        "re-use compiled steps across processes)")
    p.add_argument("--out", type=str, default=None,
                   help="also write the JSON blob to this path")
    args = p.parse_args()

    if args.compilation_cache:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (
            enable_compilation_cache)
        enable_compilation_cache(args.compilation_cache)

    gen = (langevin_trajectory if args.generator == "langevin"
           else synthetic_trajectory)
    traj = gen(num_frames=args.frames, num_residues=28, seed=11)
    if args.head_scale == "auto":
        # Calibrate to the std of the learning target: the residual beyond
        # the prior, measured over the whole trajectory (numpy, host-side).
        pos = traj.positions
        if args.predict_prior == "extrapolate":
            prior = pos[1:-1] + args.prior_damping * (pos[1:-1] - pos[:-2])
            resid = pos[2:] - prior
        else:
            resid = pos[1:] - pos[:-1]
        head_scale = float(np.std(resid))
        print(f"head_scale auto -> {head_scale:.6g}")
    else:
        head_scale = float(args.head_scale)
    args.head_scale = head_scale  # recorded in the JSON config blob
    cfg = ModelConfig(compute_dtype=args.dtype, graph_mode="sparse",
                      max_edges=args.max_edges, predict_delta=True,
                      predict_prior=args.predict_prior,
                      prior_damping=args.prior_damping,
                      head_scale=head_scale,
                      head_init=args.head_init,
                      kernel_init_scale=args.kernel_init_scale,
                      train_conv_impl=args.train_conv_impl,
                      window_diff=args.window_diff,
                      window_diff_scale=args.window_diff_scale)
    tcfg = TrainConfig(lr=args.lr, weight_decay=1e-6, batch_size=args.batch,
                       grad_clip_norm=args.grad_clip,
                       skip_nonfinite_updates=True,
                       scheduler_step=args.scheduler_step,
                       scheduler_gamma=args.scheduler_gamma)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=args.max_edges)
    tr_idx, va_idx = train_valid_split(len(ds), 0.8, "partition")
    cc = args.coord_clip if args.coord_clip > 0 else None
    state, train_seconds, last_loss = train_curriculum_recipe(
        cfg, tcfg, ds, tr_idx, steps=args.steps, k=args.k,
        warmup_frac=args.warmup_frac, coord_clip=cc, seed=args.seed,
        loss_space=args.loss_space,
        grad_steps=("default" if args.grad_steps < 0
                    else args.grad_steps if args.grad_steps > 0 else None),
        noise_std=args.noise_std,
        burnin_dtype=args.burnin_dtype,
        graph_frame=args.graph_frame,
    )

    # --- evaluation: free rollout from the validation region
    aa = jnp.asarray(traj.aminoacids)
    start = int(va_idx[0])
    w0 = jnp.asarray(traj.positions[start : start + cfg.window_size])
    lo = start + cfg.window_size
    truth = jnp.asarray(traj.positions[lo : lo + args.horizon])
    coords, mses, _ = jax.jit(
        lambda p, a, w, t: rollout_with_mse(p, cfg, a, w, t)
    )(state.params, aa, w0, truth)
    coords = np.asarray(coords); mses = np.asarray(mses)

    cm_pred = np.asarray(contact_map(jnp.asarray(coords), 8.0))
    cm_true = np.asarray(contact_map(truth, 8.0))
    cm_rmse = np.sqrt(np.mean((cm_pred - cm_true) ** 2, axis=(1, 2)))
    cm_acc = np.mean(cm_pred == cm_true, axis=(1, 2))

    out = {
        "config": {k: v for k, v in vars(args).items()
                   if k not in ("out", "compilation_cache")},
        "train_steps": args.steps,
        "train_seconds": train_seconds,
        "final_train_loss": last_loss,
        "rollout_finite_steps": int(np.isfinite(coords).all(axis=(1,2)).sum()),
        "coord_mse": {"step1": float(mses[0]),
                      "step10": float(mses[min(9, len(mses)-1)]),
                      "step100": float(mses[min(99, len(mses)-1)])},
        "contact_map_rmse": {"step1": float(cm_rmse[0]),
                             "step10": float(cm_rmse[min(9, len(cm_rmse)-1)]),
                             "step100": float(cm_rmse[min(99, len(cm_rmse)-1)]),
                             "mean": float(cm_rmse.mean())},
        "contact_map_accuracy_mean": float(cm_acc.mean()),
    }

    # Copy-last-frame (zero-delta) baseline: the honesty bar. On slowly
    # varying trajectories the frozen last window frame scores high contact
    # accuracy with NO model at all; a result only means learning if it
    # beats these numbers.
    from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
        copy_last_baseline,
        linear_extrapolation_baseline,
    )

    base_mse, base_acc = copy_last_baseline(w0[-1], truth, 8.0)
    out["baseline_copy_last"] = {
        "coord_mse": {"step1": float(base_mse[0]),
                      "step10": float(base_mse[min(9, len(base_mse)-1)]),
                      "step100": float(base_mse[min(99, len(base_mse)-1)])},
        "contact_map_accuracy_mean": float(base_acc.mean()),
    }
    fin = int(out["rollout_finite_steps"])
    out["model_over_baseline_mse"] = {
        # <1 means the model beats copy-last-frame at that horizon; None
        # where the rollout went non-finite first (bare NaN is not JSON)
        "step1": float(mses[0] / base_mse[0]) if fin >= 1 else None,
        "step10": float(mses[min(9, fin-1)] / base_mse[min(9, fin-1)])
        if fin >= 10 else None,
        "step100": float(mses[min(99, fin-1)] / base_mse[min(99, fin-1)])
        if fin >= 100 else None,
    }
    # Second honesty bar: constant-velocity extrapolation (rollout/
    # baseline.py) — the stronger trivial forecaster on smooth data; a
    # learned operator's value shows as <1 at LONG horizons where the
    # linear forecast diverges.
    ex_mse, ex_acc = linear_extrapolation_baseline(
        w0[-2], w0[-1], truth, 8.0)
    out["baseline_extrapolation"] = {
        "coord_mse": {"step1": float(ex_mse[0]),
                      "step10": float(ex_mse[min(9, len(ex_mse)-1)]),
                      "step100": float(ex_mse[min(99, len(ex_mse)-1)])},
        "contact_map_accuracy_mean": float(ex_acc.mean()),
    }
    out["model_over_extrapolation_mse"] = {
        "step1": float(mses[0] / ex_mse[0]) if fin >= 1 else None,
        "step10": float(mses[min(9, fin-1)] / ex_mse[min(9, fin-1)])
        if fin >= 10 else None,
        "step100": float(mses[min(99, fin-1)] / ex_mse[min(99, fin-1)])
        if fin >= 100 else None,
    }
    if args.predict_prior == "extrapolate" and args.prior_damping != 1.0:
        # Third honesty bar: the model's OWN prior rolled out headless
        # (closed form) — a damped prior interpolates copy-last and
        # extrapolation and can clear both bars with no learning.
        from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
            damped_extrapolation_baseline,
        )

        dp_mse, dp_acc = damped_extrapolation_baseline(
            w0[-2], w0[-1], truth, args.prior_damping, 8.0)
        out["baseline_prior_only"] = {
            "coord_mse": {"step1": float(dp_mse[0]),
                          "step10": float(dp_mse[min(9, len(dp_mse)-1)]),
                          "step100": float(dp_mse[min(99, len(dp_mse)-1)])},
            "contact_map_accuracy_mean": float(dp_acc.mean()),
        }
        out["model_over_prior_only_mse"] = {
            "step1": float(mses[0] / dp_mse[0]) if fin >= 1 else None,
            "step10": float(mses[min(9, fin-1)] / dp_mse[min(9, fin-1)])
            if fin >= 10 else None,
            "step100": float(mses[min(99, fin-1)] / dp_mse[min(99, fin-1)])
            if fin >= 100 else None,
        }
    if len(mses) > 100:
        # long-horizon runs: keep the full (decimated) curves so the
        # extrapolation-divergence crossover is in the artifact
        stride = max(1, len(mses) // 200)
        idx = list(range(0, min(fin, len(mses)), stride))
        out["per_step_mse"] = {
            "stride": stride,
            "model": [float(mses[i]) for i in idx],
            "copy_last": [float(base_mse[i]) for i in idx],
            "extrapolation": [float(ex_mse[i]) for i in idx],
        }
        ratio = np.asarray(mses[:fin]) / np.asarray(ex_mse[:fin])
        below = np.nonzero(ratio < 1.0)[0]
        out["extrapolation_crossover_step"] = (
            int(below[0]) + 1 if below.size else None)
    print(json.dumps(out, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
