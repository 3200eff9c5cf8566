"""FNO quality gate (VERDICT r3 item 3): train the FNO family to
convergence and report free-rollout fidelity with the same honesty
harness as the GKN's ``accuracy_eval`` — per-step error, contact-map
accuracy, and the copy-last baseline ratios.

The FNO state is the (R, R) distance matrix (models/fno.py), so the
metrics live in that space: per-step distance-matrix MSE and contact
maps thresholded directly on the predicted matrices (< 8 Å, zero
diagonal == self-loops, matching geometry.contact_map semantics). The
copy-last baseline freezes the window's last TRUE distance matrix.

Run on TPU:  python tools/fno_accuracy_eval.py --out tools/fno_accuracy_results.json
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset, langevin_trajectory, synthetic_trajectory)
from molecular_dynamics_neural_operator_tpu.geometry import contact_map
from molecular_dynamics_neural_operator_tpu.models.fno import (
    distance_matrix_channels,
    fno_init,
    fno_rollout_scan,
    make_fno_curriculum_train_step,
)
from molecular_dynamics_neural_operator_tpu.train import train_valid_split
from molecular_dynamics_neural_operator_tpu.train.optim import make_optimizer
from molecular_dynamics_neural_operator_tpu.train.state import TrainState


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--warmup_frac", type=float, default=0.25)
    p.add_argument("--frames", type=int, default=4000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--scheduler_step", type=int, default=20)
    p.add_argument("--scheduler_gamma", type=float, default=0.7)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--modes", type=int, default=12)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--threshold", type=float, default=8.0)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--predict_delta", action="store_true",
                   help="residual head (out = last DM + network)")
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last",
                   help="residual base: copy-last DM or constant-velocity "
                        "2 D_t - D_{t-1} (FNOConfig.predict_prior)")
    p.add_argument("--prior_damping", type=float, default=1.0,
                   help="damping on the extrapolate prior "
                        "(FNOConfig.prior_damping)")
    p.add_argument("--head_scale", type=float, default=1.0,
                   help="GNS target normalization on the residual head "
                        "(configs.FNOConfig.head_scale)")
    p.add_argument("--head_init", choices=["default", "zero"],
                   default="default",
                   help="'zero' zero-inits the proj2 head so the step-0 "
                        "forecast is exactly the prior")
    p.add_argument("--preset", choices=["bba", "trp_cage", "villin"],
                   default="bba",
                   help="protein preset: sets num_residues (modes are "
                        "clamped to the grid's spectrum) — the FNO rows "
                        "for BASELINE config 3's fast folders")
    p.add_argument("--generator", choices=["modes", "langevin"],
                   default="modes",
                   help="synthetic family (see tools/accuracy_eval.py)")
    p.add_argument("--compilation_cache", type=str, default=None)
    args = p.parse_args()

    if args.compilation_cache:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (
            enable_compilation_cache)
        enable_compilation_cache(args.compilation_cache)

    # same trajectory family + split as the GKN gates (accuracy_eval.py /
    # fast_folder_eval.py: BBA seed 11, fast folders seed 13)
    from molecular_dynamics_neural_operator_tpu.presets import PRESETS
    num_residues = (PRESETS[args.preset].num_residues
                    if args.preset != "bba" else 28)
    seed_traj = 11 if args.preset == "bba" else 13
    gen = (langevin_trajectory if args.generator == "langevin"
           else synthetic_trajectory)
    traj = gen(num_frames=args.frames, num_residues=num_residues,
               seed=seed_traj)
    # retained modes must fit the preset's grid (modes2 indexes the rfft
    # half-spectrum): clamp rather than error so one flag set covers all
    # presets (trp_cage's 20-residue grid caps modes2 at 11)
    m1 = min(args.modes, num_residues)
    m2 = min(args.modes, num_residues // 2 + 1)
    cfg = FNOConfig(width=args.width, modes1=m1, modes2=m2,
                    depth=args.depth, in_channels=args.window,
                    num_residues=traj.num_residues,
                    predict_delta=args.predict_delta,
                    predict_prior=args.predict_prior,
                    prior_damping=args.prior_damping,
                    head_scale=args.head_scale,
                    head_init=args.head_init)
    ds = WindowDataset(traj, window_size=args.window, graph_mode="none")
    tr_idx, va_idx = train_valid_split(len(ds), 0.8, "partition")
    # curriculum batches need idx + window + K <= num_frames
    tr_pool = tr_idx[tr_idx + args.window + args.k <= traj.num_frames]

    steps_per_epoch = max(1, len(tr_pool) // args.batch)
    tx, _ = make_optimizer(lr=args.lr, weight_decay=1e-6,
                           scheduler_step=args.scheduler_step,
                           scheduler_gamma=args.scheduler_gamma,
                           steps_per_epoch=steps_per_epoch,
                           grad_clip_norm=1.0,
                           skip_nonfinite_updates=True)
    params = fno_init(jax.random.PRNGKey(args.seed), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(args.seed))

    step_k1 = make_fno_curriculum_train_step(cfg, tx, rollout_steps=1)
    step_k = (make_fno_curriculum_train_step(cfg, tx, rollout_steps=args.k)
              if args.k > 1 else step_k1)
    warmup = int(args.steps * args.warmup_frac)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    last_loss = float("nan")
    for i in range(args.steps):
        idx = rng.choice(tr_pool, size=args.batch, replace=False)
        k_now = 1 if i < warmup else args.k
        batch = ds.get_batch(idx, rollout_horizon=k_now)
        step = step_k1 if k_now == 1 else step_k
        state, m = step(state, batch)
        if i % 500 == 0 or i == args.steps - 1:
            last_loss = float(m["rel_l2"])
            print(f"step {i}: rel_l2 {last_loss:.4f} (K={k_now}, "
                  f"{time.time() - t0:.0f}s)", flush=True)
    train_seconds = time.time() - t0

    # --- free rollout from the validation region (distance-matrix space)
    start = int(va_idx[0])
    w_coords = jnp.asarray(traj.positions[start : start + args.window])
    channels0 = distance_matrix_channels(w_coords)  # (R, R, T)
    lo = start + args.window
    truth_coords = jnp.asarray(traj.positions[lo : lo + args.horizon])
    truth_dm = jax.vmap(
        lambda c: distance_matrix_channels(c[None])[..., 0]
    )(truth_coords)  # (T, R, R)

    preds, _ = jax.jit(
        lambda p, ch: fno_rollout_scan(p, cfg, ch, args.horizon)
    )(state.params, channels0)
    preds = np.asarray(preds)
    truth_dm = np.asarray(truth_dm)

    dm_mse = np.mean((preds - truth_dm) ** 2, axis=(1, 2))
    cm_true = np.asarray(contact_map(truth_coords, args.threshold))
    cm_pred = (preds < args.threshold).astype(np.float32)
    cm_acc = np.mean(cm_pred == cm_true, axis=(1, 2))

    # copy-last baseline: freeze the window's last TRUE distance matrix
    frozen = np.asarray(channels0[..., -1])
    base_mse = np.mean((frozen[None] - truth_dm) ** 2, axis=(1, 2))
    base_cm = (frozen < args.threshold).astype(np.float32)
    base_acc = np.mean(base_cm[None] == cm_true, axis=(1, 2))

    # constant-velocity extrapolation in distance-matrix space — the
    # linear rival of the FNO's own extrapolate prior (second honesty
    # bar, VERDICT r4 item 4)
    prev = np.asarray(channels0[..., -2])
    ks = np.arange(1, len(truth_dm) + 1)[:, None, None]
    ex_dm = frozen[None] + ks * (frozen - prev)[None]
    ex_mse = np.mean((ex_dm - truth_dm) ** 2, axis=(1, 2))
    ex_cm = (ex_dm < args.threshold).astype(np.float32)
    ex_acc = np.mean(ex_cm == cm_true, axis=(1, 2))

    fin = int(np.isfinite(preds).all(axis=(1, 2)).sum())

    def at(a, s):
        return float(a[min(s - 1, len(a) - 1)])

    out = {
        "config": vars(args),
        "train_seconds": train_seconds,
        "final_train_loss": last_loss,
        "rollout_finite_steps": fin,
        "dm_mse": {f"step{s}": at(dm_mse, s) for s in (1, 10, 100)},
        "contact_map_accuracy": {
            f"step{s}": at(cm_acc, s) for s in (1, 10, 100)},
        "contact_map_accuracy_mean": float(cm_acc.mean()),
        "baseline_copy_last": {
            "dm_mse": {f"step{s}": at(base_mse, s) for s in (1, 10, 100)},
            "contact_map_accuracy_mean": float(base_acc.mean()),
        },
        "model_over_baseline_dm_mse": {
            f"step{s}": (at(dm_mse, s) / at(base_mse, s)
                         if fin >= s else None)
            for s in (1, 10, 100)
        },
        "baseline_extrapolation": {
            "dm_mse": {f"step{s}": at(ex_mse, s) for s in (1, 10, 100)},
            "contact_map_accuracy_mean": float(ex_acc.mean()),
        },
        "model_over_extrapolation_dm_mse": {
            f"step{s}": (at(dm_mse, s) / at(ex_mse, s)
                         if fin >= s else None)
            for s in (1, 10, 100)
        },
    }
    print(json.dumps(out, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
