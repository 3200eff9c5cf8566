"""Pin WHICH side of bf16 reintroduces the copy-last cancellation
(VERDICT r3 item 2 fallback): training-side gradient noise vs
inference-side forward arithmetic.

Protocol: train ONE model with the f32 round-3 recipe (the configuration
measured to beat the copy-last baseline 0.22x/0.29x/0.83x), then roll
the SAME trained parameters out under

  (a) f32 inference            (the known-good control),
  (b) bf16 inference           (body matmuls in bf16),
  (c) bf16 + window_diff decode is impossible post-hoc (encoder dtype is
      not a runtime switch) — instead (c) quantifies the per-step bf16
      forward perturbation directly: ||pred_f32 - pred_bf16|| vs the true
      per-step displacement ||y_{t+1} - y_t||.

If (b) still beats the baseline, bf16 forward arithmetic preserves the
displacement signal and the gap is TRAINING-side (gradient noise under
bf16). If (b) collapses to the baseline, the forward itself rounds the
signal away — a hardware-arithmetic bound no recipe can cross, and f32
(or f32 head/residual) stays mandatory for quality serving.

Usage (TPU): python tools/bf16_inference_probe.py --out tools/bf16_inference_probe.json
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import (
    ModelConfig, TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset, synthetic_trajectory)
from molecular_dynamics_neural_operator_tpu.geometry import contact_map
from molecular_dynamics_neural_operator_tpu.rollout import rollout_with_mse
from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
    copy_last_baseline,
)
from molecular_dynamics_neural_operator_tpu.train import train_valid_split
from molecular_dynamics_neural_operator_tpu.train.recipe import (
    train_curriculum_recipe)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--frames", type=int, default=4000)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--compilation_cache", type=str, default=None)
    args = p.parse_args()

    if args.compilation_cache:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (
            enable_compilation_cache)
        enable_compilation_cache(args.compilation_cache)

    traj = synthetic_trajectory(num_frames=args.frames, num_residues=28,
                                seed=11)
    cfg = ModelConfig(compute_dtype="float32", graph_mode="sparse",
                      max_edges=512, predict_delta=True,
                      train_conv_impl="xla")
    tcfg = TrainConfig(lr=1e-3, weight_decay=1e-6, batch_size=64,
                       grad_clip_norm=1.0, skip_nonfinite_updates=True,
                       scheduler_step=20, scheduler_gamma=0.7)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=512)
    tr_idx, va_idx = train_valid_split(len(ds), 0.8, "partition")
    state, train_seconds, last_loss = train_curriculum_recipe(
        cfg, tcfg, ds, tr_idx, steps=args.steps, k=4, warmup_frac=0.25,
        coord_clip=1000.0, seed=0)

    aa = jnp.asarray(traj.aminoacids)
    start = int(va_idx[0])
    w0 = jnp.asarray(traj.positions[start : start + cfg.window_size])
    lo = start + cfg.window_size
    truth = jnp.asarray(traj.positions[lo : lo + args.horizon])

    out = {"train_seconds": train_seconds, "final_train_loss": last_loss,
           "recipe": "f32 round-3 (lr 1e-3, StepLR(20,0.7), K=4, j=1)"}
    base_mse, base_acc = copy_last_baseline(w0[-1], truth, 8.0)
    base_mse = np.asarray(base_mse)

    for tag, dtype in (("f32_inference", "float32"),
                       ("bf16_inference", "bfloat16")):
        icfg = dataclasses.replace(cfg, compute_dtype=dtype)
        coords, mses, _ = jax.jit(
            lambda p, a, w, t, c=icfg: rollout_with_mse(p, c, a, w, t)
        )(state.params, aa, w0, truth)
        coords, mses = np.asarray(coords), np.asarray(mses)
        cm_pred = np.asarray(contact_map(jnp.asarray(coords), 8.0))
        cm_true = np.asarray(contact_map(truth, 8.0))
        acc = float(np.mean(cm_pred == cm_true))
        fin = int(np.isfinite(coords).all(axis=(1, 2)).sum())
        out[tag] = {
            "rollout_finite_steps": fin,
            "coord_mse": {f"step{s}": float(mses[s - 1])
                          for s in (1, 10, 100) if fin >= s},
            "model_over_baseline_mse": {
                f"step{s}": float(mses[s - 1] / base_mse[s - 1])
                for s in (1, 10, 100) if fin >= s},
            "contact_map_accuracy_mean": acc,
        }
        print(tag, json.dumps(out[tag]), flush=True)
    out["baseline_contact_map_accuracy_mean"] = float(
        np.asarray(base_acc).mean())

    # (c) one-step forward perturbation: bf16 arithmetic noise vs the
    # true displacement signal, on the trained weights.
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch)
    b = {k: jnp.asarray(v) for k, v in ds.get_batch(
        np.asarray(va_idx[:64])).items()}
    gb = featurize_batch(cfg, b, "first")

    from molecular_dynamics_neural_operator_tpu.models import gkn_apply
    pred32 = np.asarray(jax.jit(
        lambda: gkn_apply(state.params, cfg, gb))())
    pred16 = np.asarray(jax.jit(
        lambda: gkn_apply(
            state.params,
            dataclasses.replace(cfg, compute_dtype="bfloat16"), gb))())
    true_delta = np.asarray(b["y"]) - np.asarray(b["window"][:, -1])
    pert = pred16.astype(np.float64) - pred32.astype(np.float64)
    out["one_step_perturbation"] = {
        "rms_bf16_minus_f32": float(np.sqrt(np.mean(pert ** 2))),
        "rms_true_displacement": float(np.sqrt(np.mean(true_delta ** 2))),
        "noise_over_signal": float(
            np.sqrt(np.mean(pert ** 2) / np.mean(true_delta ** 2))),
    }
    print(json.dumps(out, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
