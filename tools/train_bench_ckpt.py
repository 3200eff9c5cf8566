"""Train + commit the small checkpoint bench.py rolls out.

The benchmark's workload must honor its stated edge capacity (E=224 =
BBA's max contact count + headroom): a random-weight model collapses the
coordinates until the graph overflows, so the headline rolls out a REAL
trained model instead — the flagship recipe (predict_delta, bf16,
K-step curriculum with the coord_clip rail) on the same synthetic BBA
trajectory family the bench starts from.

Produces ``tools/bench_ckpt.npz`` (float16-compressed params, ~10 MB,
checked in) + sidecar json, then verifies a 5000-step free rollout stays
within capacity. Run on TPU:

    python tools/train_bench_ckpt.py [--steps 3000]
"""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import (
    ModelConfig,
    TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset,
    synthetic_trajectory,
)
from molecular_dynamics_neural_operator_tpu.train import train_valid_split
from molecular_dynamics_neural_operator_tpu.train.recipe import (
    train_curriculum_recipe,
)
from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
    save_checkpoint,
)

BENCH_FRAMES = 4000  # bench.py slices its start window from this family
BENCH_SEED = 13  # mean 185 / max 206 contacts over the cycle: realistic BBA density (~180-210) with real headroom under the E=224 cap (seed 0 idles at 212 and the trained attractor drifted past capacity by step ~11k)


def bench_model_config() -> ModelConfig:
    """The exact flagship config bench.py measures."""
    return ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                       max_edges=224, predict_delta=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--verify_steps", type=int, default=25000)
    p.add_argument("--out", type=Path, default=Path("tools/bench_ckpt.npz"))
    args = p.parse_args()

    cfg = bench_model_config()
    traj = synthetic_trajectory(num_frames=BENCH_FRAMES, num_residues=28,
                                seed=BENCH_SEED)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=cfg.max_edges)
    tr_idx, _ = train_valid_split(len(ds), 0.8, "partition")
    tcfg = TrainConfig(lr=args.lr, weight_decay=1e-6,
                       batch_size=args.batch, grad_clip_norm=0.5,
                       skip_nonfinite_updates=True)
    state, seconds, last_loss = train_curriculum_recipe(
        cfg, tcfg, ds, tr_idx, steps=args.steps, k=args.k,
        warmup_frac=0.5, coord_clip=1000.0, log_every=500,
        log_prefix="[bench-ckpt] ",
    )
    print(f"trained {args.steps} steps in {seconds:.0f}s, "
          f"final loss {last_loss:.4f}")

    params16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float16), state.params
    )
    save_checkpoint(args.out, params16, metadata={
        "config": "bench flagship (width 64, ker_width 1024, depth 6, "
                  "sparse E=224, predict_delta, bf16)",
        "train_steps": args.steps,
        "final_train_loss": last_loss,
        "trajectory": f"synthetic_trajectory(num_frames={BENCH_FRAMES}, "
                      f"num_residues=28, seed={BENCH_SEED})",
    })
    print(f"wrote {args.out} "
          f"({args.out.stat().st_size / 1e6:.1f} MB f16)")

    # Verify: long free rollout stays within the bench's edge capacity.
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), params16
    )
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[:cfg.window_size])
    roll = make_rollout_fn(cfg, num_steps=args.verify_steps,
                           collect="coords", clip=100.0)
    coords, _, diags = roll(params, aa, w0)
    overflow = bool(diags["edge_overflow"])
    finite = bool(jnp.isfinite(coords).all())
    print(json.dumps({
        "verify_steps": args.verify_steps,
        "edge_overflow": overflow,
        "all_finite": finite,
        "final_coord_rms": float(jnp.sqrt(jnp.mean(coords[-1] ** 2))),
    }))
    if overflow or not finite:
        raise SystemExit("verification FAILED: rollout left capacity")
    print("verified: capacity honored over the full rollout")


if __name__ == "__main__":
    main()
