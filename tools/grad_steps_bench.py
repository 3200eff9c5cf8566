"""Measure the grad_steps curriculum variants on the real chip.

K-step curriculum cost is ~K x the teacher-forced step because the
backward dominates (docs/PERFORMANCE.md training anatomy). grad_steps=j
runs K forwards but only j backwards — this script measures how much of
that shows up at the flagship sizing (K=4, E=256, bf16, Pallas stack).

    python tools/grad_steps_bench.py [--quick]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--max_edges", type=int, default=256)
    p.add_argument("--k", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import (
        ModelConfig, TrainConfig)
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset, synthetic_trajectory)
    from molecular_dynamics_neural_operator_tpu.train import (
        create_train_state)
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step)

    dev = jax.devices()[0]
    results = {"device": f"{dev.platform} {getattr(dev, 'device_kind', '')}",
               "k": args.k, "max_edges": args.max_edges}

    e = args.max_edges
    traj = synthetic_trajectory(num_frames=2000, num_residues=28, seed=0)
    ds = WindowDataset(traj, window_size=10, graph_mode="sparse",
                       max_edges=e)

    def rate(b, grad_steps):
        cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                          max_edges=e, train_conv_impl="pallas",
                          predict_delta=True)
        state, tx, _ = create_train_state(
            jax.random.PRNGKey(0), cfg, TrainConfig(lr=1e-4, batch_size=b))
        batch = {kk: jnp.asarray(v) for kk, v in
                 ds.get_batch(np.arange(b), rollout_horizon=args.k).items()}
        step = make_curriculum_train_step(
            cfg, tx, rollout_steps=args.k, coord_clip=1000.0,
            grad_steps=grad_steps)

        def run(n):
            st, m = step(state, batch)
            for _ in range(n - 1):
                st, m = step(st, batch)
            float(m["rel_l2"])
        run(1)  # compile + warm
        na, nb = (2, 6) if args.quick else (3, 10)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter(); run(na); ta = time.perf_counter() - t0
            t0 = time.perf_counter(); run(nb); tb = time.perf_counter() - t0
            best = max(best, b * (nb - na) / max(tb - ta, 1e-9))
        return round(best, 0)

    for b in (64, 128):
        for j in (None, 2, 1):
            key = f"k{args.k}_j{j or args.k}_b{b}_samples_per_s"
            results[key] = rate(b, j)
            print(key, results[key], flush=True)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
