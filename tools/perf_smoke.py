"""One-command TPU performance smoke: the headline numbers, reproducibly.

Runs the benchmark suite that PERFORMANCE.md's tables come from — rollout
(XLA scan, persistent Pallas kernel, batched/chunked streams) and training
(teacher-forced and K-step curriculum, XLA vs Pallas conv stack) — and
prints one JSON blob. Each number uses the slope/value-read methodology
from CLAUDE.md (the axon tunnel's block_until_ready does not await).

    python tools/perf_smoke.py [--quick]
"""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="fewer/shorter measurements")
    p.add_argument("--max_edges", type=int, default=256,
                   help="padded edge capacity; round-2 headlines use 256 "
                        "(round-1 numbers were measured at 384)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import (
        ModelConfig, TrainConfig)
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset, synthetic_trajectory)
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
        make_persistent_rollout_fn, pallas_available)
    from molecular_dynamics_neural_operator_tpu.rollout import make_rollout_fn
    from molecular_dynamics_neural_operator_tpu.train import create_train_state
    from molecular_dynamics_neural_operator_tpu.train.curriculum import (
        make_curriculum_train_step)
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        make_train_step)

    dev = jax.devices()[0]
    results = {"device": f"{dev.platform} {getattr(dev, 'device_kind', '')}"}
    on_tpu = pallas_available()

    e = args.max_edges
    cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                      max_edges=e)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=2000, num_residues=28, seed=0)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[: cfg.window_size])

    # --- single-stream rollout (slope between two lengths)
    n1, n2 = (300, 900) if args.quick else (1000, 5000)

    def roll_rate(maker, w0=w0):
        def run(n):
            # min-of-3: single samples over the tunnel jitter by up to
            # 1.5x (a one-shot slope once reported the persistent kernel
            # at the XLA rate)
            f = maker(n)
            c, *_ = f(params, aa, w0)
            float(jnp.sum(c))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c, *_ = f(params, aa, w0)
                float(jnp.sum(c))
                best = min(best, time.perf_counter() - t0)
            return best
        t1, t2 = run(n1), run(n2)
        return round((n2 - n1) / max(t2 - t1, 1e-9), 0)

    results["rollout_xla_steps_per_s"] = roll_rate(
        lambda n: make_rollout_fn(cfg, num_steps=n, clip=100.0))
    if on_tpu:
        results["rollout_persistent_steps_per_s"] = roll_rate(
            lambda n: make_persistent_rollout_fn(cfg, num_steps=n,
                                                 clip=100.0))
    # --- batched streams (chunked), slope between two lengths so the
    # fixed dispatch + value-read tunnel cost cancels
    s = 8 if args.quick else 32
    w0s = jnp.broadcast_to(w0, (s,) + w0.shape) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (s, 1, 1, 1))
    chunk = None if s <= 8 else 8
    results["rollout_batched_agg_steps_per_s"] = round(s * roll_rate(
        lambda n: make_rollout_fn(cfg, num_steps=n, clip=100.0,
                                  batched=True, stream_chunk=chunk),
        w0=w0s,
    ), 0)
    results["rollout_batched_streams"] = s

    # --- training steps
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=e)

    def train_rate(impl, b, k=0):
        c2 = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                         max_edges=e, train_conv_impl=impl,
                         predict_delta=bool(k))
        state, tx, _ = create_train_state(
            jax.random.PRNGKey(0), c2, TrainConfig(lr=1e-4, batch_size=b))
        batch = {kk: jnp.asarray(v) for kk, v in
                 ds.get_batch(np.arange(b), rollout_horizon=k).items()}
        if k:
            step = make_curriculum_train_step(c2, tx, rollout_steps=k,
                                              coord_clip=1000.0)
        else:
            step = make_train_step(c2, tx, donate=False)

        # slope between two step counts: the ~0.4 s tunnel value-read
        # would otherwise dominate and under-report by 2-5x
        def run(n):
            st, m = step(state, batch)
            for _ in range(n - 1):
                st, m = step(st, batch)
            float(m["rel_l2"])
        run(1)  # compile + warm
        na, nb = (2, 6) if args.quick else (3, 10)
        t0 = time.perf_counter(); run(na); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); run(nb); tb = time.perf_counter() - t0
        return round(b * (nb - na) / max(tb - ta, 1e-9), 0)

    results["train_xla_b128_samples_per_s"] = train_rate("xla", 128)
    if on_tpu:
        results["train_pallas_b128_samples_per_s"] = train_rate("pallas", 128)
        results["curriculum_k4_pallas_b64_samples_per_s"] = train_rate(
            "pallas", 64, k=4)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
