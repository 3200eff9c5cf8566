"""int8 kernel-tensor serving bench: batched rollout throughput + accuracy.

The multi-stream serving cap (~31-34k agg steps/s per chip at ANY
schedule, docs/PERFORMANCE.md) is HBM-bound on re-reading the per-edge
kernel tensor once per conv layer. ``kernel_quant="int8"`` stores that
tensor as int8 with per-edge scales (ops/edge_conv.py), halving the
bound's byte count. This tool measures what that buys on the real chip —
agg steps/s bf16 vs int8 at several stream counts — and what it costs:
contact-map accuracy of the quantized rollout on the trained bench
checkpoint vs the bf16 rollout and vs ground truth.

Run on TPU (idle box, no concurrent jobs — 1 host core):

    python tools/quant_serving_bench.py [--out tools/quant_serving_results.json]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.geometry import contact_map
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.rollout import make_rollout_fn
from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
    restore_checkpoint,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, nargs="+", default=[1, 8, 12])
    p.add_argument("--n1", type=int, default=250)
    p.add_argument("--n2", type=int, default=2250)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--horizon", type=int, default=100,
                   help="accuracy-eval rollout length")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=_sys.stderr)

    cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                      max_edges=224, predict_delta=True)
    cfg_q = dataclasses.replace(cfg, kernel_quant="int8")
    ckpt = _Path(__file__).parent / "bench_ckpt.npz"
    template = gkn_init(jax.random.PRNGKey(0), cfg)
    params, _ = restore_checkpoint(ckpt, template)

    traj = synthetic_trajectory(num_frames=4000,
                                num_residues=cfg.num_residues, seed=13)
    aa = jnp.asarray(traj.aminoacids)
    t = cfg.window_size

    results = {"device": f"{dev.platform} {getattr(dev, 'device_kind', '')}",
               "max_edges": cfg.max_edges, "n1": args.n1, "n2": args.n2}

    def windows(s):
        if s == 1:
            return jnp.asarray(traj.positions[:t])
        starts = np.arange(s) * 16
        return jnp.stack(
            [jnp.asarray(traj.positions[st : st + t]) for st in starts])

    def measure(c, s):
        batched = s > 1
        rolls = {
            n: make_rollout_fn(c, num_steps=n, collect="coords",
                               batched=batched, clip=100.0)
            for n in (args.n1, args.n2)
        }
        w0 = windows(s)

        def once(n):
            t0 = time.perf_counter()
            coords, *_ = rolls[n](params, aa, w0)
            float(jnp.sum(coords))
            return time.perf_counter() - t0

        for n in (args.n1, args.n2):  # compile + overflow check
            out = rolls[n](params, aa, w0)
            float(jnp.sum(out[0]))
            if np.asarray(out[-1].get("edge_overflow", False)).any():
                print(f"WARNING: edge_overflow S={s} n={n}",
                      file=_sys.stderr)
        t1s, t2s = [], []
        for _ in range(args.reps):
            t1s.append(once(args.n1))
            t2s.append(once(args.n2))
        rate = (args.n2 - args.n1) / max(min(t2s) - min(t1s), 1e-9)
        return rate * s

    for s in args.streams:
        for name, c in (("bf16", cfg), ("int8", cfg_q)):
            rate = measure(c, s)
            key = f"s{s}_{name}_agg_steps_per_s"
            results[key] = round(rate, 1)
            print(f"S={s:3d} {name}: {rate:,.0f} agg steps/s",
                  file=_sys.stderr)

    # accuracy: trained-checkpoint rollout, int8 vs bf16 vs ground truth
    w0 = jnp.asarray(traj.positions[:t])
    truth = np.asarray(traj.positions[t : t + args.horizon])
    roll = jax.jit(lambda p, a, w: make_rollout_fn(
        cfg, num_steps=args.horizon, clip=100.0)(p, a, w)[0])
    roll_q = jax.jit(lambda p, a, w: make_rollout_fn(
        cfg_q, num_steps=args.horizon, clip=100.0)(p, a, w)[0])
    c_bf = np.asarray(roll(params, aa, w0))
    c_q = np.asarray(roll_q(params, aa, w0))
    cm_t = np.asarray(contact_map(jnp.asarray(truth), 8.0))
    cm_b = np.asarray(contact_map(jnp.asarray(c_bf), 8.0))
    cm_q = np.asarray(contact_map(jnp.asarray(c_q), 8.0))
    results["accuracy"] = {
        "horizon": args.horizon,
        "bf16_contact_acc_vs_truth": float((cm_b == cm_t).mean()),
        "int8_contact_acc_vs_truth": float((cm_q == cm_t).mean()),
        "int8_contact_agreement_vs_bf16": float((cm_q == cm_b).mean()),
        "int8_max_coord_drift_vs_bf16": float(np.abs(c_q - c_bf).max()),
        "int8_rollout_finite": bool(np.isfinite(c_q).all()),
    }
    print(json.dumps(results, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
