"""Serving-bundle smoke on the real TPU: export -> load -> run on chip.

Proves the AOT serving artifact (serving/export.py) end to end on real
hardware: lower the trained bench-checkpoint rollout for ``tpu`` (and
``cpu``), write the bundle, load it back, execute the deserialized
StableHLO module on the chip, and check it against the in-process jitted
rollout — plus a slope-timed throughput comparison showing the exported
module pays no serving-time penalty (same XLA program underneath).

Run on TPU (idle box — 1 host core):

    python tools/serving_export_smoke.py [--out tools/serving_export_results.json]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.rollout import make_rollout_fn
from molecular_dynamics_neural_operator_tpu.serving import (
    load_bundle,
    save_bundle,
)
from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
    restore_checkpoint,
)


def _time_rollouts(variants, params, aa, w0, n1, n2, reps):
    """Slope-method steps/s for {name: {num_steps: callable}}.

    All variants interleave within each rep so slow drift in the tunnel's
    fixed cost (the dominant noise source) hits every variant equally —
    block-ordered timing measured a phantom 33% gap between two calls
    that lower to the same XLA program."""
    for call in variants.values():  # warm up / compile
        for n in (n1, n2):
            float(jnp.sum(call[n](params, aa, w0)[0]))
    times = {name: {n1: [], n2: []} for name in variants}
    for _ in range(reps):
        for name, call in variants.items():
            for n in (n1, n2):
                t0 = time.perf_counter()
                float(jnp.sum(call[n](params, aa, w0)[0]))
                times[name][n].append(time.perf_counter() - t0)
    return {
        name: (n2 - n1) / max(min(t[n2]) - min(t[n1]), 1e-9)
        for name, t in times.items()
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n1", type=int, default=2000)
    p.add_argument("--n2", type=int, default=22000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=_sys.stderr)

    cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                      max_edges=224, predict_delta=True)
    template = gkn_init(jax.random.PRNGKey(0), cfg)
    params, _ = restore_checkpoint(
        _Path(__file__).parent / "bench_ckpt.npz", template
    )

    traj = synthetic_trajectory(num_frames=64, num_residues=cfg.num_residues,
                                seed=13)
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(traj.positions[: cfg.window_size])

    results = {"device": f"{dev.platform} {getattr(dev, 'device_kind', '')}"}

    with tempfile.TemporaryDirectory() as tmp:
        bundles, jits = {}, {}
        for n in (args.n1, args.n2):
            t0 = time.perf_counter()
            path = save_bundle(_Path(tmp) / f"b{n}", params, cfg, n,
                               clip=100.0, platforms=["tpu", "cpu"])
            export_s = time.perf_counter() - t0
            b = load_bundle(path)
            bundles[n] = lambda p_, a_, w_, b_=b: b_(a_, w_, params=p_)
            jits[n] = jax.jit(make_rollout_fn(cfg, num_steps=n, clip=100.0))
            if n == args.n2:
                results["export_seconds"] = round(export_s, 2)
                results["bundle_module_bytes"] = (
                    path / "rollout.jaxexport").stat().st_size
                results["platforms"] = list(b.platforms)

        # correctness on chip: exported call vs in-process jit
        n = args.n1
        got = np.asarray(bundles[n](params, aa, w0)[0])
        want = np.asarray(jits[n](params, aa, w0)[0])
        fin = np.isfinite(got) & np.isfinite(want)
        results["tpu_bitwise_equal"] = bool(
            np.array_equal(np.isfinite(got), np.isfinite(want))
            and np.array_equal(got[fin], want[fin])
        )
        results["max_abs_diff"] = float(
            np.max(np.abs(got[fin] - want[fin])) if fin.any() else 0.0
        )

        rates = _time_rollouts({"jit": jits, "exported": bundles},
                               params, aa, w0, args.n1, args.n2, args.reps)
        results["jit_steps_per_s"] = round(rates["jit"], 1)
        results["exported_steps_per_s"] = round(rates["exported"], 1)

    print(json.dumps(results, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(results, indent=2))
    if not results["tpu_bitwise_equal"]:
        raise SystemExit("exported module != jit on TPU")


if __name__ == "__main__":
    main()
