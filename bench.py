"""Benchmark: BBA free-rollout operator throughput on one TPU chip.

Headline metric (BASELINE.md): operator steps/sec on the 28-residue BBA
rollout, single stream, including the on-device graph rebuild each step —
the exact loop the reference measured at 80.56 steps/s with a per-step host
round-trip + scipy rebuild (``bba_analysis.ipynb`` cell 20). Here the whole
rollout is one jitted ``lax.scan``.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Auxiliary numbers (batched-stream throughput, per-step latency) go to
stderr. Runs on whatever backend jax selects (the real TPU under the
driver); first compile over the axon tunnel takes ~1-3 min.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

BASELINE_STEPS_PER_S = 80.56  # reference, bba_analysis.ipynb cell 20


def main():
    import jax
    import jax.numpy as jnp

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.rollout import make_rollout_fn

    dev = jax.devices()[0]
    print(f"[bench] device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=sys.stderr)

    # Flagship config: reference hyperparameters (width 64, ker_width 1024,
    # depth 6), BBA shapes (R=28, window 10), padded sparse graph, bf16
    # matmuls. Edge capacity 224 covers real BBA's ~180-216 contacts
    # (incl. self-loops); the bench trajectory (seed 13) peaks at 206
    # ground-truth contacts and the trained rollout is verified to stay
    # within capacity for 25k steps (tools/train_bench_ckpt.py). E=256
    # measures ~4.7% lower (30.3k vs 31.7k persistent) — capacity is paid
    # for in the edge-MLP rows whether the slots are real or padding.
    #
    # The rollout uses a TRAINED flagship checkpoint (predict_delta, bf16;
    # tools/train_bench_ckpt.py) so the free rollout stays in distribution
    # and the E=224 capacity is genuinely honored — the run reports any
    # edge_overflow loudly. A random-weight model collapses the coordinates
    # until the graph overflows, which round 2's headline carried as a
    # truncation warning. Same operator FLOPs per step either way.
    cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                      max_edges=224, predict_delta=True)
    ckpt = Path(__file__).parent / "tools" / "bench_ckpt.npz"
    if ckpt.exists():
        from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
            restore_checkpoint,
        )

        template = gkn_init(jax.random.PRNGKey(0), cfg)
        params, _ = restore_checkpoint(ckpt, template)
        print(f"[bench] trained checkpoint: {ckpt.name}", file=sys.stderr)
    else:  # pragma: no cover - fallback when the artifact is absent
        params = gkn_init(jax.random.PRNGKey(0), cfg)
        params["fc2"]["w"] = params["fc2"]["w"] * 0.01
        params["fc2"]["b"] = params["fc2"]["b"] * 0.0
        print("[bench] WARNING: tools/bench_ckpt.npz missing — "
              "small-init fallback (may overflow capacity)", file=sys.stderr)

    # Start window from the same trajectory family the checkpoint was
    # trained on (identical frame spacing -> in-distribution dynamics).
    traj = synthetic_trajectory(
        num_frames=4000, num_residues=cfg.num_residues, seed=13
    )
    aa = jnp.asarray(traj.aminoacids)
    window0 = jnp.asarray(traj.positions[: cfg.window_size])

    overflow_seen: list[int] = []

    # Marginal (device-rate) throughput via the slope between two rollout
    # lengths — removes the fixed per-call dispatch/transfer latency, which
    # under the test harness includes a network tunnel round-trip (observed
    # 30-700 ms and DRIFTING over tens of minutes) that no production TPU
    # deployment has. Two defenses: a 20k-step span keeps the device-time
    # delta (~0.6 s) well above the dispatch jitter, and the two sizes'
    # samples are INTERLEAVED so a latency trend during the measurement
    # hits both mins equally (sequential sampling measured 26-58k for the
    # same program as the tunnel latency wandered).
    n1, n2 = 2000, 22000

    def measure(maker):
        rolls = {n: maker(n) for n in (n1, n2)}

        def once(n) -> float:
            t0 = time.perf_counter()
            coords, *_ = rolls[n](params, aa, window0)
            float(jnp.sum(coords))  # value dependency forces completion
            return time.perf_counter() - t0

        for n in (n1, n2):  # warm-up: compile + overflow check
            out = rolls[n](params, aa, window0)
            coords, diags = out[0], out[-1]
            float(jnp.sum(coords))
            if bool(diags.get("edge_overflow", False)):
                overflow_seen.append(n)
                print(f"[bench] WARNING: edge_overflow at capacity "
                      f"{cfg.max_edges} over {n} steps — contacts "
                      f"were truncated", file=sys.stderr)
        t1s, t2s = [], []
        for _ in range(5):
            t1s.append(once(n1))
            t2s.append(once(n2))
        t1, t2 = min(t1s), min(t2s)
        return (n2 - n1) / max(t2 - t1, 1e-9), t1

    # Headline path: the persistent grid-over-steps Pallas kernel (weights
    # VMEM-resident across the whole rollout; bitwise-equal outputs to the
    # XLA scan). Falls back to the XLA scan if the kernel fails to build.
    xla_rate, t1 = measure(
        lambda n: make_rollout_fn(cfg, num_steps=n, collect="coords",
                                  clip=100.0)
    )
    steps_per_s = xla_rate
    impl = "xla-scan"
    try:
        from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
            make_persistent_rollout_fn,
            pallas_available,
        )

        if pallas_available():
            p_rate, t1p = measure(
                lambda n: make_persistent_rollout_fn(cfg, num_steps=n,
                                                     clip=100.0)
            )
            print(f"[bench] persistent pallas kernel: {p_rate:,.0f} steps/s"
                  f" vs XLA scan {xla_rate:,.0f}", file=sys.stderr)
            if p_rate > steps_per_s:
                steps_per_s, t1, impl = p_rate, t1p, "pallas-persistent"
    except Exception as e:  # pragma: no cover - perf fallback only
        print(f"[bench] persistent kernel unavailable ({e}); XLA scan only",
              file=sys.stderr)

    if overflow_seen:
        print(f"[bench] FAIL-SOFT: edge capacity {cfg.max_edges} was "
              f"overflowed during runs of {sorted(set(overflow_seen))} "
              f"steps — the headline below measures a truncated graph",
              file=sys.stderr)
    else:
        print(f"[bench] edge capacity {cfg.max_edges} honored: zero "
              f"overflow across all runs (stable predict_delta regime)",
              file=sys.stderr)

    # MFU: FLOPs per rollout step / v5e bf16 peak. The edge-kernel MLP
    # dominates (runs ONCE per step — conv1/conv2 share one DenseNet,
    # graph_kernel.py:271-273): E x (6*kw + kw*kw + kw*w^2) MACs, plus
    # 2*depth conv matvecs (E*w^2) and node linears (R terms, negligible).
    # Hand model kept deliberately: the Pallas kernel's program is opaque
    # to compiled.cost_analysis(), so this is the only per-step figure
    # available for the persistent path. Validated against tools/mfu.py's
    # XLA cost analysis of the equivalent scan program: 2.38 here vs 2.41
    # GFLOP (cost_analysis adds the contact-rebuild ops) — if the model
    # shape changes (depth/ker_width/electrostatics), re-run tools/mfu.py
    # and re-check the two agree within a few percent.
    w, kw, E, R, d = (cfg.width, cfg.ker_width, cfg.max_edges,
                      cfg.num_residues, cfg.depth)
    macs = (E * (6 * kw + kw * kw + kw * w * w)      # edge MLP
            + 2 * d * E * w * w                       # conv matvecs
            + 2 * d * R * w * w                       # root weights
            + R * (7 * w + w * 3)                     # fc1 + fc2
            + R * cfg.window_size * 4 * (3 + 3) * 3)  # LSTM (hidden=3)
    flops_per_step = 2 * macs
    V5E_BF16_PEAK = 197e12
    mfu = flops_per_step * steps_per_s / V5E_BF16_PEAK
    print(f"[bench] model FLOPs/step: {flops_per_step / 1e9:.2f} GFLOP "
          f"-> {flops_per_step * steps_per_s / 1e12:.1f} TFLOP/s = "
          f"{mfu * 100:.1f}% MFU of v5e bf16 peak ({V5E_BF16_PEAK / 1e12:.0f}"
          f" TFLOP/s)", file=sys.stderr)

    e2e_1000 = n1 / t1
    print(
        f"[bench] single-stream device rate ({impl}): "
        f"{steps_per_s:,.0f} steps/s "
        f"({1e6 / steps_per_s:.0f} us/step); "
        f"end-to-end incl. dispatch: {e2e_1000:,.0f} steps/s over "
        f"{n1} steps ({t1 * 1e3:.0f} ms)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "BBA single-stream rollout operator throughput "
                  "(28 residues, width 64, depth 6, on-device graph rebuild "
                  "each step)",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
