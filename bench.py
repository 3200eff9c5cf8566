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
    # matmuls. Edge capacity 224 = BBA's max contact count plus headroom
    # (observed max 216 incl. self-loops on this trajectory, ~180-210 on
    # real BBA); overflow is diagnosed, not silent. E=256 measures ~4.7%
    # lower (30.3k vs 31.7k persistent) — capacity is paid for in the
    # edge-MLP rows whether the slots are real or padding.
    cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                      max_edges=224)
    params = gkn_init(jax.random.PRNGKey(0), cfg)

    traj = synthetic_trajectory(
        num_frames=cfg.window_size + 2, num_residues=cfg.num_residues, seed=0
    )
    aa = jnp.asarray(traj.aminoacids)
    window0 = jnp.asarray(traj.positions[: cfg.window_size])

    def make_run(maker):
        def run(num_steps: int) -> float:
            """Seconds for one fully-materialized num_steps rollout call
            (min of 3: host contention inflates single samples — measured
            skewing the slope BOTH directions under load)."""
            roll = maker(num_steps)
            out = roll(params, aa, window0)
            coords, diags = out[0], out[-1]
            float(jnp.sum(coords))  # warm-up: compile + full completion
            if bool(diags.get("edge_overflow", False)):
                print(f"[bench] WARNING: edge_overflow at capacity "
                      f"{cfg.max_edges} over {num_steps} steps — contacts "
                      f"were truncated", file=sys.stderr)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                coords, *_ = roll(params, aa, window0)
                float(jnp.sum(coords))  # value dependency forces completion
                best = min(best, time.perf_counter() - t0)
            return best

        return run

    # Marginal (device-rate) throughput via the slope between two rollout
    # lengths — removes the fixed per-call dispatch/transfer latency, which
    # under the test harness includes a ~0.4 s network tunnel round-trip
    # that no production TPU deployment has.
    n1, n2 = 1000, 5000

    def measure(run):
        t1 = run(n1)
        t2 = run(n2)
        return (n2 - n1) / max(t2 - t1, 1e-9), t1

    # Headline path: the persistent grid-over-steps Pallas kernel (weights
    # VMEM-resident across the whole rollout; bitwise-equal outputs to the
    # XLA scan). Falls back to the XLA scan if the kernel fails to build.
    xla_rate, t1 = measure(make_run(
        lambda n: make_rollout_fn(cfg, num_steps=n, collect="coords",
                                  clip=100.0)
    ))
    steps_per_s = xla_rate
    impl = "xla-scan"
    try:
        from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
            make_persistent_rollout_fn,
            pallas_available,
        )

        if pallas_available():
            p_rate, t1p = measure(make_run(
                lambda n: make_persistent_rollout_fn(cfg, num_steps=n,
                                                     clip=100.0)
            ))
            print(f"[bench] persistent pallas kernel: {p_rate:,.0f} steps/s"
                  f" vs XLA scan {xla_rate:,.0f}", file=sys.stderr)
            if p_rate > steps_per_s:
                steps_per_s, t1, impl = p_rate, t1p, "pallas-persistent"
    except Exception as e:  # pragma: no cover - perf fallback only
        print(f"[bench] persistent kernel unavailable ({e}); XLA scan only",
              file=sys.stderr)

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
