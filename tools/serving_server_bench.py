"""On-chip bench of the continuous-batching rollout server.

The server (serving/server.py) has so far only been exercised on the
virtual CPU mesh (tests/test_serving_server.py). This tool measures, on
the real chip, what the serving layer costs on top of the raw batched
rollout it schedules:

1. saturated: S equal-horizon requests submitted at once — aggregate
   steps/s via the two-horizon slope (cancels compile + fixed transfer
   overheads, the repo's standard timing method for the 0.4 s-round-trip
   tunnel), compared against the raw ``make_rollout_fn(batched=True)``
   dispatch of the identical workload.
2. mixed: staggered joins + mixed horizons — reports occupancy
   (steps served / steps computed) to show iteration-level scheduling
   keeps the chip busy where end-to-end queueing would not.
3. correctness smoke: one served request pinned bitwise against a
   dedicated ``rollout_scan`` on the same backend.

Uses the committed trained checkpoint (tools/bench_ckpt.npz) at the
headline config (sparse E=224, bf16, predict_delta) so the free rollout
honors its capacity. Run on an idle box (1 host core):

    python tools/serving_server_bench.py [--out tools/serving_server_results.json]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.rollout import (
    make_rollout_fn,
    rollout_scan,
)
from molecular_dynamics_neural_operator_tpu.serving import RolloutServer
from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
    restore_checkpoint,
)


def _load(tiny: bool = False):
    if tiny:  # CPU smoke of the tool itself — not a perf config
        cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                          num_residues=10, max_edges=128,
                          compute_dtype="float32", predict_delta=True)
        params = gkn_init(jax.random.PRNGKey(0), cfg)
    else:
        cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                          max_edges=224, predict_delta=True)
        template = gkn_init(jax.random.PRNGKey(0), cfg)
        params, _ = restore_checkpoint(
            _Path(__file__).parent / "bench_ckpt.npz", template
        )
    traj = synthetic_trajectory(num_frames=4000,
                                num_residues=cfg.num_residues, seed=13)
    aa = np.asarray(traj.aminoacids, np.int32)
    w0 = np.asarray(traj.positions[: cfg.window_size], np.float32)
    return cfg, params, aa, w0


def _serve_all(srv, aa, w0, horizons):
    """Submit every request at once; wall time until all futures resolve."""
    t0 = time.perf_counter()
    futs = [srv.submit(aa, w0, n) for n in horizons]
    for f in futs:
        f.result()
    return time.perf_counter() - t0


def bench_saturated(cfg, params, aa, w0, streams, seg, n1, n2, reps,
                    impl="scan"):
    """Slope agg steps/s through the server vs the raw batched rollout."""
    kw = {} if impl == "scan" else {"impl": "persistent", "aa": aa}
    with RolloutServer(params, cfg, segment_steps=seg,
                       max_streams=streams, **kw) as srv:
        srv.warmup([streams])
        times = {}
        for n in (n1, n2):
            ts = []
            for _ in range(reps):
                ts.append(_serve_all(srv, aa, w0, [n] * streams))
            times[n] = min(ts)
        stats = srv.stats
    srv_rate = streams * (n2 - n1) / (times[n2] - times[n1])

    # Raw batched dispatch of the identical workload (same collected
    # coords come back to host, so the marginal transfer cost matches).
    w0_b = np.broadcast_to(w0, (streams,) + w0.shape).copy()
    times_raw = {}
    for n in (n1, n2):
        fn = jax.jit(make_rollout_fn(cfg, num_steps=n, collect="coords",
                                     batched=True))
        np.asarray(fn(params, aa, w0_b)[0])  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(params, aa, w0_b)[0])
            ts.append(time.perf_counter() - t0)
        times_raw[n] = min(ts)
    raw_rate = streams * (n2 - n1) / (times_raw[n2] - times_raw[n1])
    return {
        "impl": impl,
        "streams": streams,
        "segment_steps": seg,
        "server_agg_steps_per_s": round(srv_rate, 1),
        "raw_batched_agg_steps_per_s": round(raw_rate, 1),
        "server_overhead_pct": round(100 * (1 - srv_rate / raw_rate), 2),
        "occupancy": round(stats["occupancy"], 4),
    }


def bench_mixed(cfg, params, aa, w0, seg, impl="scan"):
    """Mixed horizons + a late join: the short requests finish while the
    long ones keep running, and the late join shares in-flight segments.

    impl="persistent" exercises the shared-aa restriction path: the
    Pallas multi-stream program is specialized to one protein at server
    construction, so every request must carry the same aminoacids — the
    many-forecasts-of-one-protein serving shape it was built for."""
    kw = {} if impl == "scan" else {"impl": "persistent", "aa": aa}
    with RolloutServer(params, cfg, segment_steps=seg, max_streams=8,
                       **kw) as srv:
        srv.warmup([2, 4, 8])  # the quantized sizes this scenario hits
        t0 = time.perf_counter()
        long_f = [srv.submit(aa, w0, 4 * seg) for _ in range(2)]
        short_f = [srv.submit(aa, w0, seg) for _ in range(4)]
        for f in short_f:
            f.result()
        t_short = time.perf_counter() - t0
        late = srv.submit(aa, w0, seg)
        late.result()
        for f in long_f:
            f.result()
        t_all = time.perf_counter() - t0
        stats = srv.stats
    return {
        "impl": impl,
        "segment_steps": seg,
        "t_short_done_s": round(t_short, 3),
        "t_all_done_s": round(t_all, 3),
        "occupancy": round(stats["occupancy"], 4),
        "segments_run": stats["segments_run"],
    }


def smoke_bitwise(cfg, params, aa, w0, seg):
    n = 2 * seg + seg // 2  # two full segments + a tail
    with RolloutServer(params, cfg, segment_steps=seg, max_streams=4) as srv:
        res = srv.rollout(aa, w0, n)
    want, want_final, _ = rollout_scan(params, cfg, aa, w0, n)
    ok = (np.array_equal(res.coords, np.asarray(want))
          and np.array_equal(res.final_window, np.asarray(want_final))
          and not res.edge_overflow)
    return {"num_steps": n, "bitwise_equal": bool(ok)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, nargs="+", default=[8])
    p.add_argument("--segment_steps", type=int, default=256)
    p.add_argument("--n1", type=int, default=2048)
    p.add_argument("--n2", type=int, default=16384)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--impl", choices=["scan", "persistent"], default="scan")
    p.add_argument("--skip_mixed", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke of the tool at toy scale")
    p.add_argument("--compilation_cache", type=str, default=None,
                   help="persistent XLA cache dir (tunnel compiles are "
                        "1-5 min each; reruns skip them)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--merge", action="store_true",
                   help="append saturated rows / add keyed sections to an "
                        "existing --out file instead of overwriting it")
    args = p.parse_args()

    if args.compilation_cache:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (  # noqa: E501
            enable_compilation_cache,
        )

        enable_compilation_cache(_Path(args.compilation_cache))

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.streams, args.segment_steps = [4], 16
        args.n1, args.n2, args.reps = 32, 128, 1

    cfg, params, aa, w0 = _load(args.tiny)
    dev = jax.devices()[0]
    out = {"device": f"{dev.platform} {getattr(dev, 'device_kind', '')}"}

    out["smoke"] = smoke_bitwise(cfg, params, aa, w0,
                                 8 if args.tiny else 32)
    print(f"[smoke] {out['smoke']}", flush=True)
    if not out["smoke"]["bitwise_equal"]:
        raise SystemExit("served rollout != dedicated rollout")

    out["saturated"] = [
        bench_saturated(cfg, params, aa, w0, s, args.segment_steps,
                        args.n1, args.n2, args.reps, args.impl)
        for s in args.streams
    ]
    for row in out["saturated"]:
        print(f"[saturated] {row}", flush=True)

    if not args.skip_mixed:
        key = "mixed" if args.impl == "scan" else f"mixed_{args.impl}"
        out[key] = bench_mixed(cfg, params, aa, w0, args.segment_steps,
                               impl=args.impl)
        print(f"[{key}] {out[key]}", flush=True)

    if args.out:
        path = _Path(args.out)
        if args.merge and path.exists():
            prev = json.loads(path.read_text())
            prev.setdefault("saturated", []).extend(out["saturated"])
            for k, v in out.items():
                if k != "saturated":
                    prev[k] = v
            out = prev
        path.write_text(json.dumps(out, indent=2) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
