"""K=4 curriculum-step anatomy: component isolation at DEVICE rate
(VERDICT r3 item 1 — the flagship training step ran at 16% MFU with no
measured breakdown).

Methodology of tools/train_anatomy.py: each component runs inside a
lax.scan so per-call dispatch cancels out of the slope between two scan
lengths. Run on an OTHERWISE IDLE box.

Components (B=64, E=224, bf16, Pallas conv stack — the exact
tools/mfu.py configuration that measured 28.7 ms / 2,228 samples/s):

- full K=4 step, full BPTT (the 28.7 ms baseline)
- full K=4 step, grad_steps=1 (the recipe default since r4)
- K=1 teacher-forced step (the 13.9 ms reference point)
- K=4 loss forward only (K forwards + K-1 graph rebuilds, no backward)
- K=1 loss forward only
- batched graph rebuild alone (vmap _build_graph)
- featurize + optimizer (known ~0, pinned here for completeness)
- f32 recipe variants: full BPTT, j=1, and j=1 with bf16 burn-in
  (burnin_dtype) — the quality recipe's cost ladder.

Derived: backward cost = step - forward-only; the j=1 saving is the
difference of backwards.

Usage: python tools/curriculum_anatomy.py [--out tools/curriculum_anatomy.json]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import (
    ModelConfig, TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.data.windows import WindowDataset
from molecular_dynamics_neural_operator_tpu.rollout.scan import _build_graph
from molecular_dynamics_neural_operator_tpu.train import create_train_state
from molecular_dynamics_neural_operator_tpu.train.curriculum import (
    curriculum_loss_batched,
)
from molecular_dynamics_neural_operator_tpu.train.loop import featurize_batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--max_edges", type=int, default=224)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--skip_f32", action="store_true")
    args = p.parse_args()
    B, E, K = args.batch, args.max_edges, args.k

    print("device:", jax.devices()[0], file=sys.stderr)
    from tools.timing import min_time, slope_rate

    traj = synthetic_trajectory(num_frames=B + K + 16, num_residues=28,
                                seed=0)
    results = {"batch": B, "max_edges": E, "k": K, "rows": {}}

    def scan_time(make_body, carry0, n1=10, n2=50):
        def run(n):
            @jax.jit
            def many(c):
                return jax.lax.scan(lambda c, _: (make_body(c), None), c,
                                    None, length=n)[0]
            return min_time(many, carry0)
        return 1e3 / slope_rate(run, n1, n2)  # ms/iter

    def row(name, ms, note=""):
        results["rows"][name] = {"ms": round(ms, 3),
                                 "samples_per_s": round(B / ms * 1e3)}
        print(f"{name:28s} {ms:7.2f} ms  ({B / ms * 1e3:7,.0f} samples/s)"
              f"  {note}", flush=True)

    for dtype in (["bfloat16"] if args.skip_f32
                  else ["bfloat16", "float32"]):
        cfg = ModelConfig(compute_dtype=dtype, graph_mode="sparse",
                          max_edges=E, predict_delta=True,
                          train_conv_impl="pallas")
        tcfg = TrainConfig(lr=3e-4, weight_decay=1e-6, batch_size=B,
                           grad_clip_norm=1.0, skip_nonfinite_updates=True)
        ds = WindowDataset(traj, window_size=cfg.window_size,
                           graph_mode="sparse", max_edges=E)
        batch = {k: jnp.asarray(v) for k, v in
                 ds.get_batch(np.arange(B), rollout_horizon=K).items()}
        batch_k1 = {k: jnp.asarray(v) for k, v in
                    ds.get_batch(np.arange(B), rollout_horizon=1).items()}
        state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        params = state.params
        tag = "bf16" if dtype == "bfloat16" else "f32"
        print(f"--- {tag} (B={B}, E={E}, K={K}) ---", flush=True)

        def make_full_step(b, grad_steps=None, burnin_dtype=None):
            def body(st):
                def loss_fn(p):
                    gb = featurize_batch(cfg, b, "first")
                    return curriculum_loss_batched(
                        p, cfg, gb, b["y_seq"], 8.0, None, 1000.0,
                        grad_steps=grad_steps, burnin_dtype=burnin_dtype,
                    )
                (l2, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                updates, opt_state = tx.update(grads, st.opt_state,
                                               st.params)
                prm = jax.tree_util.tree_map(
                    lambda a, u: a + u, st.params, updates)
                return st._replace(params=prm, opt_state=opt_state,
                                   step=st.step + 1)
            return body

        def make_fwd_only(b, grad_steps=None):
            def body(c):
                prm = jax.tree_util.tree_map(lambda p: p + c * 0, params)
                gb = featurize_batch(cfg, b, "first")
                l2, _ = curriculum_loss_batched(
                    prm, cfg, gb, b["y_seq"], 8.0, None, 1000.0,
                    grad_steps=grad_steps,
                )
                return l2
            return body

        row(f"{tag}/k{K}_full_bptt", scan_time(make_full_step(batch),
                                               state))
        row(f"{tag}/k{K}_j1", scan_time(
            make_full_step(batch, grad_steps=1), state),
            "(recipe default)")
        if dtype == "float32":
            row(f"{tag}/k{K}_j1_burnin_bf16", scan_time(
                make_full_step(batch, grad_steps=1,
                               burnin_dtype="bfloat16"), state))
        row(f"{tag}/k1_teacher", scan_time(make_full_step(batch_k1),
                                           state))
        row(f"{tag}/k{K}_fwd_only", scan_time(make_fwd_only(batch),
                                              jnp.zeros(())),
            "(K fwd + K-1 rebuilds, no bwd)")
        row(f"{tag}/k1_fwd_only", scan_time(make_fwd_only(batch_k1),
                                            jnp.zeros(())))

        def rebuild_body(c):
            frame = batch["window"][:, -1] + c * 0
            graph, _ = jax.vmap(
                lambda f: _build_graph(cfg, f, 8.0))(frame)
            return c + jnp.sum(graph.edge_feats[0, 0].astype(jnp.float32))

        row(f"{tag}/rebuild_x1", scan_time(rebuild_body, jnp.zeros(())),
            "(one batched graph rebuild)")

        def feat_body(c):
            gb = featurize_batch(cfg, batch, "first")
            return c + jnp.sum(gb.graph.edge_feats[0, 0].astype(jnp.float32))

        row(f"{tag}/featurize", scan_time(feat_body, jnp.zeros(())))

        r = results["rows"]
        full = r[f"{tag}/k{K}_full_bptt"]["ms"]
        j1 = r[f"{tag}/k{K}_j1"]["ms"]
        fwd = r[f"{tag}/k{K}_fwd_only"]["ms"]
        print(f"derived[{tag}]: bwd_full_bptt ~ {full - fwd:.2f} ms; "
              f"bwd_j1 ~ {j1 - fwd:.2f} ms; "
              f"j1 speedup {full / j1:.2f}x", flush=True)
        results["rows"][f"{tag}/derived"] = {
            "bwd_full_bptt_ms": round(full - fwd, 3),
            "bwd_j1_ms": round(j1 - fwd, 3),
            "j1_speedup": round(full / j1, 3),
        }

    if args.out:
        _Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
