"""Export CLI — package a trained checkpoint as an AOT serving bundle.

No reference counterpart (the reference re-imports the training module at
inference time, ``bba_analysis.ipynb`` cells 0-8); this is the TPU-native
release flow: lower the jitted rollout once (optionally FOR tpu from a
CPU-only box via ``--platforms tpu cpu``), write the three-file bundle
(serving/export.py), and self-test it — the bundle is loaded back and one
call compared bitwise against the in-process jit on the current host.

    python -m molecular_dynamics_neural_operator_tpu.cli.export \
        --run_path runs/my_run --out bundles/my_model --num_steps 100
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_path", type=Path, default=None,
                   help="training run dir: reads config.json and best.npz")
    p.add_argument("--checkpoint", type=Path, default=None,
                   help=".npz checkpoint (overrides run_path's best.npz)")
    p.add_argument("--out", type=Path, required=True,
                   help="bundle directory to create")
    p.add_argument("--operator", choices=["gkn", "fno"], default="gkn",
                   help="which family the checkpoint belongs to (fno "
                        "bundles take the (R, R, T) distance-channel "
                        "window; config from --run_path's config.json "
                        "or FNOConfig defaults + --num_residues)")
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--threshold", type=float, default=8.0)
    p.add_argument("--collect", choices=["coords", "contact_maps", "both"],
                   default="coords")
    p.add_argument("--clip", type=float, default=None)
    p.add_argument("--streams", type=int, default=0,
                   help="0 = single-stream signature; S>0 exports the "
                        "batched (S, T, R, 3) one")
    p.add_argument("--stream_chunk", type=int, default=None)
    p.add_argument("--platforms", type=str, nargs="+", default=None,
                   help="lowering targets (e.g. 'tpu cpu'); default = the "
                        "current backend only")
    p.add_argument("--no_selftest", action="store_true",
                   help="skip the load-back + bitwise-vs-jit check (needed "
                        "when none of --platforms matches this host)")
    # Model flags for checkpoint-only exports (ignored with --run_path).
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--kernel_width", type=int, default=1024)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--window_size", type=int, default=10)
    p.add_argument("--num_residues", type=int, default=28)
    p.add_argument("--graph_mode", choices=["dense", "sparse"],
                   default="sparse")
    p.add_argument("--max_edges", type=int, default=256)
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--predict_delta", action="store_true")
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last")
    p.add_argument("--prior_damping", type=float, default=1.0,
                   help="damping on the extrapolate prior "
                        "(must match training)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import (
        ModelConfig,
        experiment_from_json,
    )
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.serving import (
        load_bundle,
        save_bundle,
    )
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_subtree,
    )

    ckpt = args.checkpoint
    exp_cfg = None
    if args.run_path is not None:
        exp_cfg = experiment_from_json(
            (args.run_path / "config.json").read_text()
        )
        if ckpt is None and (args.run_path / "best.npz").exists():
            ckpt = args.run_path / "best.npz"
    if args.operator == "fno":
        from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
        from molecular_dynamics_neural_operator_tpu.models.fno import (
            fno_init,
        )

        cfg = (exp_cfg.fno if exp_cfg is not None
               else FNOConfig(num_residues=args.num_residues))
        init = fno_init
    else:
        cfg = exp_cfg.model if exp_cfg is not None else ModelConfig(
            width=args.width, ker_width=args.kernel_width, depth=args.depth,
            window_size=args.window_size, num_residues=args.num_residues,
            graph_mode=args.graph_mode, max_edges=args.max_edges,
            compute_dtype=args.compute_dtype,
            predict_delta=args.predict_delta,
            predict_prior=args.predict_prior,
            prior_damping=args.prior_damping,
        )
        init = gkn_init
    if ckpt is None:
        raise SystemExit("no checkpoint: pass --checkpoint or a --run_path "
                         "containing best.npz")

    template = init(jax.random.PRNGKey(0), cfg)
    params, meta = restore_subtree(ckpt, template, ".params")

    path = save_bundle(
        args.out, params, cfg, args.num_steps,
        threshold=args.threshold, collect=args.collect, clip=args.clip,
        streams=args.streams, stream_chunk=args.stream_chunk,
        platforms=args.platforms,
        extra_meta={"checkpoint": str(ckpt),
                    "checkpoint_epoch": meta.get("epoch")},
    )
    sizes = {f.name: f.stat().st_size for f in sorted(path.iterdir())}
    print(f"bundle written: {path} "
          + " ".join(f"{k}={v}B" for k, v in sizes.items()))

    if args.no_selftest:
        return

    bundle = load_bundle(path)
    host = jax.default_backend()
    if host not in bundle.platforms:
        print(f"selftest skipped: bundle platforms {bundle.platforms} "
              f"exclude this host ({host}); pass --no_selftest to silence")
        return
    r = cfg.num_residues
    if args.operator == "fno":
        inputs = (jnp.asarray(np.asarray(
            jax.random.normal(jax.random.PRNGKey(1),
                              (r, r, cfg.in_channels)), np.float32)),)
    else:
        t = cfg.window_size
        shape = (t, r, 3) if args.streams == 0 else (args.streams, t, r, 3)
        window = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), shape), np.float32
        ) * 4.0
        aa = np.arange(r, dtype=np.int32) % cfg.num_embeddings
        inputs = (jnp.asarray(aa), jnp.asarray(window))
    got = bundle(*inputs)
    from molecular_dynamics_neural_operator_tpu.serving.export import (
        _serving_fn,
    )

    want = jax.jit(_serving_fn(cfg, bundle.rollout))(params, *inputs)
    # Compare leaf-wise: with --collect both, output[0] is itself a tuple
    # of (coords, contact_maps) and np.asarray on that ragged pair raises.
    got_leaves = jax.tree_util.tree_leaves(got)
    want_leaves = jax.tree_util.tree_leaves(want)
    ok = len(got_leaves) == len(want_leaves)
    for g_, w_ in zip(got_leaves, want_leaves):
        g, w = np.asarray(g_), np.asarray(w_)
        fin = np.isfinite(g) & np.isfinite(w)
        ok = (ok and g.shape == w.shape
              and np.array_equal(np.isfinite(g), np.isfinite(w))
              and np.array_equal(g[fin], w[fin]))
    if not ok:
        raise SystemExit("selftest FAILED: bundle output != in-process jit")
    print(f"selftest ok: {args.num_steps}-step rollout bitwise == jit "
          f"on {host}")


if __name__ == "__main__":
    main()
