"""Offline analysis of a trained BBA operator — notebook-flow parity.

Script equivalent of the reference's ``bba_analysis.ipynb`` (cells 0-38):

1. load a checkpoint and rebuild the model,
2. run a long free rollout (1,000 steps by default) via the jitted scan,
3. compute per-step coordinate MSE vs ground truth (cell 19),
4. render forecast-vs-real contact-map figures + GIF (cells 24-27),
5. parse training stdout logs (``Epoch:\\tTime:\\t...``) into a table and
   plot the loss curves (cells 35-38).

Usage:
    python examples/bba_analysis.py --data_path 1FME-0.h5 \
        --checkpoint runs/bba/best.npz --out analysis/ \
        [--train_log runs/bba/train.log] [--num_steps 1000]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python examples/bba_analysis.py` puts
# examples/ (not the repo root) on sys.path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=Path, required=True)
    p.add_argument("--checkpoint", type=Path, default=None)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--window_size", type=int, default=10)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--kernel_width", type=int, default=512)  # notebook cfg
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--num_movie_frames", type=int, default=20)
    p.add_argument("--train_log", type=Path, default=None)
    p.add_argument("--predict_delta", action="store_true")
    p.add_argument(
        "--run_path", type=Path, default=None,
        help="training run directory: the model config is read from its "
        "config.json (so analysis flags cannot drift from the trained "
        "shapes), --checkpoint defaults to its best.npz and --train_log "
        "to its train.log",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
    from molecular_dynamics_neural_operator_tpu.data import load_trajectory
    from molecular_dynamics_neural_operator_tpu.geometry import contact_map
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.rollout import rollout_with_mse
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_subtree,
    )
    from molecular_dynamics_neural_operator_tpu.utils.metrics import parse_loss_log
    from molecular_dynamics_neural_operator_tpu.utils.movie import (
        render_propagation_movie,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.run_path is not None:
        from molecular_dynamics_neural_operator_tpu.configs import (
            experiment_from_json,
        )

        cfg = experiment_from_json(
            (args.run_path / "config.json").read_text()
        ).model
        if args.checkpoint is None and (args.run_path / "best.npz").exists():
            args.checkpoint = args.run_path / "best.npz"
        if args.train_log is None and (args.run_path / "train.log").exists():
            args.train_log = args.run_path / "train.log"
        print(f"config from {args.run_path / 'config.json'}: width="
              f"{cfg.width} ker={cfg.ker_width} depth={cfg.depth} "
              f"predict_delta={cfg.predict_delta}")
    else:
        cfg = ModelConfig(width=args.width, ker_width=args.kernel_width,
                          depth=args.depth, window_size=args.window_size,
                          predict_delta=args.predict_delta)
    traj = load_trajectory(args.data_path)

    if args.checkpoint:
        # Params-only restore: a full-TrainState restore would need the
        # exact optimizer chain the run used (grad clipping,
        # apply_if_finite, ...) and crash on any curriculum/recipe-trained
        # checkpoint. Analysis needs only the weights.
        params, meta = restore_subtree(
            args.checkpoint, gkn_init(jax.random.PRNGKey(0), cfg), ".params"
        )
        print(f"loaded checkpoint epoch={meta.get('epoch')}")
    else:
        params = gkn_init(jax.random.PRNGKey(0), cfg)
        print("random init (no checkpoint)")

    s = args.start_frame
    aa = jnp.asarray(traj.aminoacids)
    window0 = jnp.asarray(traj.positions[s : s + cfg.window_size])
    truth_lo = s + cfg.window_size
    n = min(args.num_steps, traj.num_frames - truth_lo)
    truth = jnp.asarray(traj.positions[truth_lo : truth_lo + n])

    import time

    t0 = time.time()
    coords, mses, _ = jax.jit(
        lambda p, a, w, t: rollout_with_mse(p, cfg, a, w, t)
    )(params, aa, window0, truth)
    coords = np.asarray(coords)
    mses = np.asarray(mses)
    dt = time.time() - t0
    print(f"{n} rollout steps in {dt:.2f}s -> {n / dt:,.1f} steps/s "
          f"(incl. compile)")
    np.save(out / "forecast_coords.npy", coords)
    np.save(out / "per_step_mse.npy", mses)
    summary = {
        "steps": int(n),
        "steps_per_s": n / dt,
        "mse_first": float(mses[0]),
        "mse_at_100": float(mses[min(99, n - 1)]),
        "mse_last": float(mses[-1]),
        "finite_steps": int(np.isfinite(coords).all(axis=(1, 2)).sum()),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))

    # forecast-vs-real contact maps
    k = min(args.num_movie_frames, n)
    fc = [np.asarray(contact_map(jnp.asarray(coords[i]))) for i in range(k)]
    real = [
        np.asarray(contact_map(jnp.asarray(traj.positions[truth_lo + i])))
        for i in range(k)
    ]
    movie = render_propagation_movie(out, 0, fc, real)
    print(f"movie: {movie}")

    # 3-D backbone render (notebook cell 31 parity, plotly-free)
    from molecular_dynamics_neural_operator_tpu.utils.backbone import (
        render_backbone_trajectory,
    )

    bb = render_backbone_trajectory(
        out, [coords[i] for i in range(min(k, 8))],
        [traj.positions[truth_lo + i] for i in range(min(k, 8))],
    )
    print(f"backbone: {bb.get('movie', bb.get('html', ''))}")

    # per-step MSE curve
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(mses)
        ax.set_xlabel("rollout step")
        ax.set_ylabel("coordinate MSE")
        ax.set_yscale("log")
        fig.savefig(out / "per_step_mse.png", dpi=150)
        plt.close(fig)
    except Exception:
        pass

    # training-log parsing (notebook cells 35-38)
    if args.train_log and args.train_log.exists():
        rows = parse_loss_log(args.train_log.read_text())
        (out / "loss_table.json").write_text(json.dumps(rows, indent=2))
        try:
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.plot([r["epoch"] for r in rows],
                    [r["train_loss"] for r in rows], label="train")
            ax.plot([r["epoch"] for r in rows],
                    [r["valid_loss"] for r in rows], label="valid")
            ax.set_xlabel("epoch")
            ax.set_ylabel("rel-L2 loss")
            ax.legend()
            fig.savefig(out / "loss_curves.png", dpi=150)
            plt.close(fig)
        except Exception:
            pass
        print(f"parsed {len(rows)} epoch lines from {args.train_log}")


if __name__ == "__main__":
    main()
