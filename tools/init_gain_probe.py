"""Root-cause probe for the K=1/K-switch training explosions
(VERDICT r4 item 5) — the conv stack's unconstrained init gain.

At the flagship BBA config (width 64, ker_width 1024, depth 6) the
torch-default edge-kernel init gives each of the 2*depth tied conv layers
a gain ~||K_e|| >> 1, so the latent magnitude at init is ~1e7-1e9 (the
"init-explosion family", docs/PERFORMANCE.md). Consequences measured
here:

1. **latent gain at init** vs ``kernel_init_scale`` — the probe sweeps
   the scale and reports latent rms; ~1/(2*depth) brings the init
   forward to O(input).
2. **amplification of input perturbations**: |dlatent|/|dx| for a small
   window perturbation — the mechanism that turns a slightly
   off-manifold fed-back prediction (curriculum free step or rollout)
   into an f32 overflow: a predict_delta/zero-head model can sit at a
   tiny K=1 loss (the head learns the ~1/gain inverse) while the stack
   underneath amplifies any feedback error by the same gain.

This is a host-side (CPU) probe: it runs single forwards, no training.
The training-side evidence lives in the recipe gates (the K=1 transient
at step ~800 with the default init disappears under
``kernel_init_scale=1/(2*depth)``; the zero-head K=4 switch NaN
likewise — see docs/PERFORMANCE.md "Init-gain root cause").

Usage: python tools/init_gain_probe.py --out tools/init_gain_results.json
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse  # noqa: E402
import json  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig  # noqa: E402
from molecular_dynamics_neural_operator_tpu.data import (  # noqa: E402
    WindowDataset,
    synthetic_trajectory,
)
from molecular_dynamics_neural_operator_tpu.models import gkn_init  # noqa: E402
from molecular_dynamics_neural_operator_tpu.models.gkn import (  # noqa: E402
    gkn_apply_single,
)
from molecular_dynamics_neural_operator_tpu.train.loop import (  # noqa: E402
    featurize_batch,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--ker_width", type=int, default=1024)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--scales", type=float, nargs="+",
                   default=[1.0, 0.25, 1 / 12, 1 / 24])
    p.add_argument("--perturb", type=float, default=1e-3)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    traj = synthetic_trajectory(num_frames=32, num_residues=28, seed=11)
    rows = []
    for scale in args.scales:
        cfg = ModelConfig(width=args.width, ker_width=args.ker_width,
                          depth=args.depth, graph_mode="sparse",
                          max_edges=512, compute_dtype="float32",
                          predict_delta=True, predict_prior="extrapolate",
                          head_init="zero", kernel_init_scale=scale)
        params = gkn_init(jax.random.PRNGKey(0), cfg)
        ds = WindowDataset(traj, window_size=cfg.window_size,
                           graph_mode="sparse", max_edges=512)
        batch = featurize_batch(cfg, ds.get_batch(np.array([0])))
        aa = jnp.asarray(batch.aa)
        window = jnp.asarray(batch.window[0])
        graph = jax.tree_util.tree_map(lambda a: a[0], batch.graph)

        def latent_of(w):
            _, lat = gkn_apply_single(params, cfg, aa, w, graph,
                                      return_latent=True)
            return lat

        lat = latent_of(window)
        # feedback-error amplification: perturb the window's last frame
        # by eps (a stand-in for a fed-back prediction error) and measure
        # the latent response
        eps = args.perturb
        w2 = window.at[-1].add(eps)
        lat2 = latent_of(w2)
        lat_rms = float(jnp.sqrt(jnp.mean(lat ** 2)))
        dlat = float(jnp.sqrt(jnp.mean((lat2 - lat) ** 2)))
        rows.append({
            "kernel_init_scale": scale,
            "latent_rms_at_init": lat_rms,
            "latent_finite": bool(jnp.isfinite(lat).all()),
            "dlatent_rms_per_unit_input": dlat / eps,
            "per_layer_gain_estimate": float(
                lat_rms ** (1.0 / (2 * args.depth))) if lat_rms > 0 else 0,
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {"config": vars(args), "rows": rows}
    if args.out:
        _Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
