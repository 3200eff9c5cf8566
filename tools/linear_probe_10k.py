"""Linear probe on the 10k-atom synthetic family: is the next per-node
displacement linearly representable from the window's past displacements?

Fits ONE global length-(T-1) filter c with ridge least squares:

    delta_hat(r, t+1) = sum_j c_j * delta(r, t-j)        (componentwise)

over every (frame, node, xyz) sample of the training span, then reports
its held-out MSE next to copy-last (zero filter) and constant-velocity
extrapolation (c = [1, 0, ...]). The breathing field is a sum of m=8
separable modes s_m(r) * T_m(t) * e_m, so an exact global filter exists
whenever T-1 >= m is not required — 9 taps vs 8 modes is enough in the
slow regime (generalized Prony).

Purpose: the 10k campaigns tie copy-last EXACTLY at every budget, width,
batch diversity, and displacement scale (tools/config5_results_*.json).
If this probe's MSE is far below copy-last, the GKN's tie is an
*optimization* failure (zero-delta attractor), not a representation or
data limit — the motivation for ModelConfig.predict_prior="extrapolate".
Host-only (numpy): no chip, no JAX.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.config5_campaign import breathing_trajectory, serpentine_grid


def filter_mse(coords, c, t0, t1):
    """Mean squared next-frame prediction error of filter ``c`` (applied to
    past deltas, oldest tap last) over frames [t0, t1)."""
    taps = len(c)
    err = 0.0
    n = 0
    for t in range(t0, t1):
        pred = coords[t].copy()
        for j in range(taps):
            pred += c[j] * (coords[t - j] - coords[t - j - 1])
        e = pred - coords[t + 1]
        err += float((e * e).sum())
        n += e.size
    return err / n


def exact_annihilator(dt: float, seed: int = 0):
    """The order-2m Prony annihilator of the breathing field's m temporal
    modes: prod_m (z^2 - 2 cos(w_m dt) z + 1). Applied to past deltas it
    predicts the next delta EXACTLY on infinite-precision data — but its
    coefficients grow combinatorially (|c| up to ~1e4 at m=8), so on
    f32-stored coordinates it amplifies the ~3e-6 A quantization noise
    above the extrapolation residual: constant velocity is the practical
    optimum for this family at storage precision. (Uses the same RNG
    consumption order as breathing_trajectory.)"""
    rng = np.random.default_rng(seed)
    m = 8
    rng.normal(size=(m, 3))            # k (unused here)
    rng.uniform(0, 2 * np.pi, size=m)  # phi
    rng.uniform(0, 2 * np.pi, size=m)  # psi
    w = rng.uniform(0.5, 2.0, size=m).astype(np.float32)
    poly = np.array([1.0])
    for wm in w:
        poly = np.convolve(poly, np.array([1.0, -2 * np.cos(wm * dt), 1.0]))
    return -poly[1:]  # delta(t+1) = sum_j c_j delta(t-j)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=10_000)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--taps", type=int, default=9,
                   help="window_size 10 gives 9 usable past deltas")
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--amplitude", type=float, default=0.35)
    p.add_argument("--ridge", type=float, default=1e-8)
    p.add_argument("--train_frac", type=float, default=0.7)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    base = serpentine_grid(args.nodes, 4.0)
    coords = breathing_trajectory(base, args.frames, seed=0,
                                  amplitude=args.amplitude, dt=args.dt)
    deltas = np.diff(coords, axis=0)  # (F-1, R, 3)

    taps = args.taps
    split = int(args.frames * args.train_frac)
    # Normal equations accumulated frame-by-frame (the full design matrix
    # would be (F*R*3, taps) — pointlessly large).
    ata = np.zeros((taps, taps))
    atb = np.zeros(taps)
    for t in range(taps, split - 1):
        x = np.stack([deltas[t - j].ravel() for j in range(taps)])  # (taps, R*3)
        y = deltas[t].ravel()
        ata += x @ x.T
        atb += x @ y
    c = np.linalg.solve(ata + args.ridge * np.trace(ata) / taps * np.eye(taps),
                        atb)

    t0, t1 = split, args.frames - 1
    theory = exact_annihilator(args.dt)
    res = {
        "config": vars(args),
        "filter": c.tolist(),
        "heldout_mse": {
            "linear_probe": filter_mse(coords, c, t0, t1),
            "copy_last": filter_mse(coords, np.zeros(taps), t0, t1),
            "extrapolation": filter_mse(
                coords, np.eye(1, taps, 0).ravel(), t0, t1),
            "exact_annihilator": filter_mse(coords, theory, t0, t1),
        },
        "annihilator_noise_amplification": float(
            np.sqrt((theory * theory).sum())),
    }
    m = res["heldout_mse"]
    res["probe_over_copy_last"] = m["linear_probe"] / m["copy_last"]
    res["probe_over_extrapolation"] = (
        m["linear_probe"] / m["extrapolation"])
    print(json.dumps(res["heldout_mse"], indent=1))
    print("probe/copy-last:", f"{res['probe_over_copy_last']:.3e}",
          " probe/extrapolation:", f"{res['probe_over_extrapolation']:.3e}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
