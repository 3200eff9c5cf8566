"""Config-5 end-to-end campaign (VERDICT r3 item 5): one 10k-atom
synthetic system trained (blocked layout, K=4 curriculum with
grad_steps=1, DH electrostatic node features) to a decreasing loss
curve, then rolled out >= 200 steps with the cell-list rebuild and
blocked scatter, gated against the copy-last baseline.

System: 10,000 atoms on a 4 Angstrom serpentine grid (22^3 box, ~84 A —
dense-packed-protein density, so every piece runs at genuinely solvated
scale) with a smooth breathing displacement field; contacts are exact
8 A KD-tree neighbor lists (scipy), max in-degree ~33. Composes the
pieces that existed only as isolated smokes: blocked training graphs
(data/windows.py edge_layout="blocked"), scatter_mode="blocked"
aggregation, cell-list rollout rebuild (geometry/cells.py), DH features
(preprocess/grid_jax.py), truncated-backprop curriculum.

Usage (TPU): python tools/config5_campaign.py --out tools/config5_results.json
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import (
    ModelConfig, TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data.h5 import TrajectoryData
from molecular_dynamics_neural_operator_tpu.data.windows import WindowDataset
from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan
from molecular_dynamics_neural_operator_tpu.train import create_train_state
from molecular_dynamics_neural_operator_tpu.train.curriculum import (
    make_curriculum_train_step,
)


def serpentine_grid(n: int, spacing: float) -> np.ndarray:
    """First ``n`` points of a boustrophedon walk over a cubic grid —
    consecutive chain indices are always adjacent grid points, so the
    path is physical and the contact graph is uniform."""
    side = int(np.ceil(n ** (1 / 3)))
    pts = []
    for z in range(side):
        ys = range(side) if z % 2 == 0 else range(side - 1, -1, -1)
        for yi, y in enumerate(ys):
            fwd = (z * side + yi) % 2 == 0
            xs = range(side) if fwd else range(side - 1, -1, -1)
            for x in xs:
                pts.append((x, y, z))
                if len(pts) == n:
                    return np.asarray(pts, np.float32) * spacing
    return np.asarray(pts[:n], np.float32) * spacing


def breathing_trajectory(base: np.ndarray, num_frames: int, seed: int,
                         amplitude: float, dt: float):
    """Smooth low-frequency displacement field: positions(t) = base +
    sum_m A_m sin(k_m . base + phi_m) sin(w_m t + psi_m) e_m. Per-frame
    displacement ~ amplitude * w * dt (slow-MD regime)."""
    rng = np.random.default_rng(seed)
    m = 8
    k = rng.normal(size=(m, 3)).astype(np.float32) * 0.15  # ~40 A wavelength
    phi = rng.uniform(0, 2 * np.pi, size=m).astype(np.float32)
    psi = rng.uniform(0, 2 * np.pi, size=m).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=m).astype(np.float32)
    e = rng.normal(size=(m, 3)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    spatial = np.sin(base @ k.T + phi)  # (R, m)
    t = (np.arange(num_frames, dtype=np.float32) * dt)[:, None]  # (N, 1)
    temporal = np.sin(w[None] * t + psi[None]) * amplitude  # (N, m)
    # (N, R, 3) = base + sum_m spatial[r,m] * temporal[n,m] * e[m]
    disp = np.einsum("rm,nm,mc->nrc", spatial, temporal, e)
    return (base[None] + disp).astype(np.float32)


def langevin_field_trajectory(base: np.ndarray, num_frames: int, seed: int,
                              dt: float = 0.05, friction: float = 0.02,
                              kT: float = 0.5, eps_well: float = 2.0,
                              well_width: float = 0.8,
                              k_bond: float = 5.0, k_center: float = 0.02,
                              bond_cutoff: float = 4.5,
                              well_cutoff: float = 6.0,
                              burn_in: int = 500):
    """10k-atom analogue of ``data/synthetic.py::langevin_trajectory``:
    BAOAB Langevin dynamics on an anharmonic network over the serpentine
    grid — nearest grid neighbors are stiff harmonic bonds, next-nearest
    pairs interact through double-well potentials (minima at r0 +-
    well_width), plus a weak tether to the base grid. Built so BOTH
    trivial forecasters fail at 10k scale the way they do on the
    BBA-scale Langevin gate (the breathing sinusoid field is provably
    linear-optimal — tools/linear_probe_10k_results.json — so no network
    can beat extrapolation on it)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    base = base.astype(np.float64)
    tree = cKDTree(base)
    pairs = tree.query_pairs(well_cutoff, output_type="ndarray")
    d0 = np.linalg.norm(base[pairs[:, 0]] - base[pairs[:, 1]], axis=1)
    bb = d0 < bond_cutoff
    ei, ej, r0 = pairs[:, 0], pairs[:, 1], d0
    inv_w4 = 1.0 / well_width ** 4
    n = base.shape[0]

    def forces(x):
        dvec = x[ei] - x[ej]
        r = np.linalg.norm(dvec, axis=1)
        u = r - r0
        dv = np.where(
            bb, k_bond * u,
            4.0 * eps_well * u * (u * u - well_width ** 2) * inv_w4,
        )
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
    out = np.empty((num_frames, n, 3), np.float32)
    f = forces(x)
    for step in range(burn_in + num_frames):
        v = v + half * f
        x = x + half * v
        v = c1 * v + c2 * rng.normal(size=v.shape)
        x = x + half * v
        f = forces(x)
        v = v + half * f
        if step >= burn_in:
            out[step - burn_in] = x.astype(np.float32)
    return out


def kdtree_edges(positions: np.ndarray, threshold: float):
    """Exact per-frame COO edge lists (incl. self-loops) via cKDTree."""
    from scipy.spatial import cKDTree

    out = []
    for f in range(positions.shape[0]):
        tree = cKDTree(positions[f])
        pairs = tree.query_pairs(threshold, output_type="ndarray")
        r = positions.shape[1]
        src = np.concatenate([pairs[:, 0], pairs[:, 1], np.arange(r)])
        dst = np.concatenate([pairs[:, 1], pairs[:, 0], np.arange(r)])
        out.append(np.stack([src, dst]).astype(np.int32))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=10_000)
    p.add_argument("--spacing", type=float, default=4.0)
    p.add_argument("--train_frames", type=int, default=260)
    p.add_argument("--rollout_steps", type=int, default=200)
    p.add_argument("--train_steps", type=int, default=400)
    p.add_argument("--warmup", type=int, default=120,
                   help="teacher-forced (K=1) steps before the K=4 span")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--ker_width", type=int, default=128)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--amplitude", type=float, default=0.35)
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--field", choices=["modes", "langevin"],
                   default="modes",
                   help="displacement field: 'modes' = smooth breathing "
                        "sinusoids (linear forecasters near-optimal); "
                        "'langevin' = anharmonic double-well network "
                        "under Langevin dynamics (learning required; "
                        "dt/amplitude flags are ignored — the generator "
                        "has its own scales)")
    p.add_argument("--threshold", type=float, default=8.0)
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last",
                   help="residual-head base forecast (models/gkn.py "
                        "residual_prior): 'extrapolate' starts training "
                        "from the constant-velocity baseline instead of "
                        "copy-last")
    p.add_argument("--prior_damping", type=float, default=1.0,
                   help="damping on the extrapolate prior (configs.py): "
                        "< 1 contracts the implied velocity toward "
                        "copy-last each step, bounding long-horizon drift")
    p.add_argument("--head_init", choices=["default", "zero"],
                   default="default",
                   help="'zero' zero-initializes the fc2 head (the "
                        "residual model starts exactly at its prior)")
    p.add_argument("--kernel_init_scale", type=float, default=1.0,
                   help="multiplier on the edge-kernel MLP's final-layer "
                        "init; ~1/(2*depth) keeps the f32 init forward "
                        "finite at depth 6 (VERDICT r4 item 7)")
    p.add_argument("--degree_headroom", type=int, default=8,
                   help="extra in-degree capacity above the max observed "
                        "across ALL training frames — prior rollouts "
                        "drift and densify locally; the round-4 prior "
                        "campaigns overflowed a capacity sized from "
                        "frame 0 alone")
    p.add_argument("--window_diff", action="store_true",
                   help="velocity window encoding (configs.py:81-82) — "
                        "puts the ~1e-4-relative per-step displacement "
                        "signal at unit scale for the LSTM encoder")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="average gradients over N consecutive B=1 "
                        "micro-steps before each optimizer update "
                        "(optax.MultiSteps) — batch diversity without "
                        "the (E, w, w) kernel-tensor memory wall that "
                        "forces B=1 at 10k atoms")
    p.add_argument("--scheduler_step", type=int, default=10_000)
    p.add_argument("--scheduler_gamma", type=float, default=1.0)
    p.add_argument("--sample_pairs", type=int, default=8192,
                   help="node pairs sampled for the contact-accuracy gate "
                        "(a full (R, R) contact map is 1e8 entries)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--compilation_cache", type=str, default=None,
                   help="persistent XLA cache dir — the 10k-atom training "
                        "step is a 20+ min compile over the dev tunnel; "
                        "retries after a worker crash skip it")
    args = p.parse_args()

    if args.compilation_cache:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (  # noqa: E501
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache)

    t_all0 = time.time()
    total_frames = args.train_frames + args.rollout_steps + 16
    base = serpentine_grid(args.nodes, args.spacing)
    if args.field == "langevin":
        positions = langevin_field_trajectory(base, total_frames, seed=5)
    else:
        positions = breathing_trajectory(base, total_frames, seed=5,
                                         amplitude=args.amplitude,
                                         dt=args.dt)
    step_rms = float(np.sqrt(np.mean(
        (positions[1:] - positions[:-1]) ** 2)))
    print(f"[gen] {positions.shape} extent "
          f"{positions.min():.0f}..{positions.max():.0f} A, per-frame RMS "
          f"displacement {step_rms:.4f} A", flush=True)

    t0 = time.time()
    edge_lists = kdtree_edges(positions[: args.train_frames],
                              args.threshold)
    counts = np.array([e.shape[1] for e in edge_lists])
    gen_edges_s = time.time() - t0
    # max in-degree over ALL training frames (+ headroom): the round-4
    # prior campaigns sized capacity from frame 0 alone and the evaluated
    # rollout overflowed (VERDICT r4 item 3)
    max_deg = 0
    for el in edge_lists:
        deg = np.zeros(args.nodes, np.int64)
        np.add.at(deg, el[1], 1)
        max_deg = max(max_deg, int(deg.max()))
    max_degree = ((max_deg + args.degree_headroom + 7) // 8) * 8
    max_edges = args.nodes * max_degree
    print(f"[graph] {counts.min()}-{counts.max()} edges/frame, max "
          f"in-degree {max_deg} -> blocked max_degree {max_degree} "
          f"(capacity {max_edges}) in {gen_edges_s:.0f}s", flush=True)

    traj = TrajectoryData(
        positions=positions[: args.train_frames],
        edge_indices=edge_lists,
        aminoacids=np.random.default_rng(0).integers(
            0, 20, args.nodes).astype(np.int32),
        rmsd=None,
    )
    # neighbor_impl="cell_list" matters for TRAINING too, not just the
    # rollout below: the K=4 curriculum's free steps rebuild the graph
    # on device (train/curriculum.py free_step -> rollout.scan._build_graph),
    # and the default brute-force rebuild at 10k nodes compiles (R, R) =
    # 1e8-entry intermediates whose compaction hard-crashed the TPU worker
    # at the first K=4 step (three identical crashes at step==warmup).
    # The cell-list rebuild also emits the block layout that
    # scatter_mode="blocked" and the blocked dataset graphs use.
    cfg = ModelConfig(
        compute_dtype="float32", graph_mode="sparse",
        num_residues=args.nodes, max_edges=max_edges,
        width=args.width, ker_width=args.ker_width, depth=args.depth,
        predict_delta=True, predict_prior=args.predict_prior,
        prior_damping=args.prior_damping, head_init=args.head_init,
        kernel_init_scale=args.kernel_init_scale,
        electrostatics="dh",
        scatter_mode="blocked", train_conv_impl="xla",
        neighbor_impl="cell_list", max_degree=max_degree,
        cell_capacity=32, num_cells=16384,
        window_diff=args.window_diff,
    )
    tcfg = TrainConfig(lr=args.lr, weight_decay=1e-6, batch_size=1,
                       grad_clip_norm=1.0, skip_nonfinite_updates=True,
                       scheduler_step=args.scheduler_step,
                       scheduler_gamma=args.scheduler_gamma,
                       grad_accum=args.grad_accum)
    ds = WindowDataset(traj, window_size=cfg.window_size,
                       graph_mode="sparse", max_edges=max_edges,
                       threshold=args.threshold, edge_layout="blocked")

    state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    # unroll_scans: at 10k atoms / 400k-edge capacity a scan-wrapped
    # rollout body is a 28+ minute compile over the dev tunnel
    # (docs/PERFORMANCE.md "Large-system smoke"); unrolled it compiles
    # in minutes — identical math (tests/test_curriculum.py).
    step_k1 = make_curriculum_train_step(
        cfg, tx, rollout_steps=1, threshold=args.threshold,
        coord_clip=1000.0)
    step_k = make_curriculum_train_step(
        cfg, tx, rollout_steps=args.k, threshold=args.threshold,
        coord_clip=1000.0, grad_steps=1, unroll_scans=True)

    pool = np.arange(args.train_frames - cfg.window_size - args.k)
    rng = np.random.default_rng(0)
    losses = []
    t0 = time.time()
    for i in range(args.train_steps):
        idx = rng.choice(pool, size=1)
        k_now = 1 if i < args.warmup else args.k
        batch = {kk: jnp.asarray(v) for kk, v in
                 ds.get_batch(idx, rollout_horizon=k_now).items()}
        st = step_k1 if k_now == 1 else step_k
        state, m = st(state, batch)
        if i % 10 == 0 or i == args.train_steps - 1:
            lv = float(m["rel_l2"])
            losses.append({"step": i, "rel_l2": lv, "k": k_now})
            print(f"step {i}: rel_l2 {lv:.5f} (K={k_now}, "
                  f"{time.time() - t0:.0f}s)", flush=True)
    train_seconds = time.time() - t0

    # --- >= 200-step free rollout: same cell-list + blocked config
    cfg_roll = cfg
    start = args.train_frames
    aa = jnp.asarray(traj.aminoacids)
    w0 = jnp.asarray(positions[start - cfg.window_size : start])
    truth = positions[start : start + args.rollout_steps]

    roll = jax.jit(lambda p, a, w: rollout_scan(
        p, cfg_roll, a, w, args.rollout_steps,
        threshold=args.threshold, clip=1000.0))
    t0 = time.time()
    coords, _, diags = roll(state.params, aa, w0)
    coords = np.asarray(coords)
    rollout_seconds = time.time() - t0

    mses = np.mean((coords - truth) ** 2, axis=(1, 2))
    frozen = np.asarray(w0[-1])
    base_mses = np.mean((frozen[None] - truth) ** 2, axis=(1, 2))
    # second honesty baseline: constant-velocity linear extrapolation of
    # the last two window frames — on smooth trajectories it is the
    # stronger trivial forecaster (copy-last is the zero-velocity case)
    prev = np.asarray(w0[-2])
    ahead = np.arange(1, args.rollout_steps + 1,
                      dtype=np.float32)[:, None, None]
    extrap = frozen[None] + (frozen - prev)[None] * ahead
    extrap_mses = np.mean((extrap - truth) ** 2, axis=(1, 2))
    # third honesty bar when a damped prior is configured: the model's
    # OWN prior rolled out headless (closed-form geometric velocity
    # contraction, rollout/baseline.py::damped_extrapolation_baseline —
    # recomputed inline so the 1e8-entry contact maps stay sampled)
    prior_mses = None
    if args.predict_prior == "extrapolate" and args.prior_damping != 1.0:
        g = args.prior_damping
        kk = np.arange(1, args.rollout_steps + 1, dtype=np.float64)
        coef = (g * (1.0 - g ** kk) / (1.0 - g)).astype(np.float32)
        prior_pred = frozen[None] + (frozen - prev)[None] * coef[:, None,
                                                                 None]
        prior_mses = np.mean((prior_pred - truth) ** 2, axis=(1, 2))
    fin = int(np.isfinite(coords).all(axis=(1, 2)).sum())

    # sampled-pair contact accuracy (full (R, R) maps are 1e8 entries)
    pr = np.random.default_rng(1)
    ia = pr.integers(0, args.nodes, args.sample_pairs)
    shift = pr.integers(1, 80, args.sample_pairs)  # near-chain pairs:
    ib = (ia + shift) % args.nodes  # the distance-distribution tail that
    # actually flips contacts; uniform random pairs are ~all far apart

    def pair_contacts(frames):
        d2 = np.sum((frames[:, ia] - frames[:, ib]) ** 2, axis=-1)
        return d2 < args.threshold ** 2

    ct = pair_contacts(truth)
    acc_model = float(np.mean(pair_contacts(coords) == ct))
    acc_base = float(np.mean(pair_contacts(
        np.repeat(frozen[None], len(truth), 0)) == ct))
    acc_extrap = float(np.mean(pair_contacts(extrap) == ct))

    def at(a, s):
        return float(a[min(s - 1, len(a) - 1)])

    out = {
        "config": vars(args),
        "system": {
            "nodes": args.nodes, "box_extent_A": float(positions.max()),
            "edges_per_frame": [int(counts.min()), int(counts.max())],
            "max_in_degree": max_deg, "blocked_capacity": max_edges,
            "per_frame_rms_displacement_A": step_rms,
            "edge_gen_seconds": round(gen_edges_s, 1),
        },
        "train": {
            "steps": args.train_steps, "seconds": round(train_seconds, 1),
            "sec_per_step": round(train_seconds / args.train_steps, 3),
            "loss_curve": losses,
            "loss_first": losses[0]["rel_l2"],
            "loss_last": losses[-1]["rel_l2"],
            "decreasing": losses[-1]["rel_l2"] < 0.5 * losses[0]["rel_l2"],
        },
        "rollout": {
            "steps": args.rollout_steps,
            "seconds": round(rollout_seconds, 1),
            "ms_per_step": round(1e3 * rollout_seconds
                                 / args.rollout_steps, 1),
            "finite_steps": fin,
            "edge_overflow": bool(np.asarray(diags["edge_overflow"]).any()),
            "coord_mse": {f"step{s}": at(mses, s)
                          for s in (1, 10, 100, 200)},
            "baseline_coord_mse": {f"step{s}": at(base_mses, s)
                                   for s in (1, 10, 100, 200)},
            "extrapolation_coord_mse": {f"step{s}": at(extrap_mses, s)
                                        for s in (1, 10, 100, 200)},
            "model_over_baseline_mse": {
                f"step{s}": at(mses, s) / at(base_mses, s)
                for s in (1, 10, 100, 200) if fin >= s},
            "model_over_extrapolation_mse": {
                f"step{s}": at(mses, s) / at(extrap_mses, s)
                for s in (1, 10, 100, 200) if fin >= s},
            "sampled_contact_accuracy_model": acc_model,
            "sampled_contact_accuracy_baseline": acc_base,
            "sampled_contact_accuracy_extrapolation": acc_extrap,
            **({
                "prior_only_coord_mse": {
                    f"step{s}": at(prior_mses, s)
                    for s in (1, 10, 100, 200)},
                "model_over_prior_only_mse": {
                    f"step{s}": at(mses, s) / at(prior_mses, s)
                    for s in (1, 10, 100, 200) if fin >= s},
                "sampled_contact_accuracy_prior_only": float(np.mean(
                    pair_contacts(prior_pred) == ct)),
            } if prior_mses is not None else {}),
        },
        "total_seconds": round(time.time() - t_all0, 1),
    }
    print(json.dumps(out, indent=2))
    if args.out:
        _Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
