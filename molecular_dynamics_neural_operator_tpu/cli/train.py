"""Training CLI — flag-compatible with the reference driver.

``python -m molecular_dynamics_neural_operator_tpu.cli.train --data_path ...
--run_path ...`` mirrors ``python graph_kernel.py`` flag names and defaults
(``/root/reference/graph_kernel.py:312-359``), orchestrating the epoch loop
of ``main()`` (``:496-646``): dataset, partition split, jitted train/eval,
propagation movie, latent sweep, best-checkpoint saving, stdout epoch lines
in the notebook-parseable format, JSONL (+ optional wandb) metrics.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=Path, required=True)
    p.add_argument("--run_path", type=Path, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--scheduler_step", type=int, default=50)
    p.add_argument("--scheduler_gamma", type=float, default=0.8)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--out_width", type=int, default=3)
    p.add_argument("--kernel_width", type=int, default=1024)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--node_features", type=int, default=7)
    p.add_argument("--edge_features", type=int, default=6)
    p.add_argument("--num_embeddings", type=int, default=20)
    p.add_argument("--embedding_dim", type=int, default=4)
    p.add_argument("--split_pct", type=float, default=0.8)
    # Reference DataLoader worker knobs (graph_kernel.py:332-335). The TPU
    # input pipeline replaces worker processes with the double-buffered
    # prefetch_to_device queue (data/prefetch.py), so: prefetch_factor maps
    # onto the prefetch depth; the other three are accepted for drop-in
    # compatibility with reference command lines and warned as no-ops.
    # The reference's `type=bool` (graph_kernel.py:336,338) makes EVERY
    # non-empty string truthy — "--generate_movie False" silently stays on.
    # Accept the common falsy spellings instead of reproducing that trap.
    _flag = lambda s: s.lower() not in ("false", "0", "no", "off")  # noqa: E731
    p.add_argument("--num_data_workers", type=int, default=0)
    p.add_argument("--prefetch_factor", type=int, default=2)
    p.add_argument("--persistent_workers", type=_flag, default=False)
    p.add_argument("--non_blocking", type=_flag, default=False)
    p.add_argument("--generate_movie", type=_flag, default=True)
    p.add_argument("--num_movie_frames", type=int, default=5)
    p.add_argument("--plot_latent", type=_flag, default=True)
    p.add_argument("--plot_per_epochs", type=int, default=1)
    p.add_argument("--window_size", type=int, default=10)
    p.add_argument("--num_residues", type=int, default=28)
    p.add_argument("--horizon", type=int, default=1,
                   help="prediction horizon (dataset.py:91-92)")
    p.add_argument("--node_features_path", type=Path, default=None)
    p.add_argument("--max_frames", type=int, default=100_000_000,
                   help="truncate trajectories for shorter training "
                        "(dataset.py:108 ntrain cap)")
    p.add_argument("--rollout_steps", type=int, default=0,
                   help="K>0 enables the K-step rollout curriculum loss")
    p.add_argument("--loss_space", choices=["absolute", "delta"],
                   default="absolute",
                   help="curriculum loss normalization: 'delta' divides "
                        "each step's error by the true per-step "
                        "displacement (makes learning the motion the "
                        "unit-scale objective; 'absolute' is the "
                        "reference's LpLoss on coordinates)")
    p.add_argument("--grad_steps", type=int, default=0,
                   help="supervise only the last j curriculum steps "
                        "(burn-in rollout + truncated backprop: K "
                        "forwards but j backwards; 0 = full BPTT "
                        "through all K steps)")
    p.add_argument("--unroll_scans", action="store_true",
                   help="unroll the curriculum's K-step loops instead of "
                        "lax.scan — identical math; compiles MUCH faster "
                        "at 10k-atom scale (tools/config5_campaign.py)")
    p.add_argument("--burnin_dtype", choices=["bfloat16"], default=None,
                   help="run the curriculum burn-in prefix (the "
                        "stop-gradient steps before the last grad_steps) "
                        "with the model body at this dtype — cheapens an "
                        "f32 recipe's exposure steps without touching "
                        "gradient precision")
    p.add_argument("--coord_clip", type=float, default=1000.0,
                   help="clip rail on the curriculum's inner rollout "
                        "coordinates (0 disables; essential for bf16 "
                        "curriculum stability)")
    p.add_argument("--noise_std", type=float, default=0.0,
                   help="GNS-style random-walk input noise std (Angstrom) "
                        "on the training windows; targets stay clean so "
                        "the model learns to correct drifting inputs "
                        "(0 disables — reference behavior)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="average this many micro-batch gradients per "
                        "optimizer apply (optax.MultiSteps) — batch "
                        "diversity when memory caps the per-step batch "
                        "size; StepLR boundaries stay in epochs")
    p.add_argument("--grad_clip_norm", type=float, default=None,
                   help="global-norm gradient clipping (default: 1.0 when "
                        "the curriculum is on, else off)")
    p.add_argument("--skip_nonfinite", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="reject NaN/inf update steps (default: on when the "
                        "curriculum is on)")
    p.add_argument("--operator", choices=["gkn", "fno"], default="gkn",
                   help="operator family: graph kernel network (reference "
                        "parity) or FNO on distance matrices")
    p.add_argument("--fno_modes", type=int, default=12)
    p.add_argument("--fno_width", type=int, default=32)
    p.add_argument("--fno_depth", type=int, default=4)
    p.add_argument("--fno_predict_prior", choices=["last", "extrapolate"],
                   default="last",
                   help="FNO residual base: copy-last distance matrix or "
                        "constant-velocity 2 D_t - D_{t-1}")
    p.add_argument("--fno_predict_delta", action="store_true",
                   help="FNO residual head: predict the distance-matrix "
                        "change on top of the last input channel (the "
                        "quality recipe; see tools/fno_accuracy_eval.py)")
    # TPU-framework extensions (not in the reference):
    p.add_argument("--graph_mode", choices=["dense", "sparse"], default="dense")
    p.add_argument("--max_edges", type=int, default=384,
                   help="padded edge capacity for sparse mode; throughput "
                        "scales with it (224 covers BBA's max contact "
                        "count of ~216 incl. self-loops and is ~15%% "
                        "faster than the conservative 384 default; "
                        "overflow is diagnosed per epoch)")
    p.add_argument("--edge_layout", choices=["csr", "blocked"],
                   default="csr",
                   help="'blocked' packs training edge lists in the "
                        "cell-list block layout (slot n*max_degree+d "
                        "targets node n; max_edges must be divisible by "
                        "num_residues) so large-system aggregation uses "
                        "dense per-node reductions instead of scatters")
    p.add_argument("--train_conv_impl", choices=["auto", "xla", "pallas"],
                   default="auto",
                   help="batched conv-stack implementation: 'pallas' keeps "
                        "the kernel tensor VMEM-resident across all layers "
                        "(1.6-1.9x training throughput on TPU); 'auto' "
                        "picks it on TPU for sparse+tied configs")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--predict_delta", action="store_true")
    p.add_argument("--predict_prior", choices=["last", "extrapolate"],
                   default="last",
                   help="base forecast the predict_delta head corrects: "
                        "'last' = copy-last frame; 'extrapolate' = "
                        "constant-velocity (2x_t - x_{t-1}, GNS-style) — "
                        "a zero head equals linear extrapolation instead "
                        "of a frozen frame")
    p.add_argument("--prior_damping", type=float, default=1.0,
                   help="damping on the extrapolate prior's implied "
                        "velocity (prior = x_t + g (x_t - x_{t-1})): 1.0 "
                        "is pure constant-velocity, < 1 contracts toward "
                        "copy-last to bound long-horizon drift")
    p.add_argument("--head_init", choices=["default", "zero"],
                   default="default",
                   help="'zero' zero-initializes the fc2 head (GNS "
                        "practice) so the step-0 forecast is exactly the "
                        "prior — required for a residual head that never "
                        "hurts its prior")
    p.add_argument("--head_scale", type=float, default=1.0,
                   help="GNS target normalization: the residual head's "
                        "output is multiplied by this before the prior is "
                        "added — set to ~std(y - prior) of the data so the "
                        "head's training dynamics live at the learning "
                        "target's scale (configs.ModelConfig.head_scale)")
    p.add_argument("--kernel_init_scale", type=float, default=1.0,
                   help="multiplier on the edge-kernel MLP's final-layer "
                        "init; ~1/(2*depth) keeps the f32 init forward "
                        "finite at depth 6 / 10k atoms")
    p.add_argument("--window_diff", action="store_true",
                   help="encode the window as [last frame ; scaled frame "
                        "diffs]: on slowly-varying trajectories raw frames "
                        "hide the per-step motion ~1e-4 below the "
                        "coordinate scale and training parks at the "
                        "copy-last-frame baseline")
    p.add_argument("--window_diff_scale", type=float, default=100.0)
    p.add_argument("--electrostatics", choices=["none", "dh"],
                   default="none",
                   help="append the on-device Debye-Hueckel potential at "
                        "each residue as a node feature (BASELINE config 5)")
    p.add_argument("--latent_frames", type=int, default=10000)
    p.add_argument("--resume", type=Path, default=None,
                   help="checkpoint (.npz) to resume from")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first "
                        "training epoch to <run_path>/trace "
                        "(TensorBoard/Perfetto viewable)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--compilation_cache", type=Path, default=None,
                   help="persistent XLA compilation-cache dir: repeated "
                        "runs of the same program skip the multi-minute "
                        "TPU compile (utils/compilation_cache.py)")
    args = p.parse_args(argv)
    if not args.data_path.exists():
        raise ValueError(f"data_path does not exist: {args.data_path}")
    return args


def build_configs(args):
    from molecular_dynamics_neural_operator_tpu.configs import (
        DataConfig,
        ModelConfig,
        TrainConfig,
    )

    train_conv_impl = args.train_conv_impl
    if train_conv_impl == "auto":
        try:
            from molecular_dynamics_neural_operator_tpu.ops.pallas.fused_gkn import (  # noqa: E501
                pallas_available,
            )

            # (under --data_parallel the sharded factories wrap the step
            # in an explicit shard_map, so the Pallas stack still applies)
            train_conv_impl = (
                "pallas"
                if pallas_available() and args.graph_mode == "sparse"
                else "xla"
            )
        except Exception:
            train_conv_impl = "xla"

    model = ModelConfig(
        train_conv_impl=train_conv_impl,
        width=args.width,
        ker_width=args.kernel_width,
        depth=args.depth,
        edge_features=args.edge_features,
        node_features=args.node_features,
        out_width=args.out_width,
        num_embeddings=args.num_embeddings,
        embedding_dim=args.embedding_dim,
        window_size=args.window_size,
        num_residues=args.num_residues,
        graph_mode=args.graph_mode,
        max_edges=args.max_edges,
        scatter_mode=(
            "blocked" if getattr(args, "edge_layout", "csr") == "blocked"
            else "auto"
        ),
        compute_dtype=args.compute_dtype,
        predict_delta=args.predict_delta,
        predict_prior=args.predict_prior,
        prior_damping=args.prior_damping,
        head_init=args.head_init,
        head_scale=args.head_scale,
        kernel_init_scale=args.kernel_init_scale,
        window_diff=args.window_diff,
        window_diff_scale=args.window_diff_scale,
        electrostatics=args.electrostatics,
    )
    data = DataConfig(
        data_path=str(args.data_path),
        node_features_path=(
            str(args.node_features_path) if args.node_features_path else None
        ),
        window_size=args.window_size,
        horizon=args.horizon,
        split_pct=args.split_pct,
    )
    # Curriculum defaults to the known-stable recipe (grad clipping +
    # non-finite-update rejection); explicit flags override.
    curriculum = args.rollout_steps > 0
    clip = args.grad_clip_norm if args.grad_clip_norm is not None else (
        1.0 if curriculum else 0.0)
    skip_nf = args.skip_nonfinite if args.skip_nonfinite is not None else (
        curriculum)
    train = TrainConfig(
        rollout_steps=args.rollout_steps,
        loss_space=args.loss_space,
        noise_std=args.noise_std,
        grad_clip_norm=clip,
        skip_nonfinite_updates=skip_nf,
        grad_accum=args.grad_accum,
        seed=args.seed,
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        scheduler_step=args.scheduler_step,
        scheduler_gamma=args.scheduler_gamma,
        run_path=str(args.run_path),
        generate_movie=args.generate_movie,
        num_movie_frames=args.num_movie_frames,
        plot_latent=args.plot_latent,
        plot_per_epochs=args.plot_per_epochs,
        latent_frames=args.latent_frames,
        log_wandb=args.wandb,
    )
    return model, data, train


def _main_fno(args, data_cfg, train_cfg):
    """FNO training path: same data/split/checkpoint/metrics machinery,
    distance-matrix featurization on device (models/fno.py)."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        batch_iterator,
        load_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models.fno import (
        distance_matrix_channels,
        fno_init,
        fno_rollout_scan,
        make_fno_window_eval_step,
        make_fno_window_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train import train_valid_split
    from molecular_dynamics_neural_operator_tpu.train.optim import make_optimizer
    from molecular_dynamics_neural_operator_tpu.train.state import TrainState
    from molecular_dynamics_neural_operator_tpu.utils import (
        BestCheckpointer,
        MetricLogger,
    )
    from molecular_dynamics_neural_operator_tpu.utils.movie import (
        render_propagation_movie,
    )

    run_dir = Path(train_cfg.run_path)
    run_dir.mkdir(parents=True, exist_ok=True)
    traj = load_trajectory(data_cfg.data_path)
    cfg = FNOConfig(
        width=args.fno_width, modes1=args.fno_modes, modes2=args.fno_modes,
        depth=args.fno_depth, in_channels=args.window_size,
        num_residues=traj.num_residues,
        predict_delta=args.fno_predict_delta,
        predict_prior=args.fno_predict_prior,
        prior_damping=args.prior_damping,
        head_init=args.head_init,
        head_scale=args.head_scale,
    )
    # config.json parity with the GKN path: --run_path consumers
    # (examples/bba_analysis.py, cli/export.py) read the fno section.
    from molecular_dynamics_neural_operator_tpu import configs as _configs

    (run_dir / "config.json").write_text(
        _configs.to_json(_configs.ExperimentConfig(
            fno=cfg, data=data_cfg, train=train_cfg))
    )
    ds = WindowDataset(traj, window_size=args.window_size,
                       horizon=data_cfg.horizon, graph_mode="none")
    tr_idx, va_idx = train_valid_split(len(ds), data_cfg.split_pct,
                                       data_cfg.split_method)
    steps_per_epoch = max(1, len(tr_idx) // train_cfg.batch_size)
    # forward the stability recipe (clip + skip-nonfinite default on with
    # the curriculum) — the GKN path gets these via create_train_state
    tx, _ = make_optimizer(
        train_cfg.lr, train_cfg.weight_decay, train_cfg.scheduler_step,
        train_cfg.scheduler_gamma, steps_per_epoch,
        grad_clip_norm=train_cfg.grad_clip_norm,
        skip_nonfinite_updates=train_cfg.skip_nonfinite_updates,
        grad_accum=train_cfg.grad_accum,
    )
    params = fno_init(jax.random.PRNGKey(train_cfg.seed), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(train_cfg.seed))
    start_epoch = 0
    if args.resume is not None:
        from molecular_dynamics_neural_operator_tpu.utils import (
            restore_checkpoint,
        )

        state, meta = restore_checkpoint(args.resume, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"Resumed from {args.resume} at epoch {start_epoch}")
    if train_cfg.rollout_steps > 0:
        from molecular_dynamics_neural_operator_tpu.models.fno import (
            make_fno_curriculum_train_step,
        )

        step = make_fno_curriculum_train_step(
            cfg, tx, rollout_steps=train_cfg.rollout_steps
        )
        print(f"FNO curriculum training: K={train_cfg.rollout_steps} "
              "rollout steps in the loss")
    else:
        step = make_fno_window_train_step(cfg, tx)
    eval_step = make_fno_window_eval_step(cfg)

    put = None
    if args.data_parallel and len(jax.devices()) > 1:
        # FNO is pure jnp: batch-axis sharding propagates through the
        # jitted step and XLA inserts the gradient psum (same mechanism as
        # the GKN teacher path).
        from molecular_dynamics_neural_operator_tpu.parallel.mesh import (
            data_parallel_put,
        )

        mesh, put = data_parallel_put(train_cfg.batch_size)
        print(f"FNO data parallelism: batch sharded over "
              f"{mesh.shape['data']} devices")
    logger = MetricLogger(run_dir, use_wandb=train_cfg.log_wandb,
                          config=vars(args))
    ckpt = BestCheckpointer(run_dir, resume=args.resume is not None)
    print(f"FNO training: {len(ds)} windows, R={traj.num_residues}")

    for epoch in range(start_epoch, train_cfg.epochs):
        t0 = _time.time()
        tr_loss = n = 0
        for batch in batch_iterator(ds, tr_idx, train_cfg.batch_size,
                                    seed=train_cfg.seed, epoch=epoch,
                                    rollout_horizon=train_cfg.rollout_steps):
            if put is not None:
                batch = put(batch)
            state, m = step(state, batch)
            tr_loss += float(m["rel_l2"])
            n += 1
        tr_loss /= max(n, 1)
        va_loss = n = 0
        # keep the remainder batch: with drop_last a validation split
        # smaller than the batch size would yield a fake va_loss of 0.0
        for batch in batch_iterator(ds, va_idx, train_cfg.batch_size,
                                    shuffle=False, drop_last=False):
            m = eval_step(state.params, batch)
            va_loss += float(m["rel_l2"])
            n += 1
        va_loss = va_loss / n if n else float("nan")

        extra = {}
        if (train_cfg.generate_movie and train_cfg.plot_per_epochs > 0
                and epoch % train_cfg.plot_per_epochs == 0):
            ch0 = distance_matrix_channels(
                jnp.asarray(traj.positions[va_idx[0] : va_idx[0]
                                           + args.window_size])
            )
            preds, _ = fno_rollout_scan(state.params, cfg, ch0,
                                        train_cfg.num_movie_frames)
            fc = [(np.asarray(p) < data_cfg.threshold).astype(np.float32)
                  for p in preds]
            real = []
            for i in range(train_cfg.num_movie_frames):
                idx = min(va_idx[0] + args.window_size + i,
                          traj.num_frames - 1)
                d = np.linalg.norm(
                    traj.positions[idx][:, None] - traj.positions[idx][None],
                    axis=-1,
                )
                real.append((d < data_cfg.threshold).astype(np.float32))
            extra["movie"] = str(
                render_propagation_movie(run_dir, epoch, fc, real)
            )

        logger.log_epoch(epoch, _time.time() - t0, tr_loss, va_loss, extra)
        ckpt.update(epoch, va_loss, state)
    logger.close()
    return state


def main(argv=None):
    args = parse_args(argv)
    model_cfg, data_cfg, train_cfg = build_configs(args)

    if args.compilation_cache is not None:
        from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (  # noqa: E501
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache)

    for name in ("num_data_workers", "persistent_workers", "non_blocking"):
        if getattr(args, name):
            print(f"WARNING: --{name} accepted for reference CLI "
                  "compatibility but is a no-op: host batches flow through "
                  "the in-process prefetch_to_device queue "
                  "(--prefetch_factor sets its depth)")

    if args.operator == "fno":
        return _main_fno(args, data_cfg, train_cfg)

    import jax
    import numpy as np

    from molecular_dynamics_neural_operator_tpu import configs
    from molecular_dynamics_neural_operator_tpu.data import (
        WindowDataset,
        load_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
    )
    from molecular_dynamics_neural_operator_tpu.train import (
        create_train_state,
        eval_epoch,
        make_eval_step,
        make_train_step,
        train_epoch,
        train_valid_split,
    )
    from molecular_dynamics_neural_operator_tpu.utils import (
        BestCheckpointer,
        MetricLogger,
        restore_checkpoint,
    )
    from molecular_dynamics_neural_operator_tpu.utils.latent import (
        collect_latents,
        log_latent_visualization,
    )
    from molecular_dynamics_neural_operator_tpu.utils.movie import (
        make_propagation_movie,
        select_starting_points,
    )

    run_dir = Path(train_cfg.run_path)
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "config.json").write_text(
        configs.to_json(
            configs.ExperimentConfig(model=model_cfg, data=data_cfg, train=train_cfg)
        )
    )

    traj = load_trajectory(
        data_cfg.data_path,
        node_feature_dset_path=data_cfg.node_features_path,
        max_frames=args.max_frames,
    )
    dataset = WindowDataset(
        traj,
        window_size=model_cfg.window_size,
        horizon=data_cfg.horizon,
        threshold=data_cfg.threshold,
        graph_mode=model_cfg.graph_mode,
        max_edges=model_cfg.max_edges,
        edge_layout=args.edge_layout,
    )
    print(f"Created dataset: {len(dataset)} windows, "
          f"{traj.num_residues} residues")

    tr_idx, va_idx = train_valid_split(
        len(dataset), data_cfg.split_pct, data_cfg.split_method,
        seed=train_cfg.seed,
    )
    steps_per_epoch = max(1, len(tr_idx) // train_cfg.batch_size)
    state, tx, _ = create_train_state(
        jax.random.PRNGKey(train_cfg.seed), model_cfg, train_cfg,
        steps_per_epoch=steps_per_epoch,
    )

    start_epoch = 0
    if args.resume is not None:
        state, meta = restore_checkpoint(args.resume, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"Resumed from {args.resume} at epoch {start_epoch}")

    put = None
    data_parallel = args.data_parallel and len(jax.devices()) > 1
    if data_parallel:
        from molecular_dynamics_neural_operator_tpu.parallel.mesh import (
            data_parallel_put,
        )

        # shared divisibility guard; the sharded step factories build
        # their own put, so only the mesh/validation is reused here
        data_parallel_put(train_cfg.batch_size)
    if train_cfg.loss_space != "absolute" and train_cfg.rollout_steps == 0:
        # The teacher-forced steps implement only the reference LpLoss;
        # accepting the flag and training a different objective than the
        # logged config claims would be the silent-mismatch class the
        # curriculum K guard exists for.
        raise SystemExit(
            f"--loss_space {train_cfg.loss_space} requires the curriculum "
            f"path: pass --rollout_steps K >= 1 (K=1 is teacher-forced "
            f"with the delta normalizer)"
        )
    if train_cfg.rollout_steps > 0:
        from molecular_dynamics_neural_operator_tpu.train.curriculum import (
            make_curriculum_train_step,
        )

        coord_clip = args.coord_clip if args.coord_clip > 0 else None
        grad_steps = args.grad_steps if args.grad_steps > 0 else None
        if data_parallel:
            from molecular_dynamics_neural_operator_tpu.parallel import (
                make_sharded_curriculum_train_step,
            )

            mesh = make_mesh()
            train_step, put = make_sharded_curriculum_train_step(
                model_cfg, tx, mesh, rollout_steps=train_cfg.rollout_steps,
                threshold=data_cfg.threshold, coord_clip=coord_clip,
                loss_space=train_cfg.loss_space, grad_steps=grad_steps,
                noise_std=train_cfg.noise_std,
                burnin_dtype=args.burnin_dtype,
                unroll_scans=args.unroll_scans,
            )
            print(f"Data-parallel curriculum: batch sharded over "
                  f"{mesh.shape['data']} devices")
        else:
            train_step = make_curriculum_train_step(
                model_cfg, tx, rollout_steps=train_cfg.rollout_steps,
                threshold=data_cfg.threshold, coord_clip=coord_clip,
                loss_space=train_cfg.loss_space, grad_steps=grad_steps,
                noise_std=train_cfg.noise_std,
                burnin_dtype=args.burnin_dtype,
                unroll_scans=args.unroll_scans,
            )
        print(f"Curriculum training: K={train_cfg.rollout_steps} rollout "
              f"steps in the loss (grad_clip={train_cfg.grad_clip_norm}, "
              f"skip_nonfinite={train_cfg.skip_nonfinite_updates}, "
              f"coord_clip={coord_clip}, grad_steps="
              f"{grad_steps or train_cfg.rollout_steps}, "
              f"noise_std={train_cfg.noise_std})")
    elif data_parallel:
        mesh = make_mesh()
        train_step, put = make_sharded_train_step(
            model_cfg, tx, mesh, noise_std=train_cfg.noise_std)
    else:
        train_step = make_train_step(model_cfg, tx,
                                     noise_std=train_cfg.noise_std)
    eval_step = make_eval_step(model_cfg)
    print("Initialized model")

    logger = MetricLogger(run_dir, use_wandb=train_cfg.log_wandb,
                          config=vars(args))
    ckpt = BestCheckpointer(run_dir, resume=args.resume is not None)
    starting_points = select_starting_points(
        len(va_idx), model_cfg.window_size
    )
    if train_cfg.plot_latent and traj.rmsd is not None:
        # RMSD color dict artifact (graph_kernel.py:575-581 parity)
        import pickle

        n_lat = min(train_cfg.latent_frames, len(va_idx))
        color_dict = {
            "RMSD": np.asarray(traj.rmsd[va_idx[0] : va_idx[0] + n_lat])
        }
        (run_dir / "latent_color_dict.pkl").write_bytes(
            pickle.dumps(color_dict)
        )
    print("Started training")

    for epoch in range(start_epoch, train_cfg.epochs):
        t0 = time.time()
        profile_ctx = None
        if args.profile and epoch == start_epoch:
            from molecular_dynamics_neural_operator_tpu.utils.profiling import (
                trace,
            )

            profile_ctx = trace(str(run_dir / "trace"))
            profile_ctx.__enter__()
        state, train_m = train_epoch(
            state, train_step, dataset, tr_idx, train_cfg.batch_size,
            seed=train_cfg.seed, epoch=epoch, put=put,
            rollout_horizon=train_cfg.rollout_steps,
            prefetch=args.prefetch_factor,
        )
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
            print(f"profiler trace written to {run_dir / 'trace'}")
        valid_m = eval_epoch(
            state.params, eval_step, dataset, va_idx, train_cfg.batch_size,
        )
        extra = {
            "avg_train_mse": train_m["mse"],
            "avg_valid_mse": valid_m["mse"],
            "steps_per_sec": train_m["steps_per_sec"],
            "examples_per_sec": train_m["examples_per_sec"],
        }

        if (train_cfg.generate_movie and train_cfg.plot_per_epochs > 0
                and epoch % train_cfg.plot_per_epochs == 0):
            movie = make_propagation_movie(
                state.params, model_cfg, dataset, run_dir, epoch,
                [int(va_idx[0] + s) for s in starting_points],
                num_steps=train_cfg.num_movie_frames,
            )
            extra["movie"] = str(movie)
        if (train_cfg.plot_latent and train_cfg.plot_per_epochs > 0
                and epoch % train_cfg.plot_per_epochs == 0):
            n_lat = min(train_cfg.latent_frames, len(va_idx))
            latents = collect_latents(
                state.params, model_cfg, dataset, int(va_idx[0]), n_lat
            )
            colors = {}
            if traj.rmsd is not None:
                colors["RMSD"] = traj.rmsd[va_idx[0] : va_idx[0] + n_lat]
            for method in ("PCA", "TSNE") if n_lat > 16 else ("PCA",):
                paths = log_latent_visualization(
                    latents, colors, run_dir, epoch, method
                )
                extra.update({f"{method}_{k}": str(v) for k, v in paths.items()})

        logger.log_epoch(
            epoch, time.time() - t0, train_m["rel_l2"], valid_m["rel_l2"],
            extra,
        )
        ckpt.update(epoch, valid_m["rel_l2"], state)

    logger.close()
    return state


if __name__ == "__main__":
    main()
