"""Dataclass configuration for the whole framework.

One explicit config object per subsystem, replacing the reference's argparse
namespace that leaks into model code as a module global
(``/root/reference/graph_kernel.py:279-282,312-359``). CLI entry points map
flag names and defaults 1:1 onto these dataclasses for capability parity.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """GKN operator hyperparameters.

    Defaults mirror ``graph_kernel.py:314-344``: width 64, kernel_width 1024,
    depth 6, node_features 7, edge_features 6, 20 amino-acid embeddings of
    dim 4, 3-d coordinate output.
    """

    width: int = 64
    ker_width: int = 1024
    depth: int = 6
    edge_features: int = 6
    node_features: int = 7
    out_width: int = 3
    num_embeddings: int = 20
    embedding_dim: int = 4
    x_position_dim: int = 3
    window_size: int = 10
    num_residues: int = 28
    # Graph representation: "dense" = all-pairs masked adjacency (best on TPU
    # for small proteins: zero gather/scatter, everything is a matmul);
    # "sparse" = fixed-capacity padded edge lists (scales to ~10k atoms).
    graph_mode: str = "dense"
    max_edges: int = 384  # capacity for sparse mode (BBA has ~180 real edges)
    # True (reference parity): conv1 and conv2 share ONE edge-kernel MLP
    # (graph_kernel.py:271-273 passes the same DenseNet to both convs).
    tie_edge_kernel: bool = True
    # The OLDER reference KernelNN variant the analysis notebook loads
    # (bba_analysis.ipynb cell 8: Embedding + fc1 + a single weight-tied
    # NNConv_old stack + fc2, no LSTM — window_size=1 semantics, node
    # features = [emb ; last-frame coordinates]). Lets a scientist's old
    # best.pt run here (utils/torch_import.import_legacy_checkpoint).
    legacy_no_lstm: bool = False
    # bf16 matmuls with f32 accumulation on the MXU; params stay f32.
    compute_dtype: str = "bfloat16"
    # "pallas" fuses the weight-tied conv stack into one TPU kernel;
    # "xla" is the pure jnp path (also the CPU-test path).
    conv_impl: str = "xla"
    # Batched conv-stack implementation for training/eval forwards
    # (models/gkn.py::gkn_apply): "pallas" runs all 2*depth layers in one
    # kernel per example with the kernel tensor VMEM-resident — it is
    # otherwise re-read from HBM once per layer per pass, the training
    # step's bandwidth bound (ops/pallas/train_conv.py, fwd AND bwd).
    # "xla" is the portable default; requires tie_edge_kernel, sparse
    # graphs, and a real TPU.
    train_conv_impl: str = "xla"
    # Hand-written VJP for the weight-tied conv stack (ops/conv_stack.py):
    # forms the kernel-tensor gradient in ONE contraction over the layer
    # axis instead of 2*depth read-modify-write passes over a ~0.5 GB HBM
    # accumulator. Math-equal to autodiff (pinned in tests); applies to the
    # sparse one-hot path with tie_edge_kernel.
    fused_conv_vjp: bool = True
    # Rematerialize the edge-kernel MLP's hidden activations in the
    # backward pass instead of saving them ((B, E, ker_width) x 2 — ~260 MB
    # bf16 at B=128/E=256): trades ~0.4 ms of MXU recompute for that much
    # HBM residency/traffic. Training-only knob; no effect on inference.
    remat_edge_mlp: bool = False
    # Predict coordinate deltas (out = last_frame + head) instead of absolute
    # coordinates. Off by default for reference parity
    # (graph_kernel.py:305 predicts absolute positions); on, it keeps free
    # rollout numerically stable far longer.
    predict_delta: bool = False
    # Base forecast the predict_delta head corrects. "last" = copy-last
    # (out = head + x_t); "extrapolate" = GNS-style constant-velocity
    # prior (out = head + 2 x_t - x_{t-1}): a zero head equals linear
    # extrapolation instead of a frozen frame, so training starts from
    # the stronger baseline and the head learns the acceleration-scale
    # correction. Only read when predict_delta=True; needs window >= 2.
    predict_prior: str = "last"  # "last" | "extrapolate"
    # Damping on the extrapolate prior's implied velocity:
    # prior = x_t + prior_damping * (x_t - x_{t-1}). 1.0 is pure
    # constant-velocity; < 1 contracts toward copy-last, bounding the
    # compounding long-horizon drift the undamped prior shows at 10k-atom
    # scale (round-4: 9.2x copy-last at step 200 with edge overflow).
    # Only read when predict_prior="extrapolate".
    prior_damping: float = 1.0
    # fc2 head initialization. "zero" (GNS practice) zero-initializes the
    # head so the model's step-0 forecast IS its prior exactly — a
    # standard-init head injects ~O(width^-1/2) noise the absolute-
    # coordinate LpLoss barely penalizes at ~1e-4-relative displacement
    # scale, measured to leave extrapolate-prior models 8-177x WORSE than
    # bare extrapolation (round-4 prior gates). "default" keeps the
    # reference's uniform init (graph_kernel.py:275).
    head_init: str = "default"  # "default" | "zero"
    # GNS-style target normalization: the residual head's output is
    # multiplied by this scalar before being added to the prior
    # (out = prior + head_scale * head(latent)). The quantity the head
    # must learn — the correction beyond the prior — is ~1e-2 A on
    # MD-like data while Adam moves weights at O(lr) over O(1) latents,
    # so an unscaled head's output dynamics live orders above the
    # learning target and training parks at the prior (measured: the
    # Langevin K=1 phase sits at the init loss for 1400 steps). Set to
    # ~std(y - prior) of the training data (tools/accuracy_eval.py
    # --head_scale auto calibrates it). 1.0 = reference parity; only
    # read when predict_delta=True.
    head_scale: float = 1.0
    # Multiplier on the edge-kernel MLP's FINAL layer init (weights and
    # bias). The torch-default init overflows the f32 init forward at
    # depth 6 / 10k atoms (activations compound through 2*depth convs —
    # docs/PERFORMANCE.md "Config-5"); ~1/(2*depth) keeps the init
    # forward O(input scale) at any depth. 1.0 = reference parity.
    kernel_init_scale: float = 1.0
    # Encode the window as [last frame ; scaled frame-to-frame diffs]
    # instead of raw frames (same (T, R, 3) shape — no parameter change).
    # Raw frames make the LSTM extract per-step motion as a ~1e-4-relative
    # difference of large coordinates, so optimization parks at the
    # copy-last-frame baseline; velocity-form input makes the dynamics a
    # first-class feature. Off by default for reference parity
    # (graph_kernel.py:283-288 feeds raw window frames).
    window_diff: bool = False
    window_diff_scale: float = 100.0
    # On-device neighbor rebuild during rollout (sparse mode):
    # "dense_rank" ranks the full (R, R) adjacency — exact, best to ~1k
    # nodes; "cell_list" is the O(N) spatial-hash path for large systems
    # (geometry/cells.py). max_edges must equal num_residues * max_degree
    # for the cell-list layout.
    neighbor_impl: str = "dense_rank"
    max_degree: int = 32
    # Sparse aggregation strategy for training/eval forwards: "auto" picks
    # one-hot incidence matmuls up to SCATTER_ONEHOT_MAX_NODES then
    # segment_sum; "blocked" requires edge lists in the cell-list block
    # layout (WindowDataset edge_layout="blocked" / geometry/cells.py) and
    # replaces the scatter with a dense per-node reduction — the large-R
    # training win. "onehot"/"segment" force those modes.
    scatter_mode: str = "auto"
    # Serving-side kernel-tensor quantization: "int8" stores the per-edge
    # (w, w) kernel matrices as int8 with a per-edge scale folded into the
    # message mask. Batched/multi-stream rollout is HBM-bound on re-reading
    # this tensor once per conv layer (docs/PERFORMANCE.md serving cap);
    # int8 halves that traffic vs bf16. Sparse XLA path only; accuracy is
    # a measured trade (tools/quant_serving_bench.py) — keep "none" for
    # training and quality headlines.
    kernel_quant: str = "none"  # "none" | "int8"
    cell_capacity: int = 16
    num_cells: int = 4096
    # Electrostatic node features (BASELINE config 5): "dh" appends the
    # on-device Debye-Hueckel potential at each atom (computed from the
    # window's last frame, so it follows predicted coordinates during
    # rollout) as an extra node feature. fc1's input widens by one
    # internally; node_features stays the 7 base features.
    electrostatics: str = "none"  # "none" | "dh"
    eps_solvent: float = 78.0
    temperature: float = 310.0
    ionic_strength: float = 0.15


@dataclass(frozen=True)
class FNOConfig:
    """FNO spectral-conv variant on distance-matrix trajectories.

    (BASELINE.json config 2 — no reference implementation exists; this is a
    new TPU-native operator family on the XLA FFT path.)
    """

    width: int = 32
    modes1: int = 12
    modes2: int = 12
    depth: int = 4
    in_channels: int = 10  # window of distance matrices as channels
    out_channels: int = 1
    num_residues: int = 28
    compute_dtype: str = "float32"  # FFT path stays f32
    # "dft" evaluates the truncated spectral transforms as small dense
    # matmuls (exact; 3x+ faster than the Bluestein FFT at protein sizes);
    # "fft" rides jnp.fft; "auto" picks dft for grids up to 128.
    spectral_impl: str = "auto"
    # Predict the distance-matrix CHANGE (out = last input channel + head)
    # instead of the absolute matrix — the FNO analogue of the GKN's
    # predict_delta. The per-step displacement is ~1e-4 relative, so an
    # absolute head must reconstruct the full matrix to beat copy-last
    # (measured: 553x copy-last step-1 MSE without it).
    predict_delta: bool = False
    # Base forecast for the residual head, as ModelConfig.predict_prior:
    # "last" = copy-last channel; "extrapolate" = constant-velocity on
    # distance matrices (2 D_t - D_{t-1}) — a zero head equals linear
    # extrapolation, attacking the copy-last attractor the trained FNO
    # plateaued at (tools/fno_accuracy_results_delta*.json). Needs
    # in_channels >= 2.
    predict_prior: str = "last"  # "last" | "extrapolate"
    # Damping on the extrapolate prior (ModelConfig.prior_damping
    # semantics): prior = D_t + prior_damping * (D_t - D_{t-1}).
    prior_damping: float = 1.0
    # "zero" zero-initializes the proj2 head (ModelConfig.head_init
    # semantics): the step-0 forecast is exactly the prior.
    head_init: str = "default"  # "default" | "zero"
    # GNS-style target normalization: the residual head's output is
    # multiplied by this scalar before being added to the prior
    # (out = prior + head_scale * head(latent)). The quantity the head
    # must learn — the correction beyond the prior — is ~1e-2 A on
    # MD-like data while Adam moves weights at O(lr) over O(1) latents,
    # so an unscaled head's output dynamics live orders above the
    # learning target and training parks at the prior (measured: the
    # Langevin K=1 phase sits at the init loss for 1400 steps). Set to
    # ~std(y - prior) of the training data (tools/accuracy_eval.py
    # --head_scale auto calibrates it). 1.0 = reference parity; only
    # read when predict_delta=True.
    head_scale: float = 1.0


@dataclass(frozen=True)
class DataConfig:
    """Trajectory dataset parameters (``dataset.py:56-105`` parity)."""

    data_path: str = ""
    node_features_path: Optional[str] = None
    edge_index_dset_name: str = "contact_map"
    edge_attr_dset_name: str = "point_cloud"
    node_feature_dset_name: str = "amino_acids"
    window_size: int = 10
    horizon: int = 1
    threshold: float = 8.0  # contact threshold in Angstrom
    split_pct: float = 0.8
    split_method: str = "partition"  # or "random"
    # Build graphs from stored contact maps (reference training semantics)
    # or recompute from coordinates on device (reference rollout semantics).
    use_stored_contact_maps: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop parameters (``graph_kernel.py:314-344`` defaults)."""

    seed: int = 0
    epochs: int = 200
    batch_size: int = 128
    lr: float = 0.01
    weight_decay: float = 5e-4
    scheduler_step: int = 50
    scheduler_gamma: float = 0.8
    grad_clip_norm: float = 0.0  # >0 enables global-norm gradient clipping
    skip_nonfinite_updates: bool = False  # reject NaN/inf update steps
    # Average this many micro-batch gradients per optimizer apply
    # (optax.MultiSteps). Batch diversity when device memory forces a
    # small per-step batch — e.g. 10k-atom systems where the (E, w, w)
    # kernel tensor caps B at 1. 1 disables (reference behavior).
    grad_accum: int = 1
    drop_last: bool = True
    shuffle: bool = True
    # Curriculum: number of free-rollout steps mixed into the loss
    # (0 = pure teacher forcing, reference behavior).
    rollout_steps: int = 0
    rollout_loss_weight: float = 1.0
    # "absolute" = reference LpLoss on coordinates; "delta" normalizes each
    # step by the true per-step displacement so learning the MOTION is the
    # unit-scale objective (see train/curriculum.py) — required for the
    # model to beat the copy-last-frame baseline in bf16.
    loss_space: str = "absolute"
    # GNS-style random-walk input-noise std (train/noise.py); the last
    # window frame is corrupted by N(0, noise_std^2) accumulated over the
    # window while the target stays clean. 0 disables (reference behavior).
    noise_std: float = 0.0
    run_path: str = "runs/default"
    checkpoint_every: int = 1
    generate_movie: bool = True
    num_movie_frames: int = 5
    plot_latent: bool = True
    plot_per_epochs: int = 1
    latent_frames: int = 10000
    log_wandb: bool = False
    wandb_project: str = "bba_gno"


@dataclass(frozen=True)
class RolloutConfig:
    """Autoregressive rollout (``graph_kernel.py:396-413`` parity)."""

    num_steps: int = 1000
    threshold: float = 8.0
    # Which window frame the rebuilt graph comes from. The reference uses the
    # LAST frame during rollout (graph_kernel.py:363) but the FIRST frame in
    # the training dataset (dataset.py:189,197) — a latent inconsistency we
    # surface as config.
    graph_frame: str = "last"
    collect: str = "coords"  # "coords" | "contact_maps" | "both"


@dataclass(frozen=True)
class MeshConfig:
    """TPU mesh layout for pjit/shard_map."""

    data: int = 1   # batch-axis data parallelism (ICI)
    model: int = 1  # edge/feature-axis model parallelism for large systems
    axis_names: Tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    fno: FNOConfig = field(default_factory=FNOConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    rollout: RolloutConfig = field(default_factory=RolloutConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def _from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in names:
            continue
        sub = _CONFIG_TYPES.get(k)
        if sub is not None and isinstance(v, dict):
            kwargs[k] = _from_dict(sub, v)
        else:
            kwargs[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


_CONFIG_TYPES = {
    "model": ModelConfig,
    "fno": FNOConfig,
    "data": DataConfig,
    "train": TrainConfig,
    "rollout": RolloutConfig,
    "mesh": MeshConfig,
}


def experiment_from_json(s: str) -> ExperimentConfig:
    return _from_dict(ExperimentConfig, json.loads(s))
