"""Fourier Neural Operator on C-alpha distance-matrix trajectories.

Second operator family (BASELINE.json config 2): the protein state is the
(R, R) pairwise-distance matrix; a window of them forms the input channels
and the operator predicts the next distance matrix. Spectral convolutions
ride the XLA FFT path (``jnp.fft.rfft2`` / ``irfft2``), keeping all FLOPs in
batched complex matmuls — there is no reference implementation of this
model (the reference is GKN-only); it is a new TPU-native capability over
the same data (``dataset.py`` point clouds -> distance matrices).

Standard FNO-2d layout: pointwise lift -> ``depth`` x (spectral conv on the
lowest modes1 x modes2 modes + pointwise linear bypass, GELU) -> two-layer
projection head. Complex spectral weights are stored as separate real/imag
f32 leaves so checkpoints stay plain-numpy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
from molecular_dynamics_neural_operator_tpu.ops import linear_apply, linear_init

Array = jax.Array


class FNOBatch(NamedTuple):
    """x: (B, R, R, C_in) input channels (window of distance matrices);
    y: (B, R, R, C_out) target (next distance matrix)."""

    x: Array
    y: Array


def _spectral_init(key, width: int, modes1: int, modes2: int):
    scale = 1.0 / (width * width)
    kr, ki = jax.random.split(key)
    shape = (width, width, modes1, modes2)
    return {
        "w_real": scale * jax.random.normal(kr, shape, jnp.float32),
        "w_imag": scale * jax.random.normal(ki, shape, jnp.float32),
    }


def fno_init(key, cfg: FNOConfig):
    # Retained-mode capacity check up front: modes1 is a row-axis slice
    # (must fit the full R rows) and modes2 indexes the half-spectrum
    # (R//2 + 1 rfft columns). Without this the mismatch surfaces as an
    # opaque einsum label error deep inside the first forward.
    half = cfg.num_residues // 2 + 1
    if cfg.modes1 > cfg.num_residues or cfg.modes2 > half:
        raise ValueError(
            f"FNO retained modes ({cfg.modes1}, {cfg.modes2}) exceed the "
            f"{cfg.num_residues}-point grid's spectrum "
            f"({cfg.num_residues} rows x {half} rfft columns); shrink "
            "modes1/modes2 for this num_residues"
        )
    if (getattr(cfg, "predict_delta", False)
            and getattr(cfg, "predict_prior", "last") == "extrapolate"
            and cfg.in_channels < 2):
        # mirror residual_prior's window_size guard (models/gkn.py): with
        # one input channel the x[..., -2:-1] slice below would be empty
        # and fail as an obscure broadcast error deep in the forward.
        raise ValueError(
            "predict_prior='extrapolate' needs in_channels >= 2 (two "
            f"distance-matrix frames), got in_channels={cfg.in_channels}"
        )
    keys = jax.random.split(key, cfg.depth * 2 + 3)
    params = {
        "lift": linear_init(keys[0], cfg.in_channels, cfg.width),
        "proj1": linear_init(keys[1], cfg.width, 128),
        "proj2": linear_init(keys[2], 128, cfg.out_channels),
    }
    for d in range(cfg.depth):
        params[f"spectral_{d}"] = _spectral_init(
            keys[3 + 2 * d], cfg.width, cfg.modes1, cfg.modes2
        )
        params[f"pointwise_{d}"] = linear_init(
            keys[4 + 2 * d], cfg.width, cfg.width
        )
    hi = getattr(cfg, "head_init", "default")
    if hi == "zero":
        # GNS-style residual-head init (ModelConfig.head_init semantics):
        # the step-0 forecast is exactly the prior.
        params["proj2"] = jax.tree.map(jnp.zeros_like, params["proj2"])
    elif hi != "default":
        raise ValueError(f"unknown head_init: {hi!r}")
    return params


@functools.lru_cache(maxsize=8)
def _dft_mats(r1: int, r2: int, m1: int, m2: int):
    """Truncated-DFT matrices for the matmul spectral path (numpy,
    converted at use site — module-level jnp constants leak tracers).

    F1 (2*m1, R1): forward row transform restricted to the retained row
    frequencies [0..m1) and [-m1..0) — exactly the blocks ``rfft2``'s
    output that `_spectral_conv` keeps. F2 (m2, R2): forward column
    transform for frequencies [0..m2). B1 (R1, 2*m1): inverse row
    transform (includes the 1/R1 of ``ifft``). B2 (R2, m2): inverse
    column transform with the rfft Hermitian doubling (s_g = 2 for g > 0,
    except g = 0 and — when m2 reaches R2//2 + 1 on an even grid — the
    Nyquist bin, which are their own conjugate partners) and 1/R2.
    """
    import numpy as np

    freqs1 = np.concatenate([np.arange(m1), np.arange(r1 - m1, r1)])
    n1 = np.arange(r1)
    f1 = np.exp(-2j * np.pi * freqs1[:, None] * n1[None, :] / r1)
    b1 = np.exp(+2j * np.pi * n1[:, None] * freqs1[None, :] / r1) / r1
    g2 = np.arange(m2)
    n2 = np.arange(r2)
    f2 = np.exp(-2j * np.pi * g2[:, None] * n2[None, :] / r2)
    # Hermitian doubling for the rfft half-spectrum; g = 0 and the
    # Nyquist bin (even R2, g = R2/2) are their own conjugate partners.
    scale = np.where((g2 > 0) & ~((r2 % 2 == 0) & (g2 == r2 // 2)),
                     2.0, 1.0)
    b2 = (np.exp(+2j * np.pi * n2[:, None] * g2[None, :] / r2)
          * scale[None, :] / r2)
    c64 = np.complex64
    return f1.astype(c64), f2.astype(c64), b1.astype(c64), b2.astype(c64)


def _spectral_conv(sp_params, x: Array, modes1: int, modes2: int,
                   impl: str = "auto") -> Array:
    """x: (..., R, R, width) -> same shape; multiply the lowest Fourier
    modes by per-mode (width, width) complex matrices.

    impl: "fft" rides ``jnp.fft.rfft2``/``irfft2``; "dft" evaluates the
    truncated transforms as small dense matmuls — mathematically
    identical (the retained modes ARE the DFT coefficients), and much
    faster on TPU for protein-sized grids where a 28-point FFT takes the
    Bluestein path and the mode scatter dominates (measured 3x+ on the
    rollout). "auto" picks "dft" for grids up to 128."""
    r1, r2, width = x.shape[-3], x.shape[-2], x.shape[-1]
    w = sp_params["w_real"] + 1j * sp_params["w_imag"]  # (w, w, m1, m2)
    m1, m2 = modes1, modes2
    # When the retained row blocks overlap (2*m1 > R1) or m2 exceeds the
    # rfft half-spectrum, the two paths are NOT equivalent: the FFT path's
    # .at[].set overwrites the overlap while the DFT path would sum it.
    # Such configs are degenerate (modes exceeding the grid) — keep the
    # FFT path's behavior and never auto-route them to dft.
    overlapping = 2 * m1 > r1 or m2 > r2 // 2 + 1
    if impl not in ("auto", "dft", "fft"):
        # the FFT code is the fall-through below; a typo must not silently
        # benchmark the 3x-slower path as if it were 'dft'
        raise ValueError(f"unknown spectral impl: {impl!r}")
    if impl == "auto":
        impl = "dft" if max(r1, r2) <= 128 and not overlapping else "fft"
    if impl == "dft" and overlapping:
        raise ValueError(
            f"spectral_impl='dft' requires 2*modes1 <= {r1} and modes2 <= "
            f"{r2 // 2 + 1} (got modes=({m1}, {m2})); use 'fft' or fewer "
            "modes"
        )

    if impl == "dft":
        f1, f2, b1, b2 = (jnp.asarray(a) for a in
                          _dft_mats(r1, r2, m1, m2))
        xc = x.astype(jnp.complex64)
        # rows then cols: (..., 2*m1, m2, width) == [lo ; hi] stacked
        xf = jnp.einsum("fr,...rcw->...fcw", f1, xc)
        xf = jnp.einsum("gc,...fcw->...fgw", f2, xf)
        y_lo = jnp.einsum("...xyi,ioxy->...xyo", xf[..., :m1, :, :], w)
        y_hi = jnp.einsum("...xyi,ioxy->...xyo", xf[..., m1:, :, :],
                          jnp.conj(w))
        y = jnp.concatenate([y_lo, y_hi], axis=-3)
        z = jnp.einsum("rf,...fgw->...rgw", b1, y)
        return jnp.real(jnp.einsum("cg,...rgw->...rcw", b2, z))

    # FFT over the two spatial axes (channels last).
    xf = jnp.fft.rfft2(x, axes=(-3, -2))  # (..., R, R//2+1, width) complex

    lo = xf[..., :m1, :m2, :]  # low-frequency block (+m1 rows)
    hi = xf[..., -m1:, :m2, :]  # conjugate-side rows (-m1 rows)
    out_lo = jnp.einsum("...xyi,ioxy->...xyo", lo, w)
    out_hi = jnp.einsum("...xyi,ioxy->...xyo", hi, jnp.conj(w))

    out_f = jnp.zeros(xf.shape, xf.dtype)
    out_f = out_f.at[..., :m1, :m2, :].set(out_lo)
    out_f = out_f.at[..., -m1:, :m2, :].set(out_hi)
    return jnp.fft.irfft2(out_f, s=(r1, r2), axes=(-3, -2))


def fno_apply(params, cfg: FNOConfig, x: Array, return_latent: bool = False):
    """x: (..., R, R, C_in) -> (..., R, R, C_out)."""
    impl = getattr(cfg, "spectral_impl", "auto")
    h = linear_apply(params["lift"], x)
    for d in range(cfg.depth):
        s = _spectral_conv(params[f"spectral_{d}"], h, cfg.modes1,
                           cfg.modes2, impl=impl)
        p = linear_apply(params[f"pointwise_{d}"], h)
        h = jax.nn.gelu(s + p)
    latent = h
    h = jax.nn.gelu(linear_apply(params["proj1"], h))
    out = linear_apply(params["proj2"], h)
    if getattr(cfg, "predict_delta", False):
        # Residual head: the last input channel is the most recent
        # distance matrix, so the network only has to model the ~1e-4
        # relative per-step change (broadcasts over out_channels).
        # head_scale = GNS target normalization (configs.FNOConfig).
        out = out * float(getattr(cfg, "head_scale", 1.0))
        prior = getattr(cfg, "predict_prior", "last")
        if prior == "last":
            out = out + x[..., -1:]
        elif prior == "extrapolate":
            if x.shape[-1] < 2:
                raise ValueError(
                    "predict_prior='extrapolate' needs >= 2 input "
                    f"channels, got x with {x.shape[-1]}"
                )
            # damped constant-velocity prior on distance matrices
            # (residual_prior semantics, models/gkn.py): gamma = 1 is pure
            # extrapolation, gamma = 0 copy-last.
            gamma = getattr(cfg, "prior_damping", 1.0)
            out = out + x[..., -1:] + gamma * (x[..., -1:] - x[..., -2:-1])
        else:
            raise ValueError(f"unknown predict_prior: {prior!r}")
    if return_latent:
        return out, latent
    return out


def distance_matrix_channels(positions: Array) -> Array:
    """(T, R, 3) coordinate window -> (R, R, T) distance-matrix channels."""
    diff = positions[:, :, None, :] - positions[:, None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    return jnp.moveaxis(d, 0, -1)


def sym_zero_diag(p: Array) -> Array:
    """Project a (..., R, R) prediction onto the distance-matrix manifold
    (symmetric, zero diagonal) — the feedback stabilization shared by the
    rollout scan and the training curriculum."""
    p = 0.5 * (p + jnp.swapaxes(p, -1, -2))
    r = p.shape[-1]
    return p * (1.0 - jnp.eye(r, dtype=p.dtype))


def fno_rollout_scan(params, cfg: FNOConfig, channels0: Array,
                     num_steps: int):
    """Autoregressive distance-matrix rollout: predict the next matrix,
    slide the channel window — one jitted scan, mirroring the GKN rollout
    semantics (rollout/scan.py) on the FNO state representation."""

    def body(channels, _):
        pred = fno_apply(params, cfg, channels)  # (R, R, 1)
        p = sym_zero_diag(pred[..., 0])
        new_channels = jnp.concatenate(
            [channels[..., 1:], p[..., None]], axis=-1
        )
        return new_channels, p

    final, preds = jax.lax.scan(body, channels0, None, length=num_steps)
    return preds, final


def window_batch_to_fno(batch: dict) -> "FNOBatch":
    """Adapt a coordinate WindowDataset batch to FNO distance channels.

    window (B, T, R, 3) -> x (B, R, R, T); y (B, R, 3) -> (B, R, R, 1).
    Runs on device inside the jitted step.
    """
    x = jax.vmap(distance_matrix_channels)(batch["window"])
    y = jax.vmap(distance_matrix_channels)(batch["y"][:, None])
    return FNOBatch(x=x, y=y)


def make_fno_window_train_step(cfg: FNOConfig, tx):
    """Jitted (state, window-batch dict) -> (state, metrics): featurize to
    distance matrices on device inside the same compiled step."""
    from molecular_dynamics_neural_operator_tpu.models.losses import lp_rel, mse
    from molecular_dynamics_neural_operator_tpu.train.state import (
        TrainState,
        apply_update,
    )

    def loss_fn(params, fb: FNOBatch):
        out = fno_apply(params, cfg, fb.x)
        b = out.shape[0]
        return lp_rel(out.reshape(b, -1), fb.y.reshape(b, -1),
                      size_average=False), mse(out, fb.y)

    @jax.jit
    def step(state: TrainState, batch: dict):
        fb = window_batch_to_fno(batch)
        (l2, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, fb
        )
        return apply_update(state, grads, tx), {
            "rel_l2": l2, "mse": m,
        }

    return step


def make_fno_window_eval_step(cfg: FNOConfig):
    from molecular_dynamics_neural_operator_tpu.models.losses import lp_rel, mse

    @jax.jit
    def step(params, batch: dict):
        fb = window_batch_to_fno(batch)
        out = fno_apply(params, cfg, fb.x)
        b = out.shape[0]
        return {
            "rel_l2": lp_rel(out.reshape(b, -1), fb.y.reshape(b, -1),
                             size_average=False),
            "mse": mse(out, fb.y),
        }

    return step


def make_fno_train_step(cfg: FNOConfig, tx):
    from molecular_dynamics_neural_operator_tpu.models.losses import lp_rel, mse
    from molecular_dynamics_neural_operator_tpu.train.state import (
        TrainState,
        apply_update,
    )

    def loss_fn(params, batch: FNOBatch):
        out = fno_apply(params, cfg, batch.x)
        b = out.shape[0]
        return lp_rel(
            out.reshape(b, -1), batch.y.reshape(b, -1), size_average=False
        ), mse(out, batch.y)

    @jax.jit
    def step(state: TrainState, batch: FNOBatch):
        (l2, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return apply_update(state, grads, tx), {
            "rel_l2": l2, "mse": m,
        }

    return step


def make_fno_curriculum_train_step(cfg: FNOConfig, tx,
                                   rollout_steps: int,
                                   step_weights=None):
    """K-step rollout curriculum for the FNO family — the same
    exposure-gap closure as the GKN's ``train/curriculum.py`` on the
    distance-matrix state: step 1 predicts from the true window, steps
    2..K feed the model its own (symmetrized, zero-diagonal) predictions.
    The host batch must carry ``y_seq`` (B, K, R, 3) coordinates
    (``WindowDataset.get_batch(..., rollout_horizon=K)``); distance
    targets are computed on device. K=1 reduces to the teacher-forced
    objective."""
    from molecular_dynamics_neural_operator_tpu.train.state import (
        TrainState,
        apply_update,
    )

    def _rel(pred: Array, truth: Array) -> Array:
        """Per-example relative L2 on (B, R, R) matrices -> (B,)."""
        num = jnp.sqrt(jnp.sum((pred - truth) ** 2, axis=(1, 2)))
        return num / jnp.sqrt(jnp.sum(truth ** 2, axis=(1, 2)))

    def loss_fn(params, batch: dict):
        channels = jax.vmap(distance_matrix_channels)(batch["window"])
        y_seq = batch["y_seq"]  # (B, K, R, 3) coordinates
        k = y_seq.shape[1]
        if k != rollout_steps:
            raise ValueError(
                f"batch carries y_seq with K={k} but the step was built "
                f"for rollout_steps={rollout_steps} (assemble batches "
                "with rollout_horizon=rollout_steps)"
            )
        # (B, K, R, R) distance targets via the shared featurizer
        dm_seq = jnp.moveaxis(
            jax.vmap(distance_matrix_channels)(y_seq), -1, 1
        )
        weights = (
            jnp.asarray(step_weights, jnp.float32)
            if step_weights is not None
            else jnp.ones((k,), jnp.float32)
        )
        weights = weights / jnp.sum(weights)

        def predict(ch):
            return fno_apply(params, cfg, ch)[..., 0]

        # loss on the RAW prediction (teacher semantics, K=1 == the
        # teacher-forced step exactly); the symmetric/zero-diagonal
        # projection applies only to the FED-BACK matrix, mirroring the
        # rollout's stabilization (fno_rollout_scan).
        p = predict(channels)
        loss_vec = weights[0] * _rel(p, dm_seq[:, 0])
        sq = jnp.sum((p - dm_seq[:, 0]) ** 2, axis=(1, 2))
        if k > 1:
            channels = jnp.concatenate(
                [channels[..., 1:], sym_zero_diag(p)[..., None]], axis=-1
            )

            def body(carry, inputs):
                channels, loss_vec, sq = carry
                y_t, w = inputs
                p = predict(channels)
                loss_vec = loss_vec + w * _rel(p, y_t)
                sq = sq + jnp.sum((p - y_t) ** 2, axis=(1, 2))
                channels = jnp.concatenate(
                    [channels[..., 1:], sym_zero_diag(p)[..., None]], axis=-1
                )
                return (channels, loss_vec, sq), None

            dm_steps = jnp.swapaxes(dm_seq, 0, 1)  # (K, B, R, R)
            (channels, loss_vec, sq), _ = jax.lax.scan(
                body, (channels, loss_vec, sq), (dm_steps[1:], weights[1:])
            )
        r = dm_seq.shape[-1]
        return jnp.sum(loss_vec), jnp.mean(sq / (k * r * r))

    @jax.jit
    def step(state: TrainState, batch: dict):
        (l2, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return apply_update(state, grads, tx), {
            "rel_l2": l2, "mse": m,
        }

    return step
