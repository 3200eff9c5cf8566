"""Latent-space visualization (PCA / t-SNE colored by RMSD).

Parity with the reference's per-epoch latent sweep
(``/root/reference/graph_kernel.py:575-613``): collect the pre-head latent
vectors for a span of frames, save them as ``.npy``, and render 2-D PCA and
t-SNE embeddings colored by per-frame RMSD. Two TPU-native upgrades:

- the latent sweep is **batched and jitted** (the reference runs 10,000
  single-example forwards in a Python loop, ``graph_kernel.py:595-601``),
- PCA is a plain numpy SVD; t-SNE uses scikit-learn when available
  (``mdlearn`` is not a dependency).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def collect_latents(params, cfg, dataset, start_frame: int, num_frames: int,
                    batch_size: int = 256):
    """Batched latent sweep over ``[start_frame, start_frame + num_frames)``.

    Returns (num_frames, R * width) latents flattened per frame, matching
    the reference's ``latent.flatten()`` layout (graph_kernel.py:599).
    """
    import jax

    from molecular_dynamics_neural_operator_tpu.models import gkn_apply
    from molecular_dynamics_neural_operator_tpu.train.loop import featurize_batch

    @jax.jit
    def latent_step(params, batch):
        gbatch = featurize_batch(cfg, batch)
        _, latent = gkn_apply(params, cfg, gbatch, return_latent=True)
        return latent

    outs = []
    end = min(start_frame + num_frames, len(dataset))
    for lo in range(start_frame, end, batch_size):
        idx = np.arange(lo, min(lo + batch_size, end))
        batch = dataset.get_batch(idx)
        latent = latent_step(params, batch)
        outs.append(np.asarray(latent).reshape(len(idx), -1))
    return np.concatenate(outs, axis=0)


def pca_embed(latents: np.ndarray, dim: int = 2) -> np.ndarray:
    """2-D PCA via numpy SVD (no sklearn dependency)."""
    x = latents - latents.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:dim].T


def degenerate_latents_reason(latents: np.ndarray) -> Optional[str]:
    """Why these latents cannot be meaningfully embedded, or None if fine.

    Non-finite or zero-variance latents (an early/diverged model) must be
    caught BEFORE the embedding math: ``np.linalg.svd`` raises on NaN, and
    sklearn's Barnes-Hut t-SNE normalizes its init by a std that is 0/NaN
    for degenerate input, feeding NaN coordinates into the C quad tree —
    which recurses until it overflows the stack and SEGFAULTS the whole
    training process (observed on the 1.1M-frame run of record). A plot
    helper is never allowed to take down a training run.
    """
    if not np.isfinite(latents).all():
        return "non-finite values"
    # Variance must exist ACROSS FRAMES: a collapsed model that emits the
    # same non-constant vector for every frame has nonzero global ptp but
    # zero per-feature spread — PCA then yields all-zero columns and
    # t-SNE's init-normalization still divides by 0.
    if float(np.ptp(latents, axis=0).max()) == 0.0:
        return "zero variance (all frames identical)"
    return None


def tsne_embed(latents: np.ndarray, dim: int = 2,
               perplexity: float = 30.0) -> Optional[np.ndarray]:
    reason = degenerate_latents_reason(latents)
    if reason is not None:
        print(f"WARNING: skipping t-SNE embedding: latents have {reason}",
              flush=True)
        return None
    try:
        from sklearn.manifold import TSNE
    except Exception:
        return None
    per = min(perplexity, max(2.0, (len(latents) - 1) / 3.0))
    return TSNE(n_components=dim, perplexity=per, init="pca").fit_transform(
        latents
    )


def log_latent_visualization(
    latents: np.ndarray,
    colors: dict,
    run_dir,
    epoch: int,
    method: str = "PCA",
):
    """Save latents + a colored scatter per color key. Returns
    {color_key: png_path} like the reference's mdlearn helper returns HTML
    paths (graph_kernel.py:609-613)."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    np.save(run_dir / f"latent_space_epoch{epoch}.npy", latents)

    reason = degenerate_latents_reason(latents)
    if reason is not None:
        # latents are still saved above for post-mortem; only the
        # embedding/scatter is skipped (see degenerate_latents_reason).
        print(f"WARNING: skipping {method} latent plot at epoch {epoch}: "
              f"latents have {reason}", flush=True)
        return {}
    emb = pca_embed(latents) if method.upper() == "PCA" else tsne_embed(latents)
    if emb is None:
        return {}
    out = {}
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        for key in colors:
            path = run_dir / f"latent_{method}_{key}_epoch{epoch}.npy"
            np.save(path, emb)
            out[key] = path
        return out

    for key, vals in colors.items():
        vals = np.asarray(vals)[: len(emb)]
        fig, ax = plt.subplots(figsize=(6, 5))
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=vals, s=4, cmap="viridis")
        fig.colorbar(sc, ax=ax, label=key)
        ax.set_title(f"{method} latent space, epoch {epoch}")
        path = run_dir / f"latent_{method}_{key}_epoch{epoch}.png"
        fig.savefig(path, dpi=150)
        plt.close(fig)
        out[key] = path
    html = write_latent_html(run_dir, epoch, method, out)
    if html is not None:
        out["html"] = html
    return out


def write_latent_html(run_dir, epoch: int, method: str, png_paths: dict):
    """Standalone HTML page embedding the latent scatter PNGs (base64).

    The reference logs mdlearn-generated HTML latent plots to wandb every
    epoch (``graph_kernel.py:609-621``); this is the dependency-free
    equivalent artifact (consumed by ``MetricLogger`` as ``wandb.Html``).
    """
    import base64

    run_dir = Path(run_dir)
    imgs = []
    for key, path in png_paths.items():
        p = Path(path)
        if p.suffix != ".png" or not p.exists():
            continue
        b64 = base64.b64encode(p.read_bytes()).decode("ascii")
        imgs.append(
            f"<figure><img src='data:image/png;base64,{b64}' "
            f"alt='{key}'/><figcaption>{key}</figcaption></figure>"
        )
    if not imgs:
        return None
    html_path = run_dir / f"latent_{method}_epoch{epoch}.html"
    html_path.write_text(
        "<html><head><title>"
        f"{method} latent space, epoch {epoch}</title></head>"
        "<body>" + "".join(imgs) + "</body></html>"
    )
    return html_path
