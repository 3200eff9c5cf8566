"""Checkpoint save/restore for arbitrary pytrees.

The reference saves ``{epoch, model, optimizer, scheduler}`` to ``best.pt``
when validation improves (``/root/reference/graph_kernel.py:631-639``) and
has no mid-run resume. Here save/restore is symmetric over the full
``TrainState`` (params, optimizer state, step counter, PRNG key), so a run
can resume exactly (SURVEY.md section 5).

Format: a single ``.npz`` with flattened keypath names + a JSON sidecar
holding the treedef and metadata — dependency-free, portable, and readable
by plain numpy. An orbax-based alternative is unnecessary for these sizes
(the flagship model is ~9 M params).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path, tree, metadata: Optional[dict] = None) -> None:
    """Write ``tree`` to ``path`` (.npz) with a ``path``.json sidecar."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten_with_paths(tree)
    np.savez(path, **flat)
    treedef = jax.tree_util.tree_structure(tree)
    side = {
        "keys": list(flat.keys()),
        "treedef": str(treedef),
        "metadata": metadata or {},
    }
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(side, indent=2))


def restore_checkpoint(path, like) -> Tuple[Any, dict]:
    """Restore into the structure of ``like`` (a template pytree with the
    same treedef, e.g. a freshly-initialized TrainState). Returns
    (tree, metadata)."""
    path = Path(path)
    data = np.load(path if path.suffix == ".npz" else path.with_suffix(".npz"))
    side = json.loads(path.with_suffix(path.suffix + ".json").read_text())
    flat_like = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat_like[0]:
        key = "/".join(str(getattr(x, "key", getattr(x, "idx", x))) for x in p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if hasattr(leaf, "dtype") and arr.dtype != leaf.dtype:
            arr = arr.astype(leaf.dtype)
        leaves.append(arr)
    tree = jax.tree_util.tree_unflatten(flat_like[1], leaves)
    return tree, side.get("metadata", {})


def restore_subtree(path, like, prefix: str) -> Tuple[Any, dict]:
    """Restore only the leaves stored under ``prefix`` into the template
    ``like`` (the matching subtree).

    Lets consumers that need just the parameters (e.g. the rollout CLI)
    load a checkpoint WITHOUT reconstructing the exact optimizer chain the
    run used — a full-TrainState restore fails with a treedef mismatch when
    the training recipe (grad clipping, apply_if_finite, ...) differs from
    the template's (the reference has the same coupling: its ``best.pt``
    bundles optimizer + scheduler state, ``graph_kernel.py:631-639``, and
    the notebook loads only ``model_state_dict``, cell 7).

    Example: ``restore_subtree(path, gkn_init(...), ".params")``.
    """
    path = Path(path)
    data = np.load(path if path.suffix == ".npz" else path.with_suffix(".npz"))
    side_path = path.with_suffix(path.suffix + ".json")
    side = json.loads(side_path.read_text()) if side_path.exists() else {}
    flat_like = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat_like[0]:
        bare = "/".join(str(getattr(x, "key", getattr(x, "idx", x)))
                        for x in p)
        key = f"{prefix}/{bare}" if bare else prefix
        if key not in data:
            # params-only checkpoints (e.g. tools/bench_ckpt.npz, written
            # by jnp.savez of the bare params pytree) store unprefixed
            # keys; accept both formats so every consumer reads every
            # checkpoint family.
            if bare and bare in data:
                key = bare
            else:
                raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            # name the mismatched leaf: an opaque dot-shape error deep in
            # jit is useless (e.g. a dh-trained fc1 (8, w) restored into a
            # (7, w) template because --electrostatics was not passed)
            raise ValueError(
                f"checkpoint leaf {key} has shape {tuple(arr.shape)} but "
                f"the template expects {tuple(leaf.shape)} — model config "
                "mismatch (width/depth/electrostatics flags must match "
                "training)"
            )
        if hasattr(leaf, "dtype") and arr.dtype != leaf.dtype:
            arr = arr.astype(leaf.dtype)
        leaves.append(arr)
    tree = jax.tree_util.tree_unflatten(flat_like[1], leaves)
    return tree, side.get("metadata", {})


class BestCheckpointer:
    """Tracks best validation loss and writes ``best.npz`` on improvement
    (reference behavior) plus optional periodic ``last.npz`` for resume."""

    def __init__(self, run_dir, save_last_every: int = 1,
                 resume: bool = False):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.best_loss = float("inf")
        self.save_last_every = max(1, save_last_every)
        # With ``resume=True``, seed best_loss from an existing best.npz
        # so a worse-than-historic-best epoch after the restart cannot
        # overwrite the run's true best checkpoint. Gated on an explicit
        # resume signal: a FRESH run reusing a run_dir (e.g. after fixing
        # a misconfigured first attempt) must treat the stale best.npz as
        # beatable, or the new run's weights might never be written and
        # the (overwritten) config.json would silently pair with the old
        # run's checkpoint.
        if resume:
            side = self.run_dir / "best.npz.json"
            if side.exists():
                try:
                    meta = json.loads(side.read_text()).get("metadata", {})
                    self.best_loss = float(
                        meta.get("valid_loss", float("inf"))
                    )
                except (ValueError, OSError):
                    pass

    def update(self, epoch: int, valid_loss: float, state) -> bool:
        """Returns True if this epoch was the new best."""
        improved = valid_loss < self.best_loss
        meta = {"epoch": epoch, "valid_loss": float(valid_loss)}
        if improved:
            self.best_loss = float(valid_loss)
            save_checkpoint(self.run_dir / "best.npz", state, meta)
        if epoch % self.save_last_every == 0:
            save_checkpoint(self.run_dir / "last.npz", state, meta)
        return improved
