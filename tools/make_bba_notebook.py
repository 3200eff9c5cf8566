"""Build + execute ``examples/bba_analysis.ipynb`` (VERDICT r3 item 8).

The reference ships an interactive notebook (``bba_analysis.ipynb``,
cells 0-38); the repo's equivalent was a script. This tool authors a thin
notebook over the same library functions the script uses, executes it
top-to-bottom on synthetic data + the committed run-of-record checkpoint
(``tools/record_r3/``), and writes it WITH outputs so a scientist can
open and poke at it.

    python tools/make_bba_notebook.py [--skip-execute]

Runs on the CPU backend (the notebook itself pins it, so opening it on
any box works without the TPU tunnel).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse

import nbformat
from nbformat.v4 import new_code_cell, new_markdown_cell, new_notebook

REPO = _Path(__file__).resolve().parent.parent


def _md(s):
    return new_markdown_cell(s.strip())


def _code(s):
    return new_code_cell(s.strip())


CELLS = [
    _md("""
# BBA (1FME) analysis — TPU-native GKN

Interactive twin of the reference's `bba_analysis.ipynb` (cells 0-38),
running the same flow on this framework: load a trained checkpoint →
long free rollout → per-step MSE vs ground truth → forecast-vs-real
contact maps → 3-D backbone → training-log parsing.

Runs top-to-bottom on **synthetic** BBA-schema data (no lab files in this
environment) and the committed **run-of-record** checkpoint
(`tools/record_r3/`, 200 epochs, best at epoch 185). Heavier lifting
lives in the library; every cell here is a thin call you can edit.
"""),
    # --- reference cell 0: imports ------------------------------------
    _code("""
# Imports + backend. CPU is forced so the notebook runs anywhere
# (the training box pins JAX_PLATFORMS to a TPU tunnel).
import os
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
from pathlib import Path

import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
import matplotlib.pyplot as plt  # ipykernel's inline backend renders figures

# repo root: works from examples/ (the notebook's home) or the root
ROOT = Path.cwd()
while not (ROOT / "molecular_dynamics_neural_operator_tpu").is_dir():
    assert ROOT.parent != ROOT, "run from inside the repo"
    ROOT = ROOT.parent
import sys
sys.path.insert(0, str(ROOT))
print("backend:", jax.devices()[0].platform, "| root:", ROOT)
"""),
    # --- reference cells 3-8: config + model + checkpoint -------------
    _md("""
## Model + checkpoint (reference cells 3-8)

The reference rebuilds its model from an argparse `Namespace` literal and
`torch.load`s `best.pt`. Here the run directory's `config.json` is the
single source of truth (shapes cannot drift from the trained weights),
and the checkpoint is a params-subtree restore from `best.npz`.
"""),
    _code("""
from molecular_dynamics_neural_operator_tpu.configs import experiment_from_json
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.utils.checkpoint import restore_subtree

RUN = ROOT / "tools" / "record_r3"
cfg = experiment_from_json((RUN / "config.json").read_text()).model
params, meta = restore_subtree(
    RUN / "best.npz", gkn_init(jax.random.PRNGKey(0), cfg), ".params")
print(f"GKN width={cfg.width} ker_width={cfg.ker_width} depth={cfg.depth} "
      f"window={cfg.window_size} predict_delta={cfg.predict_delta} "
      f"dtype={cfg.compute_dtype}")
print("checkpoint epoch:", meta.get("epoch"))
"""),
    # --- reference cells 9-16: data ------------------------------------
    _md("""
## Trajectory data (reference cells 9-16)

The reference loads `1FME-0.h5` (1,114,545 frames of 28-residue contact
maps). We synthesize a shorter trajectory in the same HDF5 schema with
the run of record's generator settings — `dt` is matched to the 64k-frame
training file so per-frame displacement statistics are identical.
"""),
    _code("""
from molecular_dynamics_neural_operator_tpu.data import (
    WindowDataset, load_trajectory, write_synthetic_h5_streamed)

DATA = ROOT / "runs" / "notebook" / "synth_1FME_4k.h5"
DATA.parent.mkdir(parents=True, exist_ok=True)
if not DATA.exists():
    info = write_synthetic_h5_streamed(
        DATA, num_frames=4_000, num_residues=28, seed=0,
        dt=2 * np.pi / 63_999)  # the record's 64k-frame grid spacing
    print(info)
traj = load_trajectory(DATA)
print(f"{traj.num_frames} frames, {traj.num_residues} residues, "
      f"rmsd={'yes' if traj.rmsd is not None else 'no'}")
"""),
    # --- reference cell 32: item shapes --------------------------------
    _code("""
# Dataset item shapes (reference cell 32 prints
# x_aminoacid=[28], x_position=[28,3], y=[28,3], edge_attr=[180,6],
# edge_index=[2,180]). Graphs here are padded to static max_edges with a
# validity mask — the shape XLA compiles once.
ds = WindowDataset(traj, window_size=cfg.window_size, graph_mode="sparse",
                   max_edges=cfg.max_edges)
b = ds.get_batch([0])
for k, v in b.items():
    print(f"{k:8s} {tuple(np.asarray(v).shape)}")
print("real edges in frame 0:", int(b["mask"][0].sum()))
"""),
    # --- reference cells 19-23: rollout + MSE ---------------------------
    _md("""
## 1,000-step free rollout (reference cells 19-23)

The reference's `propogate` loop crosses host↔device twice per step and
rebuilds the graph in scipy — 80.56 steps/s on its lab GPU. Here the
whole rollout (featurize → forward → window slide, 8 Å rebuild each
step) is ONE jitted `lax.scan`; the same call reports per-step MSE vs
ground truth. (On the TPU chip the persistent Pallas kernel serves this
at ~30k steps/s; this notebook runs the portable XLA scan on CPU.)
"""),
    _code("""
from molecular_dynamics_neural_operator_tpu.rollout import rollout_with_mse
import time

NUM_STEPS = 1000
aa = jnp.asarray(traj.aminoacids)
window0 = jnp.asarray(traj.positions[:cfg.window_size])
lo = cfg.window_size
truth = jnp.asarray(traj.positions[lo:lo + NUM_STEPS])

roll = jax.jit(lambda p, a, w, t: rollout_with_mse(p, cfg, a, w, t))
t0 = time.time(); coords, mses, _ = roll(params, aa, window0, truth)
coords, mses = np.asarray(coords), np.asarray(mses)
dt_s = time.time() - t0
print(f"{NUM_STEPS} steps in {dt_s:.1f}s ({NUM_STEPS/dt_s:,.0f} steps/s "
      f"incl. compile, CPU backend)")
print(f"finite steps: {int(np.isfinite(coords).all(axis=(1,2)).sum())}")
print(f"MSE step 1: {mses[0]:.3e}  step 100: {mses[99]:.3e}  "
      f"step 1000: {mses[-1]:.3e}")
"""),
    _code("""
# Per-step MSE with the copy-last-frame baseline (the honesty bar the
# reference never plots: a frozen frame scores well on slow MD data).
from molecular_dynamics_neural_operator_tpu.rollout.baseline import (
    copy_last_baseline)

base_mse, base_acc = copy_last_baseline(window0[-1], truth, 8.0)
fig, ax = plt.subplots(figsize=(7, 4))
ax.plot(mses, label="GKN free rollout")
ax.plot(np.asarray(base_mse), "--", label="copy-last baseline")
ax.set_xlabel("rollout step"); ax.set_ylabel("coordinate MSE")
ax.set_yscale("log"); ax.legend(); ax.set_title("per-step rollout MSE")
fig.tight_layout()
fig.savefig(ROOT / "runs" / "notebook" / "per_step_mse.png", dpi=120)
plt.show()
"""),
    # --- reference cells 24-27: contact maps ---------------------------
    _md("""
## Forecast vs real contact maps (reference cells 24-27)
"""),
    _code("""
from molecular_dynamics_neural_operator_tpu.geometry import contact_map

STEPS_SHOWN = [0, 99, 499, 999]
fig, axes = plt.subplots(2, len(STEPS_SHOWN), figsize=(3 * len(STEPS_SHOWN), 6))
for col, s in enumerate(STEPS_SHOWN):
    fc = np.asarray(contact_map(jnp.asarray(coords[s])))
    real = np.asarray(contact_map(jnp.asarray(traj.positions[lo + s])))
    axes[0, col].imshow(fc, cmap="Greys"); axes[0, col].set_title(f"forecast t+{s+1}")
    axes[1, col].imshow(real, cmap="Greys"); axes[1, col].set_title(f"real t+{s+1}")
    agree = float((fc == real).mean())
    axes[1, col].set_xlabel(f"agreement {agree:.1%}")
for ax in axes.ravel():
    ax.set_xticks([]); ax.set_yticks([])
fig.tight_layout(); plt.show()
"""),
    _code("""
# Animated GIF over the first 20 steps (the reference stitches PNGs into
# an mp4 via imageio, graph_kernel.py:440-443).
from molecular_dynamics_neural_operator_tpu.utils.movie import (
    render_propagation_movie)

k = 20
fc = [np.asarray(contact_map(jnp.asarray(coords[i]))) for i in range(k)]
real = [np.asarray(contact_map(jnp.asarray(traj.positions[lo + i])))
        for i in range(k)]
movie = render_propagation_movie(ROOT / "runs" / "notebook", 0, fc, real)
print("movie:", movie)
"""),
    # --- reference cell 31: backbone -----------------------------------
    _md("""
## 3-D backbone (reference cell 31)

The reference renders a plotly 3-D trace of the Cα backbone; this uses
the library's plotly-free matplotlib renderer.
"""),
    _code("""
from molecular_dynamics_neural_operator_tpu.utils.backbone import (
    render_backbone_trajectory)

bb = render_backbone_trajectory(
    ROOT / "runs" / "notebook",
    [coords[i] for i in range(8)],
    [traj.positions[lo + i] for i in range(8)])
print({k: str(v) for k, v in bb.items()})
"""),
    # --- reference cells 35-38: loss-log parsing ------------------------
    _md("""
## Training-log parsing (reference cells 35-38)

The trainer prints `Epoch:\\tTime:\\ttrain_loss:\\tvalid_loss:` lines in
the reference's exact format; `parse_loss_log` turns the run of record's
200-epoch `train.log` back into a table.
"""),
    _code("""
from molecular_dynamics_neural_operator_tpu.utils.metrics import parse_loss_log

# the movie/backbone helpers switch matplotlib to Agg; restore inline
import matplotlib
matplotlib.use("module://matplotlib_inline.backend_inline", force=True)

rows = parse_loss_log((RUN / "train.log").read_text())
print(f"{len(rows)} epoch lines; last: {rows[-1]}")
fig, ax = plt.subplots(figsize=(7, 4))
ax.plot([r["epoch"] for r in rows], [r["train_loss"] for r in rows],
        label="train")
ax.plot([r["epoch"] for r in rows], [r["valid_loss"] for r in rows],
        label="valid")
ax.set_xlabel("epoch"); ax.set_ylabel("rel-L2 loss"); ax.set_yscale("log")
ax.legend(); ax.set_title("run of record (200 epochs, StepLR(50, 0.8))")
fig.tight_layout(); plt.show()
"""),
    _md("""
---
**Where to go next**: `cli.rollout --impl persistent` for the 30k-steps/s
on-chip kernel, `cli.serve` for the continuous-batching rollout server,
`tools/accuracy_eval.py` for the train-and-gate harness, and
`docs/PERFORMANCE.md` for the measured anatomy of every hot path.
"""),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-execute", action="store_true")
    p.add_argument("--out", type=_Path,
                   default=REPO / "examples" / "bba_analysis.ipynb")
    p.add_argument("--timeout", type=int, default=1800)
    args = p.parse_args()

    nb = new_notebook(
        cells=list(CELLS),
        metadata={
            "kernelspec": {"name": "python3", "display_name": "Python 3",
                           "language": "python"},
            "language_info": {"name": "python"},
        },
    )
    if not args.skip_execute:
        from nbconvert.preprocessors import ExecutePreprocessor

        ep = ExecutePreprocessor(timeout=args.timeout, kernel_name="python3")
        ep.preprocess(nb, {"metadata": {"path": str(REPO / "examples")}})
    nbformat.write(nb, args.out)
    n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
    print(f"wrote {args.out} ({len(nb.cells)} cells, {n_out} outputs)")


if __name__ == "__main__":
    main()
