#!/usr/bin/env bash
# Finalize the run of record: run the post-training analysis pass against the
# final best checkpoint, then collect committed evidence (runs/ is gitignored)
# into tools/record_r3/.
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=runs/record_r3
DST=tools/record_r3

PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORM_NAME=cpu \
python examples/bba_analysis.py \
  --data_path runs/synth_1FME_64k.h5 --run_path "$SRC" \
  --out "$SRC/analysis" --num_steps 1000

mkdir -p "$DST"
cp "$SRC"/train.log "$SRC"/metrics.jsonl "$SRC"/config.json \
   "$SRC"/best.npz.json "$SRC"/last.npz.json "$DST"/
cp "$SRC"/best.npz "$DST"/best.npz
cp "$SRC"/analysis/loss_curves.png "$SRC"/analysis/loss_table.json \
   "$SRC"/analysis/per_step_mse.png "$SRC"/analysis/summary.json "$DST"/
# One representative periodic artifact per family (full set stays in runs/).
cp "$SRC"/epoch200_gno_movie.gif "$DST"/ 2>/dev/null || \
  cp "$SRC"/epoch180_gno_movie.gif "$DST"/ 2>/dev/null || true
# numeric sort: plain globbing would pick epoch80 over epoch180
LAST_PCA=$(ls "$SRC"/latent_PCA_RMSD_epoch*.png 2>/dev/null | sort -V | tail -1)
[ -n "$LAST_PCA" ] && cp "$LAST_PCA" "$DST"/
ls -la "$DST"
