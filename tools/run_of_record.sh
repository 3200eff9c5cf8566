#!/usr/bin/env bash
# Run-of-record recipe (VERDICT r2 item 6): a 200-epoch training campaign with
# StepLR decay, per-epoch movie/latent artifacts, a mid-run kill + --resume, and
# loss curves parsed by examples/bba_analysis.py — mirroring the reference's
# 200-epoch BBA run (/root/reference/graph_kernel.py:583-639, bba_analysis.ipynb
# cells 35-38).
#
# Committed artifacts land in tools/record_r3/ (runs/ is gitignored):
#   train.log, metrics.jsonl, config.json, best.npz.json lineage, loss_curves.png
set -euo pipefail
cd "$(dirname "$0")/.."

# 1) Real-schema synthetic BBA trajectory (streamed writer, ~13 s for 64k frames).
python - <<'PY'
from molecular_dynamics_neural_operator_tpu.data.synthetic import write_synthetic_h5_streamed
import json
info = write_synthetic_h5_streamed("runs/synth_1FME_64k.h5", num_frames=64_000,
                                   num_residues=28, seed=0)
print(json.dumps(info))
PY

# 2) 200-epoch campaign, flagship sparse bf16 recipe, StepLR(50, 0.8),
#    movie+latents every 20 epochs. 16k frames keeps the full campaign ~45 min
#    on one v5e; drop --max_frames for the 64k variant (~2.2 h).
RUN=runs/record_r3
mkdir -p "$RUN"
train() {
  python -m molecular_dynamics_neural_operator_tpu.cli.train \
    --data_path runs/synth_1FME_64k.h5 --run_path "$RUN" \
    --max_frames 16000 --epochs 200 --batch_size 128 --lr 1e-3 \
    --weight_decay 5e-4 --scheduler_step 50 --scheduler_gamma 0.8 \
    --graph_mode sparse --max_edges 224 --compute_dtype bfloat16 \
    --predict_delta --plot_per_epochs 20 --latent_frames 1000 "$@"
}
train || true              # (in the recorded run: killed mid-run at ~epoch 60)

# 3) Resume from the last checkpoint and run to completion.
train --resume "$RUN/last.npz"

# 4) Full analysis pass on the trained run: 1000-step free rollout, per-step
#    MSE, propagation movie, backbone render, and loss-curve parsing of
#    train.log (notebook cells 35-38 analogue).
python examples/bba_analysis.py --data_path runs/synth_1FME_64k.h5 \
  --run_path "$RUN" --out "$RUN/analysis" --num_steps 1000
