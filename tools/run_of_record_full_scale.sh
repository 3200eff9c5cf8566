#!/bin/bash
# Run of record at FULL reference scale (1,114,545 frames — the real 1FME
# dataset size, bba_analysis.ipynb cells 9-10) through the production CLI.
#
# Two phases through the SAME run directory, exercising --resume across a
# recipe change exactly as a practitioner would:
#   phase 1: epochs 0-3   teacher-forced (the reference objective,
#            graph_kernel.py:445-474) at the flagship TPU config
#   phase 2: epochs 4-9   K=4 rollout-curriculum fine-tune (--resume from
#            the phase-1 checkpoint; optimizer/LR state carries over, so
#            grad_clip/skip_nonfinite are pinned identical in both phases)
#
# Usage: bash tools/run_of_record_full_scale.sh [run_dir] [data]
set -e
cd "$(dirname "$0")/.."
RUN=${1:-runs/record_full_scale}
DATA=${2:-runs/synth_1FME_full.h5}

COMMON="--data_path $DATA --run_path $RUN --seed 0 --batch_size 128
  --lr 3e-4 --weight_decay 1e-6 --scheduler_step 4 --scheduler_gamma 0.8
  --graph_mode sparse --max_edges 224 --predict_delta
  --compute_dtype bfloat16 --train_conv_impl pallas
  --grad_clip_norm 0.5 --skip_nonfinite --coord_clip 1000
  --plot_per_epochs 2 --latent_frames 10000"

echo "=== phase 1: teacher-forced epochs 0-3 ==="
python -m molecular_dynamics_neural_operator_tpu.cli.train \
  $COMMON --epochs 4 --rollout_steps 0

echo "=== phase 2: K=4 curriculum epochs 4-9 (resume) ==="
python -m molecular_dynamics_neural_operator_tpu.cli.train \
  $COMMON --epochs 10 --rollout_steps 4 --resume "$RUN/last.npz"

echo "=== analysis: 1000-step free rollout from the trained run ==="
python examples/bba_analysis.py --data_path "$DATA" --run_path "$RUN" \
  --out "$RUN/analysis" --num_steps 1000
