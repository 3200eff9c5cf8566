#!/bin/bash
# bf16-at-speed quality grid (VERDICT r3 item 2).
#
# Question: can a bf16-body recipe beat the copy-last baseline (the f32
# round-3 recipe's 0.22x/0.29x/0.83x step-1/10/100 MSE ratios are the
# target), or which component reintroduces the ~1e-4-relative
# displacement cancellation?
#
# All runs share the round-3 recipe (lr 1e-3, StepLR(20, 0.7), 6000
# steps, K=4 after 25% warmup, grad_steps recipe-default j=1) and vary
# only the mixed-precision levers: window_diff (velocity-form input),
# window_diff_scale, GNS input noise. predict_delta is always on (the
# accuracy_eval harness default).
set -u
cd "$(dirname "$0")/.."
OUT=tools/bf16_grid
mkdir -p "$OUT"
CACHE=/tmp/bf16_grid_xla_cache
BASE="--steps 6000 --lr 1e-3 --scheduler_step 20 --scheduler_gamma 0.7 \
      --compilation_cache $CACHE"

run() {
  name=$1; shift
  if [ -s "$OUT/$name.json" ]; then echo "== $name: exists, skip"; return; fi
  echo "== $name: $* ($(date +%H:%M:%S))"
  python tools/accuracy_eval.py $BASE "$@" --out "$OUT/$name.json" \
    > "$OUT/$name.log" 2>&1
  echo "   rc=$? ($(date +%H:%M:%S))"
}

run bf16_ctl        --dtype bfloat16
run bf16_wd         --dtype bfloat16 --window_diff
run bf16_wd_n1e3    --dtype bfloat16 --window_diff --noise_std 1e-3
run bf16_n1e3       --dtype bfloat16 --noise_std 1e-3
run bf16_wd_s1000   --dtype bfloat16 --window_diff --window_diff_scale 1000
run f32_wd          --dtype float32  --window_diff
echo "grid done ($(date +%H:%M:%S))"
