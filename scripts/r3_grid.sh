#!/bin/bash
# Round-3 capability grid: observable blur (~11 px sweep at 96²), honest
# continuous-exposure GT (3x oversample), gauge-fair eval (learned-mid +
# pose-refined), densify ON (sharp ceiling is capacity-clamped without it —
# runs/r3_cpu_oracle.json). One run at a time — the chip must not be shared.
set -u
cd /root/repo

COMMON="--size 96 --n_cams 8 --n_sub 9 --iters 4000 \
  --blur_scale 0.5 --gt_oversample 3 --pose_refine_iters 200"

run() {
  name=$1; shift
  if [ -f "runs/r3_${name}.json" ]; then echo "skip ${name}"; return; fi
  echo "=== ${name}: $*"
  timeout 5400 python scripts/validate_blur_recovery.py $COMMON \
    --report "runs/r3_${name}.json" "$@" > "runs/r3_${name}.log" 2>&1
  grep -E "FINAL|VALID" "runs/r3_${name}.log" | tail -2 || true
}

run g_oracle    --init_true_curves --curve_end_frac 0.0
run g_nocurve   --no_curve
run g_batch     --cams_per_step 8
run g_joint
run g_truthinit --init_true_curves
run g_batch_jit --cams_per_step 8 --random_sample
echo ALL DONE
