#!/bin/bash
# Round-4 stability soak (VERDICT r3 #6): rerun the joint arm across seeds
# to show the exp-overflow NaN class is FIXED, not dodged. Runs at the
# calibration scale (8 cams, 6k iters — the same physics as meso at 40% of
# the cost per arm) with the NaN guard armed; any non-finite state aborts
# the arm with rc=2 and the driver fails loudly.
set -u
cd /root/repo

CAL="--size 128 --n_cams 8 --n_sub 21 --iters 6000 \
  --blur_scale 0.7 --gt_oversample 3 --max_pairs $((1<<21)) \
  --tile 32 --layout mixed --capacity_mult 12 --batched --curve_end_frac 0.67 \
  --pose_refine_iters 150"

FAIL=0
for seed in 1 2 3; do
  out="runs/r4_soak_s${seed}.json"
  if [ -f "$out" ]; then echo "seed $seed: already done"; continue; fi
  echo "=== soak seed $seed"
  timeout 5000 python scripts/validate_blur_recovery.py $CAL \
    --seed "$seed" --report "$out" > "runs/r4_soak_s${seed}.log" 2>&1
  rc=$?
  if [ ! -f "$out" ]; then
    echo "SOAK seed $seed: NO REPORT (rc=$rc)"; FAIL=1; continue
  fi
  python - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
nan_at = d.get("nan_at")
ok = nan_at is None and d.get("sharp_psnr") is not None \
    and d.get("overflow_steps") == 0
print(f"  finite={nan_at is None} overflow={d.get('overflow_steps')} "
      f"sharp={d.get('sharp_psnr')} mid={d.get('sharp_psnr_midcam')} "
      f"refined={d.get('sharp_psnr_pose_refined')}")
sys.exit(0 if ok else 1)
EOF
  [ $? -ne 0 ] && FAIL=1
done
if [ $FAIL -eq 0 ]; then
  echo "SOAK DONE: all seeds finite, overflow-free"
else
  echo "SOAK FAILED: see logs"; exit 1
fi
