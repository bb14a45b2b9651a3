#!/bin/bash
# Isolated noisy-init MOTION RECOVERY (the capability no round had yet
# demonstrated, VERDICT r3: "No run anywhere in three rounds starts from
# noisy curves and demonstrably recovers motion"). --freeze_scene trains
# ONLY the camera curves against the TRUE scene: curves start at the
# static nominal poses (no sweep knowledge, init_noise 1e-3) and must
# grow the full ~21 px trajectory from photometric gradients through the
# rasterizer's camera-matrix cotangents. PASS = final trajectory error
# < 0.6x the init error (the harness's freeze_scene gate).
set -u
cd /root/repo

timeout 4000 python scripts/validate_blur_recovery.py --freeze_scene \
  --batched --size 128 --n_cams 8 --n_sub 21 --iters 3000 \
  --blur_scale 0.8 --true_scale 0.10 --gt_oversample 3 \
  --max_pairs $((1<<21)) --tile 32 --layout mixed --curve_start 1 \
  --report runs/r5_motion_recovery.json \
  > runs/r5_motion_recovery.log 2>&1
rc=$?
grep -E "floor|FINAL|VALID" runs/r5_motion_recovery.log | tail -3
if [ ! -f runs/r5_motion_recovery.json ]; then
  echo "MOTION ARM FAILED: no report (rc=$rc)"; exit 3
fi
exit $rc
