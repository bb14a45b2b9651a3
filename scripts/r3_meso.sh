#!/bin/bash
# Round-3 meso validation (VERDICT spec: 128², 16 cams, f=21, 20k iters,
# densify on, continuous-exposure GT) with the gauge-fair eval protocol.
# M0 re-baselines no-curve under THIS round's exact conditions; M1 is the
# joint run gated on M0's number. Runs strictly one at a time on the chip.
set -u
cd /root/repo

MESO="--size 128 --n_cams 16 --n_sub 21 --iters 20000 \
  --blur_scale 0.5 --gt_oversample 3 --max_pairs $((1<<21)) \
  --tile 32 --layout mixed"

if [ ! -f runs/r3_meso_nocurve.json ]; then
  echo "=== M0 nocurve baseline"
  timeout 7200 python scripts/validate_blur_recovery.py $MESO --no_curve \
    --report runs/r3_meso_nocurve.json > runs/r3_meso_nocurve.log 2>&1
  grep -E "FINAL|VALID" runs/r3_meso_nocurve.log | tail -2
fi

BASE=$(python -c "import json;print(round(json.load(open('runs/r3_meso_nocurve.json'))['sharp_psnr'],2))")
echo "baseline sharp = $BASE"

# short smoke of the exact joint configuration (batched render compiles?)
if [ ! -f runs/r3_meso_smoke.json ]; then
  echo "=== M1 smoke (60 iters)"
  timeout 3000 python scripts/validate_blur_recovery.py $MESO --batched \
    --iters 60 --curve_start 10 --pose_refine_iters 0 \
    --report runs/r3_meso_smoke.json > runs/r3_meso_smoke.log 2>&1
  # validate exits 1 on its QUALITY gate — the smoke only checks that the
  # batched config compiles, runs and reports
  [ -f runs/r3_meso_smoke.json ] || { echo "SMOKE FAILED"; exit 1; }
  grep -E "FINAL" runs/r3_meso_smoke.log | tail -1
fi

echo "=== M1 joint"
timeout 14000 python scripts/validate_blur_recovery.py $MESO --batched \
  --curve_end_frac 0.67 --pose_refine_iters 300 --clip_grad 1.0 \
  --baseline_sharp "$BASE" --save_state runs/r3_meso_state.npz \
  --report runs/r3_meso_joint.json > runs/r3_meso_joint.log 2>&1
grep -E "FINAL|criteria|VALID" runs/r3_meso_joint.log | tail -3
echo MESO DONE
