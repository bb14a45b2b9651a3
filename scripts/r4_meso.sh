#!/bin/bash
# Round-4 meso validation (VERDICT r3 spec): 128², 16 cams, f=21, 20k iters,
# densify on, continuous-exposure GT, gauge-fair eval with EQUAL pose-
# refinement budget on every arm.
#
# Arms:
#   M0  nocurve  — sharp 3DGS trained against blurry GT (baseline)
#   MO  oracle   — curves FROZEN AT TRUTH (ceiling; makes the +3 dB gate's
#                  satisfiability measurable: requires oracle - nocurve >= 3)
#   M1  joint    — from noisy init (THE capability)
#
# Honest driver contract (VERDICT r3 weak #2/#5): every arm's exit code and
# report existence are checked; any crash or missing report exits non-zero
# naming the arm. "MESO DONE" prints only when all arms completed.
set -u
cd /root/repo

# scene physics from calibration v2 (scripts/r4_cal2.sh): ~2.6 px splats
# (resolvable texture) against a ~21 px sweep — cal v1's 0.035 true_scale
# put the texture at the Nyquist limit and the oracle matched the no-curve
# floor exactly (runs/r4_cal_*.json)
MESO="--size 128 --n_cams 16 --n_sub 21 --iters 20000 \
  --blur_scale 0.8 --true_scale 0.10 --gt_oversample 3 \
  --max_pairs $((1<<21)) \
  --tile 32 --layout mixed --capacity_mult 12 --ckpt_every 1000"
REFINE="--pose_refine_iters 300"

run_arm () {  # name extra-args...
  local name=$1; shift
  echo "=== $name"
  timeout 14000 python scripts/validate_blur_recovery.py $MESO "$@" \
    --report "runs/r4_meso_${name}.json" \
    > "runs/r4_meso_${name}.log" 2>&1
  local rc=$?
  grep -E "FINAL|criteria|VALID|!! non-finite" "runs/r4_meso_${name}.log" | tail -4
  if [ ! -f "runs/r4_meso_${name}.json" ]; then
    echo "ARM $name FAILED: no report written (rc=$rc)"; exit 3
  fi
  if [ "$rc" -eq 2 ]; then
    echo "ARM $name ABORTED on non-finite state (rc=2) — see its log"; exit 2
  fi
  # rc=1 is the per-arm quality gate (informational for M0/MO)
  return 0
}

if [ ! -f runs/r4_meso_nocurve.json ]; then
  run_arm nocurve --no_curve $REFINE
fi
if [ ! -f runs/r4_meso_oracle.json ]; then
  run_arm oracle --batched --init_true_curves --curve_lr_mult 0 --init_noise 0 \
    --curve_start 1 $REFINE
fi

BASE=$(python - <<'EOF'
import json
d = json.load(open('runs/r4_meso_nocurve.json'))
vals = [d.get("sharp_psnr"), d.get("sharp_psnr_midcam"),
        d.get("sharp_psnr_pose_refined")]
print(round(max(v for v in vals if v is not None), 2))
EOF
)
ORACLE=$(python - <<'EOF'
import json
d = json.load(open('runs/r4_meso_oracle.json'))
vals = [d.get("sharp_psnr"), d.get("sharp_psnr_midcam"),
        d.get("sharp_psnr_pose_refined")]
print(round(max(v for v in vals if v is not None), 2))
EOF
)
SEP=$(python -c "print(round($ORACLE - $BASE, 2))")
echo "baseline sharp = $BASE; oracle sharp = $ORACLE; separation = $SEP dB"
GATE_OK=$(python -c "print(1 if $SEP >= 3.0 else 0)")
if [ "$GATE_OK" != "1" ]; then
  echo "GATE UNSATISFIABLE: oracle-nocurve separation $SEP < 3 dB — the"
  echo "scene cannot measure a +3 dB joint win; redesign (stronger blur /"
  echo "finer texture / more capacity) before running the joint arm."
  exit 4
fi

if [ ! -f runs/r4_meso_joint.json ]; then
  run_arm joint --batched --curve_end_frac 0.67 $REFINE \
    --baseline_sharp "$BASE" --save_state runs/r4_meso_state.npz
  JRC=$?
fi
python - <<'EOF'
import json, sys
j = json.load(open('runs/r4_meso_joint.json'))
b = json.load(open('runs/r4_meso_nocurve.json'))
best = max(v for v in [j.get("sharp_psnr"), j.get("sharp_psnr_midcam"),
                       j.get("sharp_psnr_pose_refined")] if v is not None)
base = max(v for v in [b.get("sharp_psnr"), b.get("sharp_psnr_midcam"),
                       b.get("sharp_psnr_pose_refined")] if v is not None)
print(f"JOINT best {best:.2f} vs baseline {base:.2f} (+{best-base:.2f} dB); "
      f"nan_at={j.get('nan_at')}; overflow={j.get('overflow_steps')}")
ok = j.get("nan_at") is None and best >= base + 3.0 and \
    (j["traj_err_aligned"] or 9e9) <= (j["traj_err_aligned_init"] or 0)
sys.exit(0 if ok else 5)
EOF
RC=$?
[ $RC -eq 0 ] && echo "MESO DONE (all arms complete, joint PASSED)" || \
  echo "MESO COMPLETE BUT JOINT GATE NOT MET (rc=$RC)"
exit $RC
