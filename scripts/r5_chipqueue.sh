#!/bin/bash
# Round-5 continuation chip queue: validate the restructured kernel on the
# real chip, capture the A/B, then run the cal3b calibration arms.
set -u
cd /root/repo
{
  echo "=== [1/3] bench.py (parity gate + headline, restructured exact)"
  timeout 1800 python bench.py 2>&1 | tail -3
  echo "=== [2/3] A/B restructured exact (m32x1 fwd / m32x2 fwd+bwd)"
  timeout 1200 python scripts/bench_variants.py --variants m32x1 --iters 20 2>&1 | grep -vE "^WARNING"
  timeout 1200 python scripts/bench_variants.py --variants m32x2 --iters 12 --bwd 2>&1 | grep -vE "^WARNING"
  echo "=== [2b] restructured fast"
  timeout 1200 python scripts/bench_variants.py --variants m32x1 --iters 20 --fast 2>&1 | grep -vE "^WARNING"
  timeout 1200 python scripts/bench_variants.py --variants m32x2 --iters 12 --bwd --fast 2>&1 | grep -vE "^WARNING"
} 2>&1 | tee runs/r5_ab2.log
echo "=== [3/3] cal3b arms"
bash scripts/r5_cal3b.sh 2>&1 | tee runs/r5_cal3b_driver.log
echo "CHIPQUEUE DONE rc=$?"
