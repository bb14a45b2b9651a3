#!/bin/bash
# Round-5 final kernel A/B on the restructured exact kernel (m32 w2):
# dbf16 masked prefix retry + fast mode, fwd and fwd+bwd.
set -u
cd /root/repo
{
  echo "=== restructured fast w2"
  timeout 900 python scripts/bench_variants.py --variants m32x2 --iters 20 --fast 2>&1 | grep -vE "^WARNING"
  timeout 900 python scripts/bench_variants.py --variants m32x2 --iters 12 --bwd --fast 2>&1 | grep -vE "^WARNING"
  echo "=== restructured exact w2 + dbf16 masked prefix"
  DEBLURGS_MASKED_PREFIX=dbf16 timeout 900 python scripts/bench_variants.py --variants m32x2 --iters 20 2>&1 | grep -vE "^WARNING"
  DEBLURGS_MASKED_PREFIX=dbf16 timeout 900 python scripts/bench_variants.py --variants m32x2 --iters 12 --bwd 2>&1 | grep -vE "^WARNING"
} 2>&1 | tee runs/r5_ab3.log
echo AB3_DONE
