#!/bin/bash
# Round-5 chunk-width A/B (cfg.chunk): the mixed kernel is per-step-
# overhead bound; c256/c512 halve/quarter the grid-step count.
set -u
cd /root/repo
{
  echo "=== chunk sweep fwd (m32x1 base vs c256/c512)"
  timeout 1800 python scripts/bench_variants.py --variants m32x1c256,m32x1c512 --iters 20 2>&1 | grep -vE "^WARNING"
  echo "=== chunk sweep fwd+bwd (m32x2 base vs c256/c512)"
  timeout 1800 python scripts/bench_variants.py --variants m32x2c256,m32x2c512 --iters 12 --bwd 2>&1 | grep -vE "^WARNING"
} 2>&1 | tee -a runs/r5_ab2.log
echo CHUNK_AB_DONE
