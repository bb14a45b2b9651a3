#!/bin/bash
# Round-5 kernel A/B at bench scale (1080p/100k, pipelined, distinct
# inputs per call): exact vs fast blend, fwd and fwd+bwd, on the shipping
# mixed-32 configuration (+ the r4-best baselines for continuity).
set -u
cd /root/repo
{
  echo "=== exact (m32x1 fwd / m32x2 fwd+bwd)"
  timeout 1800 python scripts/bench_variants.py --variants m32x1 --iters 20
  timeout 1800 python scripts/bench_variants.py --variants m32x2 --iters 12 --bwd
  echo "=== fast"
  timeout 1800 python scripts/bench_variants.py --variants m32x1 --iters 20 --fast
  timeout 1800 python scripts/bench_variants.py --variants m32x2 --iters 12 --bwd --fast
  echo "=== fast w1 fwd+bwd (window sweep under fast)"
  timeout 1800 python scripts/bench_variants.py --variants m32x1 --iters 12 --bwd --fast
} 2>&1 | grep -vE "^WARNING" | tee runs/r5_ab_fast.log
