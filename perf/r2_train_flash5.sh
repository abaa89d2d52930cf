#!/bin/bash
# Selective remat A/B: save attention outputs (policy=attn) vs full recompute.
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" OLMOASR_BENCH_MODE=train OLMOASR_BENCH_ITERS=5 \
    timeout 1800 python bench.py 2>&1 | tail -n 1
}
run OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1 OLMOASR_REMAT_POLICY=attn
run OLMOASR_BENCH_BATCH=8  OLMOASR_BENCH_MU16=1 OLMOASR_REMAT_POLICY=attn
