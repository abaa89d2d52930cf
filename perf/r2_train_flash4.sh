#!/bin/bash
# Final-config train bench: enc flash (bwd512), dec XLA. Batch + mu16 sweep.
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" OLMOASR_BENCH_MODE=train OLMOASR_BENCH_ITERS=5 \
    timeout 1800 python bench.py 2>&1 | tail -n 1
}
run OLMOASR_BENCH_BATCH=8
run OLMOASR_BENCH_BATCH=16
run OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1
run OLMOASR_BENCH_BATCH=24 OLMOASR_BENCH_MU16=1
