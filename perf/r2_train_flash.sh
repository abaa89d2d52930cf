#!/bin/bash
# Train-perf ladder: encoder flash attention (fwd+bwd pallas) A/B on medium.en.
# Round-1 baseline: micro_bs=8, remat full, no flash -> 4434 tok/s, 0.262 v5e MFU.
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" OLMOASR_BENCH_MODE=train OLMOASR_BENCH_ITERS=5 \
    timeout 1500 python bench.py 2>&1 | tail -n 1
}
run OLMOASR_TRAIN_FLASH=0 OLMOASR_BENCH_BATCH=8   # r1 baseline repro
run OLMOASR_TRAIN_FLASH=1 OLMOASR_BENCH_BATCH=8   # flash, same batch
run OLMOASR_TRAIN_FLASH=1 OLMOASR_BENCH_BATCH=16  # flash frees score memory
run OLMOASR_TRAIN_FLASH=1 OLMOASR_BENCH_BATCH=16 OLMOASR_REMAT_POLICY=dots
run OLMOASR_TRAIN_FLASH=1 OLMOASR_BENCH_BATCH=8 OLMOASR_BENCH_REMAT=0  # no remat
