#!/bin/bash
# r3: post-decoder-kernel sweep — micro_bs, remat policy, CE chunk
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name : $*"
  env OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1 "$@" timeout 860 python bench.py 2>&1 | grep -v "^WARNING" | tail -1
}
run bs16_base   OLMOASR_BENCH_BATCH=16
run bs24        OLMOASR_BENCH_BATCH=24
run bs32        OLMOASR_BENCH_BATCH=32
run bs16_norem  OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_REMAT=0
run bs16_ce8k   OLMOASR_BENCH_BATCH=16 OLMOASR_CE_CHUNK=8192
run bs16_wide   OLMOASR_BENCH_BATCH=16 OLMOASR_REMAT_POLICY=wide
