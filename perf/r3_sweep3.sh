#!/bin/bash
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name : $*"
  env OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1 PYTHONUNBUFFERED=1 "$@" timeout 1500 python bench.py 2>&1 | grep -v "^WARNING" | tail -5
}
run bs16_ce8k   OLMOASR_BENCH_BATCH=16 OLMOASR_CE_CHUNK=8192
run bs16_norem  OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_REMAT=0
run bs24        OLMOASR_BENCH_BATCH=24
