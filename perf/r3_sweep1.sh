#!/bin/bash
# r3 train sweep: mlp remat policy + scan unroll
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name : $*"
  env OLMOASR_BENCH_MODE=train "$@" timeout 900 python bench.py 2>&1 | grep -v "^WARNING" | tail -5
}
run mlp_bs16      OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1 OLMOASR_REMAT_POLICY=mlp OLMOASR_CE_CHUNK=8192
run mlp_bs8       OLMOASR_BENCH_BATCH=8  OLMOASR_BENCH_MU16=1 OLMOASR_REMAT_POLICY=mlp OLMOASR_CE_CHUNK=8192
run attn_unroll4  OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1 OLMOASR_REMAT_POLICY=attn OLMOASR_SCAN_UNROLL=4
run mlp_unroll4   OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1 OLMOASR_REMAT_POLICY=mlp OLMOASR_CE_CHUNK=8192 OLMOASR_SCAN_UNROLL=4
