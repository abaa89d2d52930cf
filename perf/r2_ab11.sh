#!/bin/bash
cd /root/repo
echo "=== train remat=dots ==="
OLMOASR_BENCH_MODE=train OLMOASR_REMAT_POLICY=dots python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== longform chunk=112 files=64 batch=64 ==="
OLMOASR_BENCH_MODE=longform OLMOASR_DECODE_CHUNK=112 OLMOASR_BENCH_FILES=64 OLMOASR_BENCH_BATCH=64 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo DONE
