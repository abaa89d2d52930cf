#!/bin/bash
cd /root/repo
echo "=== train mu16 micro_bs=16 ==="
OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1 OLMOASR_BENCH_BATCH=16 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== headline with chunk=112 ==="
OLMOASR_DECODE_CHUNK=112 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo DONE
