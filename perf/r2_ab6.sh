#!/bin/bash
cd /root/repo
echo "=== longform (fixed) ==="
OLMOASR_BENCH_MODE=longform python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== encoder flash A/B at B=128 ==="
OLMOASR_FLASH=1 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== train micro_bs=16 ==="
OLMOASR_BENCH_MODE=train OLMOASR_BENCH_BATCH=16 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== train micro_bs=8 no-remat ==="
OLMOASR_BENCH_MODE=train OLMOASR_BENCH_REMAT=0 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo DONE
