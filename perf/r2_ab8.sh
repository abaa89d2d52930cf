#!/bin/bash
cd /root/repo
echo "=== B=128 flash, XLA cross (megakernel off) ==="
OLMOASR_PALLAS_CROSS_BLOCK=0 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== B=96 flash ==="
OLMOASR_BENCH_BATCH=96 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo DONE
