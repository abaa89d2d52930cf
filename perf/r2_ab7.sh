#!/bin/bash
cd /root/repo
echo "=== headline bench (flash auto, B=128) ==="
python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== longform (warmup fixed) ==="
OLMOASR_BENCH_MODE=longform python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo DONE
