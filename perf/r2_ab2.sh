#!/bin/bash
cd /root/repo
for B in 64 96 128; do
  echo "=== optimized kernels B=$B ==="
  OLMOASR_BENCH_BATCH=$B python bench.py 2>&1 | grep -E "metric|rror" | tail -3
done
echo "=== DONE ==="
