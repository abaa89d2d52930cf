#!/bin/bash
cd /root/repo
for B in 64 128; do
  echo "=== interleaved-V B=$B ==="
  OLMOASR_BENCH_BATCH=$B python bench.py 2>&1 | grep -E "metric|rror" | tail -2
done
echo DONE
