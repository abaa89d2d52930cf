#!/bin/bash
cd /root/repo
for cfg in "CROSS_BLOCK=1 BATCH=32" "CROSS_BLOCK=0 BATCH=32" "CROSS_BLOCK=1 BATCH=48" "CROSS_BLOCK=1 BATCH=64"; do
  eval $cfg
  echo "=== cross_block=$CROSS_BLOCK B=$BATCH ==="
  OLMOASR_PALLAS_CROSS_BLOCK=$CROSS_BLOCK OLMOASR_BENCH_BATCH=$BATCH python bench.py 2>&1 | grep -E "metric|Error|error" | tail -3
done
echo "=== DONE ==="
