#!/bin/bash
cd /root/repo
for m in dot dot8; do
  echo "=== wv_mode=$m B=128 ==="
  OLMOASR_WV_MODE=$m python bench.py 2>&1 | grep -E "metric|rror" | tail -2
done
echo DONE
