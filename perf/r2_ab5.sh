#!/bin/bash
cd /root/repo
echo "=== fast_softmax=1 B=128 224steps ==="
OLMOASR_FAST_SOFTMAX=1 python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== longform bench ==="
OLMOASR_BENCH_MODE=longform python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo "=== train bench (medium.en) ==="
OLMOASR_BENCH_MODE=train python bench.py 2>&1 | grep -E "metric|rror" | tail -2
echo DONE
