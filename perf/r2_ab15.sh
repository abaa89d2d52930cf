#!/bin/bash
cd /root/repo
echo "=== dot + fast_softmax ==="
OLMOASR_FAST_SOFTMAX=1 python bench.py 2>&1 | grep -E "metric|rror" | tail -1
echo "=== dot + chunk=224 (no mid-decode syncs) ==="
OLMOASR_DECODE_CHUNK=224 python bench.py 2>&1 | grep -E "metric|rror" | tail -1
echo DONE
