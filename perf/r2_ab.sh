#!/bin/bash
# Round-2 perf A/B: serialized TPU runs (parallel procs contend on the tunnel)
cd /root/repo
echo "=== V1: cross megakernel ON (default), B=32 ==="
OLMOASR_PALLAS_CROSS_BLOCK=1 python bench.py 2>&1 | tail -2
echo "=== V0: cross megakernel OFF (r1 stack + bf16 self dots), B=32 ==="
OLMOASR_PALLAS_CROSS_BLOCK=0 python bench.py 2>&1 | tail -2
echo "=== V1 B=48 ==="
OLMOASR_BENCH_BATCH=48 python bench.py 2>&1 | tail -2
echo "=== V1 B=64 ==="
OLMOASR_BENCH_BATCH=64 python bench.py 2>&1 | tail -2
echo "=== DONE ==="
