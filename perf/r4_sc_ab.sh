#!/bin/bash
# VERDICT r3 #6: 3 repeated A/B runs of layer-block 'sc' vs split kernels
# at the decode headline config (small.en B=128 greedy int8). Promote the
# sc claim only if the win exceeds the measured run-to-run band (~±1.5%).
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH}"
for i in 1 2 3; do
  for leg in sc:sc split:0; do
    name="${leg%%:*}"; val="${leg#*:}"
    echo "=== run$i $name"
    OLMOASR_LAYER_BLOCK=$val OLMOASR_BENCH_MODE=decode \
      timeout 700 python bench.py 2>&1 | grep -v WARNING | tail -1
  done
done
echo "=== done"
