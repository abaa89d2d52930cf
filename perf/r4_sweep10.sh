#!/bin/bash
# r4 sweep 10: mlp_h remat-tag position. "post" (current default) saves the
# post-gelu value — the bwd recompute still re-runs x@W1 to rebuild the
# pre-activation for gelu'. "pre" saves the pre-activation (same stash
# bytes): gelu' and the post-gelu value re-derive elementwise, cutting the
# 8Td^2 W1-matmul recompute per layer.
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name : $*"
  timeout 900 "$@" python bench.py 2>&1 | grep -v WARNING | tail -1
}
T="OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1 OLMOASR_GRADS_BF16=1 OLMOASR_REMAT_POLICY=mlp OLMOASR_BENCH_NU16=1 OLMOASR_BENCH_BATCH=8"
run tag_post env $T OLMOASR_MLP_TAG=post
run tag_pre  env $T OLMOASR_MLP_TAG=pre
run tag_post2 env $T OLMOASR_MLP_TAG=post
run tag_pre2  env $T OLMOASR_MLP_TAG=pre
echo "=== done"
