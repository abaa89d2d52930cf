#!/bin/bash
# r4 sweep 11: extend the `mlp` remat save list. ckv = decoder per-layer
# cross k/v projections over Ta=1536 (~28% of a decoder layer's fwd flops,
# re-run in the bwd recompute; stash 2x(B,1536,D) bf16/layer). resid2 =
# post-attention residual sums (skips the o-proj recompute; stash (B,T,D)
# per attention sub-block).
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name : $*"
  timeout 900 "$@" python bench.py 2>&1 | grep -v WARNING | tail -1
}
T="OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1 OLMOASR_GRADS_BF16=1 OLMOASR_REMAT_POLICY=mlp OLMOASR_BENCH_NU16=1 OLMOASR_BENCH_BATCH=8"
run base      env $T
run ckv       env $T OLMOASR_SAVE_CKV=1
run resid     env $T OLMOASR_SAVE_RESID=1
run ckv_resid env $T OLMOASR_SAVE_CKV=1 OLMOASR_SAVE_RESID=1
echo "=== done"
