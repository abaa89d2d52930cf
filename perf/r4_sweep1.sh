#!/bin/bash
# r4 sweep 1: remat-policy x micro_bs ladder with CHAINED timing (bench.py
# r4 methodology — perf/r4_timing.md). The custom-VJP attention keeps only
# (q,k,v) residuals, so no-remat activation cost is far below standard;
# recompute under the default 'attn' policy costs ~18% of the step.
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name : $*"
  timeout 900 "$@" python bench.py 2>&1 | grep -v WARNING | tail -2
}
T="OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1"
run train_bs16_attn      env $T OLMOASR_BENCH_BATCH=16
run train_bs8_norem      env $T OLMOASR_BENCH_BATCH=8  OLMOASR_BENCH_REMAT=0
run train_bs12_norem     env $T OLMOASR_BENCH_BATCH=12 OLMOASR_BENCH_REMAT=0
run train_bs16_norem     env $T OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_REMAT=0
run train_bs16_wide      env $T OLMOASR_BENCH_BATCH=16 OLMOASR_REMAT_POLICY=wide
run train_bs16_mlpwide   env $T OLMOASR_BENCH_BATCH=16 OLMOASR_REMAT_POLICY=mlp_wide
run train_bs20_attn      env $T OLMOASR_BENCH_BATCH=20
echo "=== done"
