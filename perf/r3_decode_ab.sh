#!/bin/bash
# r3: decode A/Bs — bf16-KV (exact-parity config) RTFx, self-block kernel settle
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name : $*"
  env OLMOASR_BENCH_MODE=decode PYTHONUNBUFFERED=1 "$@" timeout 1200 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
}
run int8_base      OLMOASR_BENCH_KV_QUANT=1
run bf16_kv        OLMOASR_BENCH_KV_QUANT=0
