#!/bin/bash
# r3: decoder training-attention kernels A/B (OLMOASR_DEC_ATTN=kernel)
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name : $*"
  env OLMOASR_BENCH_MODE=train "$@" timeout 900 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
}
run enc_kernel_base OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1 OLMOASR_ENC_ATTN=kernel
run enc_dec_kernel  OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_MU16=1 OLMOASR_ENC_ATTN=kernel OLMOASR_DEC_ATTN=kernel
