#!/bin/bash
# Round-3 sweep 4: everything chip-gated, serialized for one tunnel window.
# Usage: bash perf/r3_sweep4.sh 2>&1 | tee perf/r3_sweep4.log
cd /root/repo
# scripts under perf/ put perf/ (not the repo) on sys.path; the axon TPU
# plugin lives on the inherited PYTHONPATH — prepend, never replace
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}
run() {
  name=$1; shift
  echo "=== $name : $*"
  env PYTHONUNBUFFERED=1 "$@" timeout 1800 python bench.py 2>&1 | grep -v "^WARNING" | tail -4
}
# ceiling first: settles the MFU denominator (fast)
echo "=== probe_peak"
timeout 900 python perf/probe_peak.py 2>&1 | grep -v "^WARNING"
T="OLMOASR_BENCH_MODE=train OLMOASR_BENCH_MU16=1"
# -- training MFU ladder --
run train_bs16_prepad   env $T OLMOASR_BENCH_BATCH=16
run train_bs16_dwbar    env $T OLMOASR_BENCH_BATCH=16 OLMOASR_DW_BARRIER=1
run train_bs16_unroll4  env $T OLMOASR_BENCH_BATCH=16 OLMOASR_SCAN_UNROLL=4
run train_bs16_ce8k     env $T OLMOASR_BENCH_BATCH=16 OLMOASR_CE_CHUNK=8192
run train_bs16_devmel   env $T OLMOASR_BENCH_BATCH=16 OLMOASR_DEVICE_MEL=1
run train_bs24          env $T OLMOASR_BENCH_BATCH=24
run train_bs16_norem    env $T OLMOASR_BENCH_BATCH=16 OLMOASR_BENCH_REMAT=0
# -- decode records --
run decode_bf16kv       env OLMOASR_BENCH_MODE=decode OLMOASR_BENCH_KV_QUANT=0
run decode_int8_head    env OLMOASR_BENCH_MODE=decode
# -- long-form records with upload/decode split --
run longform_greedy     env OLMOASR_BENCH_MODE=longform
run longform_beam5      env OLMOASR_BENCH_MODE=longform OLMOASR_BENCH_BEAM=1
# -- train-attention softmax VPU hypothesis --
run train_bs16_bf16exp  env $T OLMOASR_BENCH_BATCH=16 OLMOASR_ATTN_BF16_EXP=1
# -- fused decoder-layer kernel (1 launch/layer; self+MLP hide under cross DMA) --
# full-layer fusion (LAYER_BLOCK=1): weight blocks ~16.5MB > ~16MB VMEM at
# small.en — one leg kept to confirm the budget math, r4/beam variants
# pruned (same expected OOM)
run decode_layerblk     env OLMOASR_BENCH_MODE=decode OLMOASR_LAYER_BLOCK=1
run train_bs16_deferl   env $T OLMOASR_BENCH_BATCH=16 OLMOASR_ATTN_DEFER_L=1
run train_bs16_deferl_bf16exp env $T OLMOASR_BENCH_BATCH=16 OLMOASR_ATTN_DEFER_L=1 OLMOASR_ATTN_BF16_EXP=1
run decode_layerblk_sc  env OLMOASR_BENCH_MODE=decode OLMOASR_LAYER_BLOCK=sc
run longform_beam5_layerblk_sc env OLMOASR_BENCH_MODE=longform OLMOASR_BENCH_BEAM=1 OLMOASR_LAYER_BLOCK=sc
