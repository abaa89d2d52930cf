#!/usr/bin/env bash
# tiny.en training job (parity with the reference's
# configs/job_configs/training/filtered/*_mn.sh derived-value pattern).
set -euo pipefail

VARIANT=tiny.en
MICRO_BS=${MICRO_BS:-8}
N_CHIPS=${N_CHIPS:-$(python -c 'import jax; print(len(jax.devices()))')}
ACCUM=${ACCUM:-2}
EFFECTIVE_BATCH_SIZE=$((MICRO_BS * N_CHIPS * ACCUM))
EXP_NAME=${EXP_NAME:-"${VARIANT/./_}_bs${EFFECTIVE_BATCH_SIZE}"}

python -m olmoasr_tpu.training.train_loop \
  --variant "$VARIANT" \
  --train_shards "${TRAIN_SHARDS:-data/*.jsonl.gz}" \
  --exp_name "$EXP_NAME" \
  --train_steps 524288 \
  --eff_batch_size "$EFFECTIVE_BATCH_SIZE" \
  --micro_batch_size "$MICRO_BS" \
  --peak_lr 1.5e-3 \
  --fsdp_size "${FSDP_SIZE:-1}" \
  --ckpt_every 1000 \
  --eval_every "${EVAL_EVERY:-5000}" \
  --eval_set librispeech_clean
