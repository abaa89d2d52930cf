#!/usr/bin/env bash
# YODAS-corpus run (reference yodas_sn.sh analog): YodasDataset shards.
set -euo pipefail
python -m olmoasr_tpu.training.train_loop \
  --variant "${VARIANT:-medium.en}" \
  --train_shards "${TRAIN_SHARDS:-data/yodas/*.jsonl.gz}" \
  --exp_name "${EXP_NAME:-yodas_medium_en}" \
  --train_steps 524288 \
  --eff_batch_size "${EFF_BS:-512}" \
  --micro_batch_size "${MICRO_BS:-8}" \
  --fsdp_size "${FSDP_SIZE:-1}"
