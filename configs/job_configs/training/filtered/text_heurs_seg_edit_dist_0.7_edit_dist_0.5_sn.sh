#!/usr/bin/env bash
# Headline filtered recipe (reference filtered/*_sn.sh): filter with the
# text-heuristics + edit-distance pipeline, then train.
set -euo pipefail
FILTERED=${FILTERED:-data/filtered_text_heurs_0.7_0.5}
python -m olmoasr_tpu.data.filtering \
  --tagged "${TAGGED:-data/tagged/*.jsonl.gz}" \
  --filter_config configs/data_configs/filtering/text_heurs_seg_edit_dist.yaml \
  --out_dir "$FILTERED"
TRAIN_SHARDS="$FILTERED/*.jsonl.gz" EXP_NAME=filtered_medium_en \
bash "$(dirname "$0")/../medium_en.sh"
