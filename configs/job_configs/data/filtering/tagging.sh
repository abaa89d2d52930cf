#!/usr/bin/env bash
# Tag segmented shards with quality heuristics (reference tagging.sh).
set -euo pipefail
python -m olmoasr_tpu.data.tagging \
  --shards "${SHARDS:-data/segmented/*.jsonl.gz}" \
  --config configs/data_configs/tagging/all_tags.yaml \
  --out_dir "${OUT_DIR:-data/tagged}"
