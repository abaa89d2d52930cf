#!/usr/bin/env bash
# Pack raw transcript trees into JSONL shards (reference text_to_jsonl.sh).
set -euo pipefail
python -m olmoasr_tpu.data.jsonl \
  --in_dir "${IN_DIR:-data/raw_text}" \
  --out_path "${OUT_PATH:-data/jsonl/shard0.jsonl.gz}"
