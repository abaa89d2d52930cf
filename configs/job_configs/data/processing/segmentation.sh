#!/usr/bin/env bash
# Segment raw (audio, transcript) JSONL rows into 30s training windows
# (reference configs/job_configs/data/processing/segmentation.sh ->
# olmoasr/preprocess.py analog).
set -euo pipefail
python -m olmoasr_tpu.data.segment \
  --shards "${SHARDS:-data/raw/*.jsonl.gz}" \
  --out_dir "${OUT_DIR:-data/segmented}" \
  --mode "${MODE:-transcript_only}"
