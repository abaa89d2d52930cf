#!/usr/bin/env bash
# Single-node unfiltered-data run (reference unfiltered_sn.sh analog):
# train on raw segmented shards, no tag filtering applied.
set -euo pipefail
TRAIN_SHARDS=${TRAIN_SHARDS:-data/unfiltered/*.jsonl.gz} \
EXP_NAME=${EXP_NAME:-unfiltered_medium_en} \
bash "$(dirname "$0")/../medium_en.sh"
