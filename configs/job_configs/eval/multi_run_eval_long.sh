#!/usr/bin/env bash
# Long-form eval sweep (beam_size=5 best_of=5), parity with multi_run_eval_long.sh.
set -euo pipefail
CKPT=${1:?usage: multi_run_eval_long.sh <ckpt> [eval_dir]}
EVAL_DIR=${2:-eval_data}
for SET in tedlium_long meanwhile kincaid46 rev16 earnings21 earnings22 coraal_long; do
  python -m olmoasr_tpu.eval.harness --eval_set "$SET" --eval_dir "$EVAL_DIR/$SET" \
    --ckpt "$CKPT" --out_dir eval_results --long_form || echo "SKIP $SET (data missing)"
done
