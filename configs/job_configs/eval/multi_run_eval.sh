#!/usr/bin/env bash
# Short-form eval sweep over all 14 sets (parity with
# configs/job_configs/eval/multi_run_eval.sh).
set -euo pipefail
CKPT=${1:?usage: multi_run_eval.sh <ckpt> [eval_dir]}
EVAL_DIR=${2:-eval_data}
for SET in librispeech_clean librispeech_other tedlium wsj callhome switchboard \
           common_voice artie coraal chime6 ami_ihm ami_sdm voxpopuli fleurs; do
  python -m olmoasr_tpu.eval.harness --eval_set "$SET" --eval_dir "$EVAL_DIR/$SET" \
    --ckpt "$CKPT" --out_dir eval_results || echo "SKIP $SET (data missing)"
done
