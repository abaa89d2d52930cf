#!/bin/bash
# Flash training isolation ladder (medium.en, B=8): fwd-only first, then
# fwd+bwd with bwd-block sweep, enc/dec isolation.
cd /root/repo
R() { echo "=== $* ==="; PYTHONPATH=/root/repo:$PYTHONPATH timeout 1200 python perf/r2_train_flash2.py "$@" 2>&1 | tail -n 1; }
R --enc 0 --dec 0 --fwd_only 1            # XLA fwd baseline
R --enc 1 --dec 0 --fwd_only 1            # flash enc fwd
R --enc 1 --dec 1 --fwd_only 1            # flash enc+dec fwd
R --enc 0 --dec 0                          # XLA fwd+bwd (remat) baseline
R --enc 1 --dec 0 --bwd_block 128          # flash enc, default bwd blocks
R --enc 1 --dec 0 --bwd_block 512          # flash enc, bigger bwd blocks
R --enc 1 --dec 1 --bwd_block 512          # flash enc+dec
