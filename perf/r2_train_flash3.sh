#!/bin/bash
# Full fwd+bwd flash A/B (fixed full-grad reduction, no DCE), medium.en B=8 remat.
cd /root/repo
R() { echo "=== $* ==="; PYTHONPATH=/root/repo:$PYTHONPATH timeout 1500 python perf/r2_train_flash2.py "$@" 2>&1 | tail -n 1; }
R --enc 0 --dec 0
R --enc 1 --dec 0 --bwd_block 128
R --enc 1 --dec 0 --bwd_block 512
R --enc 1 --dec 1 --bwd_block 128
R --enc 1 --dec 1 --bwd_block 256
