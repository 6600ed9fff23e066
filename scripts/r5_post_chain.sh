#!/bin/bash
# Round-5 tail stage: after chain_r5.sh exits, spend whatever window remains
# before the driver needs the chip on the one stage the chain's conservative
# budget math always squeezes out — the init-controlled cnn_eight retry
# (VERDICT r4 missing #1 / weak #6).  A partial run is still evidence: the
# mid-run checkpoints + per-epoch val-loss log record whether glorot escapes
# the mean-predictor plateau within the budget.
#
#   bash scripts/r5_post_chain.sh <chain-pid> <hard-stop-epoch>
set -u
CHAIN_PID="${1:?usage: r5_post_chain.sh <chain-pid> <hard-stop-epoch>}"
STOP="${2:?usage: r5_post_chain.sh <chain-pid> <hard-stop-epoch>}"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=/tmp/r5/chain.log
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 30; done
left=$(( STOP - $(date +%s) ))
say "post-chain: chain $CHAIN_PID done, ${left}s to hard stop"
if [ -f data/ml_full/Re_range.npy ] && [ "$left" -ge 1500 ] \
   && [ ! -f docs/artifacts/ml_full/cnn_eight_glorot/summary.json ]; then
  say "RUN cnn8-glorot tail (budget $((left - 300))s)"
  LBM_KERNEL_INIT=glorot_uniform timeout -k 30 $(( left - 300 )) \
      python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 3 --log /tmp/r5/cnn8_glorot.log -- \
      python scripts/train_eight_faithful.py
  say "DONE cnn8-glorot tail rc=$?"
else
  say "SKIP cnn8-glorot tail (left=${left}s, data=$(ls data/ml_full/Re_range.npy 2>/dev/null || echo none))"
fi
say "post-chain complete"
