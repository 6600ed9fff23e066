#!/bin/bash
# Round-3 TPU chain, stage A: wait for the datagen top-up, then
# reassemble the dataset, run the cnn_eight diagnosis sweep, and train the
# early presets M2-M7.  One TPU job at a time (single v5e chip).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

log() { echo "[chain-a $(date -u +%H:%M:%S)] $*"; }

TOPUP_PID=$(cat /tmp/topup_r3.pid 2>/dev/null || echo "")
if [ -n "$TOPUP_PID" ]; then
  log "waiting for topup pid $TOPUP_PID"
  while kill -0 "$TOPUP_PID" 2>/dev/null; do sleep 60; done
fi
log "topup finished"

log "reassembling dataset"
python scripts/datagen_full.py > /tmp/assemble_r3.log 2>&1
log "assemble rc=$?"

log "cnn_eight diagnosis sweep"
python scripts/diagnose_cnn_eight.py --epochs 150 > /tmp/diag8_r3.log 2>&1
log "diagnose rc=$?"

log "early presets M2-M7"
python scripts/train_early_presets.py --epochs 120 > /tmp/early_r3.log 2>&1
log "early rc=$?"

log "stage A done"
