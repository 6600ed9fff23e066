#!/bin/bash
# Round-3 TPU chain, stage C (runs after stage B).  Cleanup passes on the
# early-preset results:
#   1. cnn_three retrain with gradient clipping + lr 3e-4 (diverged at 1e-3)
#   2. cnn_seven@384 at 150 epochs (60 was underfit: relL2 0.48 vs 0.05@192)
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

log() { echo "[chain-c $(date -u +%H:%M:%S)] $*"; }

B_PID=$(cat /tmp/chain_b.pid 2>/dev/null || echo "")
if [ -n "$B_PID" ]; then
  log "waiting for stage B pid $B_PID"
  while kill -0 "$B_PID" 2>/dev/null; do sleep 60; done
fi
log "stage B finished"

log "retrain cnn_three (clip 1.0, lr 3e-4)"
python scripts/train_early_presets.py --models cnn_three \
  --clip-norm 1.0 --lr 3e-4 --seven-384-epochs 0 \
  > /tmp/retrain_three.log 2>&1
log "cnn_three rc=$?"

log "cnn_seven@384 at 150 epochs"
python scripts/train_early_presets.py --models cnn_seven \
  --epochs 120 --seven-384-epochs 150 > /tmp/retrain_seven.log 2>&1
log "cnn_seven rc=$?"

log "stage C done"
