#!/bin/bash
# Round-3 TPU chain, stage B (runs after stage A: topup -> reassemble ->
# cnn_eight diagnosis -> M2-M7).  One TPU job at a time (single v5e chip):
#   1. compiled sharded trajectory check (incl. the 2-D halo-lane layout)
#   2. slow physics gates at TPU speed -> docs/artifacts/slow_gates.json
#   3. y-sharded halo-lane layout MLUPS on the real chip
#   4. retrain cnn_nine / cnn_ten / cnn_eight on the 3M-budget dataset
#      (cnn_eight with the best training config from the diagnosis sweep)
#   5. far-extrapolation eval at Re = 7500 / 10000
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

log() { echo "[chain-b $(date -u +%H:%M:%S)] $*"; }

A_PID=$(cat /tmp/chain_a.pid 2>/dev/null || echo "")
if [ -n "$A_PID" ]; then
  log "waiting for stage A pid $A_PID"
  while kill -0 "$A_PID" 2>/dev/null; do sleep 60; done
fi
log "stage A finished"

log "compiled sharded trajectory check"
python scripts/check_sharded_tpu.py > /tmp/check_sharded_r3.log 2>&1
log "check_sharded rc=$?"

log "slow physics gates"
python scripts/slow_gates.py > /tmp/slow_gates_r3.log 2>&1
log "slow_gates rc=$?"

log "halo-lane layout bench"
python scripts/bench_backends.py --backends sharded-tblock-ylanes \
  --sizes 1024,2048 --mesh 1x1 > /tmp/bench_ylanes_r3.log 2>&1
log "bench_ylanes rc=$?"

log "retrain cnn_nine (3M dataset)"
python scripts/train_full.py --models cnn_nine --early-preset '' \
  --fine-tune-epochs 0 > /tmp/retrain_nine.log 2>&1
log "cnn_nine rc=$?"

log "retrain cnn_ten (3M dataset)"
python scripts/train_full.py --models cnn_ten --early-preset '' \
  --fine-tune-epochs 0 --epochs-scale 0.5 \
  --out docs/artifacts/ml_full_b > /tmp/retrain_ten.log 2>&1
log "cnn_ten rc=$?"

# Best *training-config* variant from the diagnosis sweep (the structural
# variants are different architectures and can't back the cnn_eight preset).
# NOTE: a heredoc nested inside $(...) breaks bash's parser at runtime
# ("unexpected EOF while looking for matching )") — keep this a plain -c.
VALS=$(python -c '
import json, os
path = "docs/artifacts/cnn_eight_diag/summary.json"
lr, sched = 1e-3, ""
if os.path.exists(path):
    runs = [r for r in json.load(open(path)).get("runs", [])
            if r.get("preset") == "cnn_eight" and r["tag"] != "g192"]
    if runs:
        best = min(runs, key=lambda r: r["rel_l2_ux_re5000"])
        lr = best["lr"]
        sched = "" if best["schedule"] == "constant" else best["schedule"]
print(lr, sched)
')
LR=$(echo "$VALS" | awk '{print $1}')
SCHED=$(echo "$VALS" | awk '{print $2}')
log "retrain cnn_eight (lr=$LR schedule='${SCHED:-constant}')"
python scripts/train_full.py --models cnn_eight --early-preset '' \
  --lr "$LR" ${SCHED:+--schedule "$SCHED"} > /tmp/retrain_eight.log 2>&1
log "cnn_eight rc=$?"

log "far extrapolation Re=7500/10000"
python scripts/predict_extrapolate.py --models cnn_nine,cnn_ten,cnn_eight \
  > /tmp/extrapolate_r3.log 2>&1
log "extrapolate rc=$?"

log "stage B done"
