#!/bin/bash
# Post-chain top-up for the NOT-at-floor early presets.
#
# scripts/loss_floor_report.py (r5) shows cnn_two/cnn_one/cnn_seven val-loss
# tails still descending at their trained budgets (-1.7/-2.2/-0.10
# decades/100ep) while cnn_four/five/six sit at the floor.  The main
# chain's stage 6 did run this round and covered cnn_two at 500 epochs
# (relL2 0.51% — docs/artifacts/ml_early_ref_budget/), so this runner
# covers the remaining two: it waits for chain_r5 to exit (never two TPU
# processes), then trains cnn_one and cnn_seven to the reference's
# 500-epoch budget (/root/reference/CNNOne_192/CNN_One.py:103) with
# whatever time remains.
#
#   bash scripts/chain_r5b.sh <deadline-epoch>
#
# Single train_early_presets invocation (one dataset load); per-model
# summary writes + 25-epoch checkpoints make a timeout cut or watchdog
# restart lose at most 25 epochs of one model.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
DEADLINE="${1:?usage: chain_r5b.sh <deadline-epoch>}"
LOGDIR=/tmp/r5
mkdir -p "$LOGDIR"
LOG="$LOGDIR/chain_b.log"
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

say "chain_r5b armed; $(remaining)s to deadline"
while [ -f "$LOGDIR/chain.pid" ] \
    && kill -0 "$(cat "$LOGDIR/chain.pid")" 2>/dev/null; do
  if [ "$(remaining)" -le 900 ]; then
    say "deadline reached while waiting for chain_r5; exiting"
    exit 0
  fi
  sleep 60
done
say "main chain finished; $(remaining)s left"

if [ ! -f data/ml_full/Re_range.npy ]; then
  say "no assembled dataset; exiting"
  exit 0
fi

budget=$(( $(remaining) - 300 ))
if [ "$budget" -lt 900 ]; then
  say "SKIP top-ups (budget ${budget}s)"
  exit 0
fi
say "RUN not-at-floor top-ups (budget ${budget}s)"
timeout -k 30 "$budget" python scripts/tpu_watchdog.py \
    --stall-seconds 600 --max-restarts 2 --log "$LOGDIR/topup_floor.log" -- \
    python scripts/train_early_presets.py \
      --models cnn_one,cnn_seven --epochs 500 \
      --seven-384-epochs 0 --out docs/artifacts/ml_early_ref_budget
say "DONE top-ups rc=$?; $(remaining)s to deadline"
