#!/bin/bash
# Round-4 phase 2: the mid-round machine re-provision wiped data/ (it is
# gitignored), so the queued ML stages (chain_r4.sh cnn3/cnn8) fail fast on
# a missing dataset.  This chain regenerates it and then runs them, plus the
# flagship validation re-measure (post r4 precision fixes), each bounded,
# with the same hard deadline guard so the driver's bench.py owns the chip
# at round end.
#
#   bash scripts/r4_phase2.sh <deadline-epoch> [wait-pid]
#
# wait-pid: the phase-1 supervisor (r4_supervisor.sh) to wait for before
# touching the TPU — never two processes on the chip.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
DEADLINE="${1:?usage: r4_phase2.sh <deadline-epoch> [wait-pid]}"
WAIT_PID="${2:-}"
LOGDIR=/tmp/r4_chain
mkdir -p "$LOGDIR"
LOG="$LOGDIR/phase2.log"
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

if [ -n "$WAIT_PID" ]; then
  say "waiting for phase-1 supervisor (pid $WAIT_PID) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
say "phase 2 start; $(remaining)s to deadline"

# 1. Dataset regeneration (chunk-resumable).  r3 measured ~3.6h for the
#    1.5M-cap pass at 384²; cap the stage to what fits.
if [ "$(remaining)" -ge 10800 ]; then
  budget=$(( $(remaining) - 2700 )); [ "$budget" -gt 16200 ] && budget=16200
  say "RUN datagen (budget ${budget}s)"
  timeout -k 30 "$budget" python scripts/datagen_full.py \
      >> "$LOGDIR/datagen.log" 2>&1
  say "DONE datagen rc=$?"
else
  say "SKIP datagen ($(remaining)s left)"; exit 1
fi
if [ ! -f data/ml_full/Re_range.npy ]; then
  say "datagen did not assemble a dataset; aborting ML stages"; exit 1
fi

# 2. cnn_three faithful retry (VERDICT r3 #3) — 192² downsample, cheap.
if [ "$(remaining)" -ge 7200 ]; then
  say "RUN cnn3"
  timeout -k 30 6000 python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 3 --log "$LOGDIR/cnn3b.log" -- \
      python scripts/train_early_presets.py --models cnn_three \
        --optimizer rmsprop --lr 1e-4 --schedule inverse --epochs 500 \
        --seven-384-epochs 0
  rc=$?; say "DONE cnn3 rc=$rc"
  if [ "$rc" -eq 99 ]; then
    say "ABORT: unkillable TPU child"; exit 99
  fi
fi

# 3. Flagship Ghia validation re-measure (CLAUDE.md: the r4 sampling/typo
#    fixes shifted the fidelity metrics; re-measure on TPU).  45 min cap.
if [ "$(remaining)" -ge 5400 ]; then
  say "RUN validate"
  timeout -k 30 2700 python scripts/validate_tpu.py \
      >> "$LOGDIR/validate.log" 2>&1
  say "DONE validate rc=$?"
fi

# 4. cnn_eight faithful full-budget run (VERDICT r3 #4) — checkpoint-
#    resumable, so it gets ALL remaining time minus a 35-min margin for the
#    driver's bench; a partial run still lands the loss trajectory.
budget=$(( $(remaining) - 2100 ))
if [ "$budget" -ge 3600 ]; then
  say "RUN cnn8 (budget ${budget}s)"
  timeout -k 30 "$budget" python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 5 --log "$LOGDIR/cnn8b.log" -- \
      python scripts/train_eight_faithful.py
  say "DONE cnn8 rc=$?"
else
  say "SKIP cnn8 (only ${budget}s budget)"
fi
say "phase 2 complete; $(remaining)s to deadline"
