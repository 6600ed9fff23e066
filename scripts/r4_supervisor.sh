#!/bin/bash
# Round-4 unattended TPU supervisor: poll the axon relay until it answers,
# then run the r4 task chain (cheap -> expensive) with a hard round-end
# deadline so the driver's bench.py owns the chip at the end.
#
#   bash scripts/r4_supervisor.sh <deadline-epoch> [start-stage]
#
# Stages: quick (bench + compiled sharded checks + slow gates), cnn3,
# kprobe, cnn8 — see scripts/chain_r4.sh.  A stage is only *launched* while
# now + its budget fits inside the deadline; each stage is also wrapped in
# `timeout -k 30` clamped to its budget, so nothing outlives it.  The chain
# ABORTS if a stage signals the chip may still be held (tpu_watchdog rc=99:
# unkillable child) — launching the next stage would put two processes on
# the TPU.
set -u
cd "$(dirname "$0")/.."
DEADLINE="${1:?usage: r4_supervisor.sh <deadline-epoch> [start-stage]}"
START_STAGE="${2:-quick}"
STAGES="quick:10800 cnn3:9000 kprobe:7200 cnn8:18000"
case " quick cnn3 kprobe cnn8 " in
  *" $START_STAGE "*) ;;
  *) echo "unknown start stage '$START_STAGE'" >&2; exit 2;;
esac
LOGDIR=/tmp/r4_chain
mkdir -p "$LOGDIR"
LOG="$LOGDIR/supervisor.log"

say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)); float(np.asarray((x @ x)[0, 0]))
print(jax.devices()[0])
" >> "$LOG" 2>&1
}

say "supervisor start; deadline=$DEADLINE ($(date -ud @"$DEADLINE" +%H:%M:%S)Z), start=$START_STAGE"

# Phase 1: wait for the relay (probe every 3 min; each probe capped at 5 min).
until probe; do
  now=$(date +%s)
  if [ "$now" -ge $((DEADLINE - 600)) ]; then
    say "relay never answered before the deadline; giving up"
    exit 1
  fi
  say "relay still dead (probe timed out / failed); sleeping 180s"
  sleep 180
done
say "RELAY ALIVE — starting the chain at stage $START_STAGE"

# Phase 2: the chain.  budget = per-stage wall ceiling (seconds), sized to
# cover the stage's own internal timeouts; a stage is skipped (not
# truncated) if it cannot start with full budget.
run_stage() {
  local stage="$1" budget="$2"
  local now remaining
  now=$(date +%s); remaining=$((DEADLINE - now))
  if [ "$remaining" -lt "$budget" ]; then
    say "SKIP $stage: needs ${budget}s, only ${remaining}s left"
    return 0
  fi
  say "RUN $stage (budget ${budget}s, ${remaining}s to deadline)"
  timeout -k 30 "$budget" bash scripts/chain_r4.sh "$stage" \
      >> "$LOGDIR/$stage.out" 2>&1
  local rc=$?
  say "DONE $stage rc=$rc"
  if [ "$rc" -eq 99 ]; then
    say "ABORT chain: stage $stage reports an unkillable TPU child (rc=99);"
    say "launching another stage would run two processes on the chip"
    return 99
  fi
  return 0
}

started=false
for spec in $STAGES; do
  stage="${spec%%:*}"; budget="${spec##*:}"
  if ! $started; then
    [ "$stage" = "$START_STAGE" ] && started=true || continue
  fi
  run_stage "$stage" "$budget" || exit 99
done
say "supervisor finished"
