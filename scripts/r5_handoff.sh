#!/bin/bash
# Waits for the running r5_validate watchdog (arg 1: its PID) to exit, then
# launches the round-5 TPU chain with the given deadline (arg 2).  Keeps the
# one-process-owns-the-chip rule without busy supervision from the session.
set -u
WAIT_PID="${1:?usage: r5_handoff.sh <validate-watchdog-pid> <deadline-epoch>}"
DEADLINE="${2:?usage: r5_handoff.sh <validate-watchdog-pid> <deadline-epoch>}"
cd "$(dirname "$0")/.."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "[$(date -u +%H:%M:%S)] validate watchdog $WAIT_PID gone; starting chain_r5" >> /tmp/r5/chain.log
exec bash scripts/chain_r5.sh "$DEADLINE"
