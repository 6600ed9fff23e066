#!/bin/bash
# Round-4 phase 3 (post machine re-provision, relay ALIVE): one sequential
# TPU chain ordered so the round's must-land records go first and the only
# open-ended stage (cnn_eight) absorbs whatever time is left.
#
#   bash scripts/chain_r4c.sh <deadline-epoch>
#
# Stages (each bounded; the deadline guard re-checks before every stage):
#   1. bench capture       — confirms the chip + warms the compile cache the
#                            driver's round-end bench.py will hit
#   2. flagship validation — re-measure post r4 precision fixes (CLAUDE.md)
#   3. dataset regen       — data/ is gitignored and was wiped by the
#                            re-provision; chunk-resumable
#   4. cnn_three faithful  — VERDICT r3 #3 (needs the dataset)
#   5. K=16 vs 24 probe    — VERDICT r3 #6; 4096²/K24 cell skipped (the
#                            compile that killed the r3 relay)
#   6. cnn_eight faithful  — VERDICT r3 #4; checkpoint-resumable, gets all
#                            remaining time minus the driver-bench margin
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
DEADLINE="${1:?usage: chain_r4c.sh <deadline-epoch>}"
LOGDIR=/tmp/r4_chain
mkdir -p "$LOGDIR"
LOG="$LOGDIR/phase3.log"
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

say "phase 3 start; $(remaining)s to deadline"

# 1. Early bench capture (also the chip liveness check).  Idempotent: a
#    restart of the chain skips stages whose artifact already landed.
if [ ! -f docs/artifacts/bench_r4_early.json ] && [ "$(remaining)" -ge 3000 ]; then
  say "RUN bench"
  timeout -k 30 2400 python bench.py \
      > "$LOGDIR/bench_early.json" 2>"$LOGDIR/bench_early.err"
  rc=$?; say "DONE bench rc=$rc: $(tail -c 300 "$LOGDIR/bench_early.json")"
  [ "$rc" -eq 0 ] && cp "$LOGDIR/bench_early.json" docs/artifacts/bench_r4_early.json
fi

# 1b. SRT collision-cost probe — the one empirical check RESULTS.md's
#     speed-of-light section left open (SRT ≈ MRT at 1024² would confirm
#     the kernel is streaming/gather-bound, not collision-bound).
if [ ! -f docs/artifacts/bench_r4_srt.json ] && [ "$(remaining)" -ge 3000 ]; then
  say "RUN bench-srt"
  LBM_BENCH_COLLISION=srt LBM_BENCH_CHUNKS=2 timeout -k 30 1800 python bench.py \
      > "$LOGDIR/bench_srt.json" 2>"$LOGDIR/bench_srt.err"
  rc=$?; say "DONE bench-srt rc=$rc: $(tail -c 300 "$LOGDIR/bench_srt.json")"
  [ "$rc" -eq 0 ] && cp "$LOGDIR/bench_srt.json" docs/artifacts/bench_r4_srt.json
fi

# 1c. Compiled-path bit-equality of all sharded backends incl. the r4
#     flag-gated RDMA halo — first real-TPU exercise of that path.
if [ "$(remaining)" -ge 3600 ]; then
  say "RUN sharded-check"
  timeout -k 30 2700 python scripts/check_sharded_tpu.py \
      > "$LOGDIR/sharded.log" 2>&1
  say "DONE sharded-check rc=$? : $(tail -n 2 "$LOGDIR/sharded.log" | tr '\n' ' ')"
fi

# 2. Flagship Ghia validation re-measure (post precision fixes).
if [ "$(remaining)" -ge 5400 ]; then
  say "RUN validate"
  timeout -k 30 3600 python scripts/validate_tpu.py \
      >> "$LOGDIR/validate.log" 2>&1
  say "DONE validate rc=$?"
fi

# 3. Dataset regeneration (chunk-resumable; ~3.6h measured in r3).
if [ "$(remaining)" -ge 14400 ]; then
  budget=$(( $(remaining) - 5400 )); [ "$budget" -gt 17000 ] && budget=17000
  say "RUN datagen (budget ${budget}s)"
  timeout -k 30 "$budget" python scripts/datagen_full.py \
      >> "$LOGDIR/datagen.log" 2>&1
  say "DONE datagen rc=$?"
else
  say "SKIP datagen ($(remaining)s left)"
fi

# The sweep runs batches in bit-reversed Re order, so even a cut-off sweep
# covers the full range: assemble whatever chunks exist.
if [ ! -f data/ml_full/Re_range.npy ] && [ -d data/ml_full/chunks ]; then
  nchunks=$(ls data/ml_full/chunks/*.npz 2>/dev/null | wc -l)
  if [ "$nchunks" -ge 20 ]; then
    say "RUN assemble-partial ($nchunks chunks)"
    timeout -k 30 900 python scripts/datagen_full.py --assemble-partial \
        >> "$LOGDIR/datagen.log" 2>&1
    say "DONE assemble-partial rc=$?"
  fi
fi
have_data=false
[ -f data/ml_full/Re_range.npy ] && have_data=true

# 4. cnn_three faithful retry (192², cheap).
if $have_data && [ "$(remaining)" -ge 7200 ]; then
  say "RUN cnn3"
  timeout -k 30 6000 python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 3 --log "$LOGDIR/cnn3.log" -- \
      python scripts/train_early_presets.py --models cnn_three \
        --optimizer rmsprop --lr 1e-4 --schedule inverse --epochs 500 \
        --seven-384-epochs 0
  rc=$?; say "DONE cnn3 rc=$rc"
  if [ "$rc" -eq 99 ]; then say "ABORT: unkillable TPU child"; exit 99; fi
else
  say "SKIP cnn3 (have_data=$have_data, $(remaining)s left)"
fi

# 5. Temporal-block depth probe (2048² pair + 4096² K=16 only).
if [ "$(remaining)" -ge 9000 ]; then
  say "RUN kprobe"
  KPROBE_SKIP_4096_K24=1 timeout -k 30 6000 \
      python scripts/probe_k24.py >> "$LOGDIR/kprobe.log" 2>&1
  rc=$?; say "DONE kprobe rc=$rc"
  if [ "$rc" -eq 99 ]; then say "ABORT: unkillable TPU child"; exit 99; fi
else
  say "SKIP kprobe ($(remaining)s left)"
fi

# 6. cnn_eight faithful full-budget run — all remaining time minus the
#    driver-bench margin; checkpointed, so a partial run still counts.
budget=$(( $(remaining) - 1800 ))
if $have_data && [ "$budget" -ge 3600 ]; then
  say "RUN cnn8 (budget ${budget}s)"
  timeout -k 30 "$budget" python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 5 --log "$LOGDIR/cnn8.log" -- \
      python scripts/train_eight_faithful.py
  say "DONE cnn8 rc=$?"
else
  say "SKIP cnn8 (have_data=$have_data, budget ${budget}s)"
fi
say "phase 3 complete; $(remaining)s to deadline"
