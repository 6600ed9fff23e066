#!/bin/bash
# Round-5 sequential TPU chain (one process owns the chip at a time),
# launched AFTER scripts/r5_validate.py completes.  Stage order puts the
# short high-value records first and gives the open-ended ML stages the
# remaining time.  Every stage is artifact-guarded or resumable, so a
# watchdog/restart re-enters where it left off.
#
#   bash scripts/chain_r5.sh <deadline-epoch>
#
# Stages:
#   1. plane-order trajectory check  — r5 gather-schedule experiment
#      (cy-grouped storage) bit-pinned on chip
#   2. plane-order bench A/B         — measured headline delta or negative
#   3. dataset regeneration          — data/ wiped by the re-provision;
#      chunk-resumable sweep + convergence top-up + assembly
#   4. cnn_three glorot retry        — VERDICT r4 missing #1 (init control)
#   5. cnn_eight glorot retry        — same, checkpoint-resumable
#   6. early-preset budget top-up    — VERDICT r4 next #7 (if time)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
DEADLINE="${1:?usage: chain_r5.sh <deadline-epoch>}"
LOGDIR=/tmp/r5
mkdir -p "$LOGDIR"
LOG="$LOGDIR/chain.log"
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

say "chain_r5 start; $(remaining)s to deadline"

# 0. BASELINE config 3 at its literal grid (Re=10000 @1024^2 Pallas LES) —
#    quick (~6 min at ~12k MLUPS), artifact-guarded by its .r5_done marker.
if [ ! -f docs/artifacts/re10000_1024_mrt_les/.r5_done ] && [ "$(remaining)" -ge 3600 ]; then
  say "RUN re10000-1024"
  timeout -k 30 2700 python scripts/r5_validate.py re10000_1024_mrt_les \
      >> "$LOGDIR/re10000_1024.log" 2>&1
  say "DONE re10000-1024 rc=$?"
fi

# 1. Plane-order compiled trajectory check (new kernel shape: ~5 min Mosaic
#    compile for the permuted variant; the lattice-order control is cached).
if [ ! -f docs/artifacts/check_plane_order_tpu.json ] && [ "$(remaining)" -ge 3000 ]; then
  say "RUN plane-order check"
  timeout -k 30 2400 python scripts/check_plane_order_tpu.py \
      > "$LOGDIR/planeorder_check.log" 2>&1
  say "DONE plane-order check rc=$?: $(tail -n 2 "$LOGDIR/planeorder_check.log" | tr '\n' ' ')"
fi

# 2. Plane-order bench A/B under the exact headline protocol (10k-step
#    chunks).  Only meaningful if the check passed.
if [ ! -f docs/artifacts/bench_r5_planeorder.json ] \
   && [ -f docs/artifacts/check_plane_order_tpu.json ] \
   && [ "$(remaining)" -ge 3000 ]; then
  if python -c "import json,sys; r=json.load(open('docs/artifacts/check_plane_order_tpu.json'))['results']; sys.exit(0 if all(x['bit_identical'] for x in r) else 1)"; then
    say "RUN plane-order bench"
    LBM_PLANE_ORDER=cy timeout -k 30 2400 python bench.py \
        > "$LOGDIR/bench_planeorder.json" 2>"$LOGDIR/bench_planeorder.err"
    rc=$?; say "DONE plane-order bench rc=$rc: $(tail -c 300 "$LOGDIR/bench_planeorder.json")"
    [ "$rc" -eq 0 ] && cp "$LOGDIR/bench_planeorder.json" docs/artifacts/bench_r5_planeorder.json
  else
    say "SKIP plane-order bench (trajectory check failed)"
  fi
fi

# 3. Dataset regeneration: sweep (1.5M cap) -> top-up to the reference's 3M
#    budget -> assembly.  All three are resumable / idempotent.
if [ ! -f data/ml_full/Re_range.npy ] && [ "$(remaining)" -ge 16200 ]; then
  budget=$(( $(remaining) - 12600 )); [ "$budget" -gt 16200 ] && budget=16200
  say "RUN datagen sweep (budget ${budget}s)"
  timeout -k 30 "$budget" python scripts/datagen_full.py \
      >> "$LOGDIR/datagen.log" 2>&1
  say "DONE datagen sweep rc=$?"
fi
if [ -d data/ml_full/chunks ] && [ "$(remaining)" -ge 9000 ]; then
  budget=$(( $(remaining) - 7200 )); [ "$budget" -gt 12600 ] && budget=12600
  say "RUN datagen topup (budget ${budget}s)"
  timeout -k 30 "$budget" python scripts/datagen_topup.py \
      >> "$LOGDIR/datagen_topup.log" 2>&1
  say "DONE datagen topup rc=$?"
  say "RUN reassemble"
  timeout -k 30 1800 python scripts/datagen_full.py \
      >> "$LOGDIR/datagen.log" 2>&1
  say "DONE reassemble rc=$?"
fi
# Budget-cut safety: bit-reversed batch order makes a partial sweep usable.
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

# 4. cnn_three init-controlled retry: the reference's own recipe (RMSprop
#    1e-4 inverse decay, 500 epochs) with the Keras 2.x glorot_uniform
#    default init — the one variable the r4 negative left uncontrolled.
if $have_data && [ ! -f docs/artifacts/ml_early_glorot/cnn_three_192/cnn_three_x.msgpack ] \
   && [ "$(remaining)" -ge 4500 ]; then
  say "RUN cnn3-glorot"
  timeout -k 30 4200 python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 3 --log "$LOGDIR/cnn3_glorot.log" -- \
      python scripts/train_early_presets.py --models cnn_three \
        --optimizer rmsprop --lr 1e-4 --schedule inverse --epochs 500 \
        --kernel-init glorot_uniform --seven-384-epochs 0 \
        --out docs/artifacts/ml_early_glorot
  rc=$?; say "DONE cnn3-glorot rc=$rc"
  if [ "$rc" -eq 99 ]; then say "ABORT: unkillable TPU child"; exit 99; fi
else
  say "SKIP cnn3-glorot (have_data=$have_data, $(remaining)s left)"
fi

# 5. cnn_eight init-controlled retry (both components, checkpointed).
budget=$(( $(remaining) - 4500 ))
if $have_data && [ "$budget" -ge 3600 ] \
   && [ ! -f docs/artifacts/ml_full/cnn_eight_glorot/summary.json ]; then
  say "RUN cnn8-glorot (budget ${budget}s)"
  LBM_KERNEL_INIT=glorot_uniform timeout -k 30 "$budget" \
      python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 5 --log "$LOGDIR/cnn8_glorot.log" -- \
      python scripts/train_eight_faithful.py
  say "DONE cnn8-glorot rc=$?"
else
  say "SKIP cnn8-glorot (have_data=$have_data, budget ${budget}s)"
fi

# 6. Early-preset budget top-up to reference epochs (cheap at 192²:
#    ~300-1200s per model at 120 ep r2 measure): cnn_two/four/five at 500,
#    cnn_six at 200 (CNNOne_192/CNN_One.py:103, CNNSix_192/CNN_Six.py).
if $have_data && [ "$(remaining)" -ge 7200 ] \
   && [ ! -f docs/artifacts/ml_early_ref_budget/summary.json ]; then
  say "RUN early-topup-500"
  timeout -k 30 5400 python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 3 --log "$LOGDIR/early500.log" -- \
      python scripts/train_early_presets.py \
        --models cnn_two,cnn_four,cnn_five --epochs 500 \
        --seven-384-epochs 0 --out docs/artifacts/ml_early_ref_budget
  say "DONE early-topup-500 rc=$?"
fi
if $have_data && [ "$(remaining)" -ge 2400 ] \
   && [ ! -f docs/artifacts/ml_early_ref_budget/cnn_six_192/cnn_six_x.msgpack ]; then
  say "RUN early-topup-six-200"
  timeout -k 30 1800 python scripts/tpu_watchdog.py \
      --stall-seconds 900 --max-restarts 2 --log "$LOGDIR/early200.log" -- \
      python scripts/train_early_presets.py \
        --models cnn_six --epochs 200 \
        --seven-384-epochs 0 --out docs/artifacts/ml_early_ref_budget
  say "DONE early-topup-six-200 rc=$?"
fi

say "chain_r5 complete; $(remaining)s to deadline"
