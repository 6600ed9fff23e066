#!/bin/bash
# Round-4 TPU task chain, ordered cheap->expensive so an early relay death
# still lands the records that matter most.  Run stages selectively:
#   bash scripts/chain_r4.sh quick      # bench capture + compiled checks + gates
#   bash scripts/chain_r4.sh cnn3       # cnn_three faithful retry (watchdogged)
#   bash scripts/chain_r4.sh kprobe     # K=16 vs 24 temporal-block probe
#   bash scripts/chain_r4.sh cnn8       # cnn_eight full-budget faithful run
# Never run near round end: the driver's bench.py must own the chip.
set -u
set -o pipefail  # '... | tee log' must propagate the left side's rc (99!)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOGDIR=/tmp/r4_chain
mkdir -p "$LOGDIR"

stage="${1:-quick}"
case "$stage" in
  quick)
    echo "== bench =="         && timeout 2400 python bench.py 2>"$LOGDIR/bench.err" | tee "$LOGDIR/bench.json"
    # SRT at the same size isolates the collision-operator cost: SRT≈MRT
    # means the kernel is gather/memory-bound (no headroom in an MXU
    # moment-transform offload); SRT>>MRT means the MRT algebra is hot.
    echo "== bench srt =="      && LBM_BENCH_COLLISION=srt LBM_BENCH_CHUNKS=2 \
        timeout 1800 python bench.py 2>>"$LOGDIR/bench.err" | tee "$LOGDIR/bench_srt.json"
    echo "== sharded checks ==" && timeout 2400 python scripts/check_sharded_tpu.py 2>&1 | tee "$LOGDIR/sharded.log"
    echo "== slow gates =="     && timeout 3600 python scripts/slow_gates.py 2>&1 | tee "$LOGDIR/gates.log"
    ;;
  cnn3)
    python scripts/tpu_watchdog.py --stall-seconds 900 --max-restarts 3 \
      --log "$LOGDIR/cnn3.log" -- \
      python scripts/train_early_presets.py --models cnn_three \
        --optimizer rmsprop --lr 1e-4 --schedule inverse --epochs 500 \
        --seven-384-epochs 0
    ;;
  kprobe)
    # inner ceiling < the supervisor's 7200s budget so the probe's own
    # bounded-children logic (and its rc) wins over a blunt outer kill
    timeout -k 30 7000 python scripts/probe_k24.py 2>&1 | tee "$LOGDIR/kprobe.log"
    ;;
  cnn8)
    python scripts/tpu_watchdog.py --stall-seconds 900 --max-restarts 5 \
      --log "$LOGDIR/cnn8.log" -- \
      python scripts/train_eight_faithful.py
    ;;
  *)
    echo "unknown stage $stage" >&2; exit 2;;
esac
