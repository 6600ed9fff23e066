#!/usr/bin/env python
"""Temporal-block depth probe: K=16 vs K=24 at 2048² (then 4096² only if
compiles stay sane) — the measurement r3 never landed because the K=24@4096²
Mosaic compile killed the axon relay for the rest of the round.

Safety rules encoded here (VERDICT r3 next-steps #6):
  * each (size, K) measurement runs in its OWN subprocess with a hard
    timeout, so an over-long remote compile cannot wedge the parent;
  * 2048² first; the 4096² pair only runs if the K=24@2048² compile took
    < COMPILE_CEILING_S (600 s) — ">10-min compiles are a bad sign";
  * results append to docs/artifacts/k_probe.json as they land, so a
    partial probe still records everything measured.

Usage:   python scripts/probe_k24.py             # full probe
         python scripts/probe_k24.py --child N K # internal (one measurement)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

COMPILE_CEILING_S = 600.0
CHILD_TIMEOUT_S = 1500.0
STEPS_PER_CHUNK = 480  # divisible by both 16 and 24
N_CHUNKS = 4


def child(n: int, k: int) -> int:
    import numpy as np

    from latticeboltzmannsimulations_tpu import engine
    from latticeboltzmannsimulations_tpu.config import SimConfig
    from latticeboltzmannsimulations_tpu.kernels.pallas_pull_tblock import (
        make_scan_runner,
    )

    cfg = SimConfig(nx=n, ny=n, reynolds=5000.0, collision="mrt",
                    precision="float32").validate()
    state = engine.init_state(cfg)
    runner = make_scan_runner(cfg, STEPS_PER_CHUNK, k_steps=k)
    t0 = time.perf_counter()
    state = runner(state)
    float(np.asarray(state.f[0, 0, 0]))  # force (relay-safe)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        state = runner(state)
    float(np.asarray(state.f[0, 0, 0]))
    elapsed = time.perf_counter() - t0
    mlups = n * n * STEPS_PER_CHUNK * N_CHUNKS * 1e-6 / elapsed
    print(json.dumps({"n": n, "k": k, "mlups": round(mlups, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return 0


def run_child(n: int, k: int):
    t0 = time.monotonic()
    # Popen + bounded communicate, NOT subprocess.run: run()'s internal
    # TimeoutExpired handler calls kill() then an *untimed* wait(), which
    # blocks forever on a D-state child — the exact r3 wedge this probe
    # exists to survive.
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(n), str(k)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        out, err = proc.communicate(timeout=CHILD_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            out, err = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            # Unkillable child: it may still hold the chip.  fatal=True
            # makes main() stop the whole probe rather than pile a second
            # TPU process on top.
            return {"n": n, "k": k, "fatal": True,
                    "error": "child unkillable after SIGKILL (D-state?)",
                    "wall_s": round(time.monotonic() - t0, 1)}
        # The r3 scenario (over-long compile): record the timeout as a
        # measurement so the 4096² gate sees it and skips.
        return {"n": n, "k": k, "error": f"timeout>{CHILD_TIMEOUT_S:.0f}s",
                "wall_s": round(time.monotonic() - t0, 1)}

    wall = time.monotonic() - t0
    line = next((ln for ln in out.splitlines() if ln.startswith("{")), None)
    if proc.returncode != 0 or line is None:
        sys.stderr.write(err[-2000:])
        return {"n": n, "k": k, "error": f"rc={proc.returncode}",
                "wall_s": round(wall, 1)}
    rec = json.loads(line)
    rec["wall_s"] = round(wall, 1)
    return rec


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(int(sys.argv[2]), int(sys.argv[3]))

    out_path = os.path.join(ROOT, "docs", "artifacts", "k_probe.json")
    records = []
    if os.path.exists(out_path):
        try:
            records = json.load(open(out_path))
        except (json.JSONDecodeError, OSError):
            # a previous run was killed mid-write with the old non-atomic
            # writer; keep the evidence, start a fresh record
            os.replace(out_path, out_path + ".corrupt")
            print(f"previous {out_path} was corrupt; moved aside",
                  file=sys.stderr, flush=True)

    def record(rec):
        records.append(rec)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(records, fh, indent=1)
        os.replace(tmp, out_path)  # atomic: a kill cannot truncate it
        print(json.dumps(rec), flush=True)

    gate_4096 = True
    for k in (16, 24):
        rec = run_child(2048, k)
        record(rec)
        if rec.get("fatal"):
            print("probe aborted: unkillable child may still hold the "
                  "chip", file=sys.stderr, flush=True)
            return 99
        if "error" in rec or rec.get("compile_s", 1e9) > COMPILE_CEILING_S:
            gate_4096 = False
    if not gate_4096:
        print("4096² pair skipped: 2048² compile exceeded the ceiling "
              "or failed (r3 relay-kill guard)", flush=True)
        return 0
    for k in (16, 24):
        if k == 24 and os.environ.get("KPROBE_SKIP_4096_K24"):
            # The exact compile that killed the r3 relay.  When the driver's
            # round-end bench depends on a live relay, the K=24@4096² cell is
            # not worth the risk: record the documented ceiling instead.
            record({"n": 4096, "k": 24, "skipped": True,
                    "reason": "KPROBE_SKIP_4096_K24: the K=24@4096² Mosaic "
                              "compile killed the r3 relay after ~25 min; "
                              "documented compile-cost ceiling, not measured"})
            continue
        rec = run_child(4096, k)
        record(rec)
        if rec.get("fatal"):
            return 99
    return 0


if __name__ == "__main__":
    sys.exit(main())
