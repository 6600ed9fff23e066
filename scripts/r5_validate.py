#!/usr/bin/env python
"""Round-5 validation stage (VERDICT r4 next #1, #4, #5) on real TPU.

Three groups, every run artifact-guarded (a ``.r5_done`` marker in its
output dir skips it on chain restart):

A. BC-closure controls at flagship resolution — the one unmet BASELINE
   number is "<1% L2 vs Ghia @ Re=1000", and the Re=100 gate showed the
   Zou-He tangential lid at HALF the production reduced-NEBB's L2
   (docs/artifacts/slow_gates.json: 0.55% vs ~1.1%).  Runs Re=1000 @512²
   MRT with boundary="nebb_tangential" (fused-jit path, r5) and
   boundary="bounce_back" (push-oracle) under the exact current harness.
   Either the gate is met literally or the ~1.8% plateau claim upgrades to
   "BC-controlled" (reference anchor: the commented tangential experiment
   at MRT.py:461-482).

B. Stale-rollup re-measures — re3200_384_mrt_les / re3200_384_srt_les /
   re400_192_srt were scored under the pre-r4 harness (typo-poisoned CSV,
   pre suspect-station).  Re-run in place so validation_rollup.json is
   single-protocol; the old metrics are preserved as *_pre_r5.jsonl.

C. Convergence-gate runs — every flagship row says ``converged: false``
   because the |d mean u|/uLB < 1e-8 test is applied per 100-200k-step
   interval while the reference applies it per ~1k steps
   (MRTtest.py:915-921).  Re-runs the two flagship configs with
   report_interval=10_000 (still 10x stricter per-step than the
   reference's gate) so the gate can actually fire; if it does not, the
   metrics JSONL records the measured floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import latticeboltzmannsimulations_tpu as lbt  # noqa: E402
from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts")

# name, nx, Re, collision, turbulence, boundary, max_steps, report_interval
RUNS = [
    # A. BC-closure controls (nebb rows for comparison already exist:
    #    re1000_512_mrt 1.9% @1.5M, re1000_512_mrt_mc 1.775% @8M — the L2
    #    plateau is flat from 1.2M, so 4M comfortably reaches it).
    ("re1000_512_tang", 512, 1000.0, "mrt", "none", "nebb_tangential",
     4_000_000, 100_000),
    ("re1000_512_bb", 512, 1000.0, "mrt", "none", "bounce_back",
     1_500_000, 100_000),
    # B. Stale rollup rows, re-measured under the current harness.
    ("re3200_384_mrt_les", 384, 3200.0, "mrt", "smagorinsky", "nebb",
     2_000_000, 200_000),
    ("re3200_384_srt_les", 384, 3200.0, "srt", "smagorinsky", "nebb",
     2_000_000, 200_000),
    ("re400_192_srt", 192, 400.0, "srt", "none", "nebb",
     1_600_000, 200_000),
    # C. Convergence-gate runs (fine report interval).
    ("re1000_512_mrt_fine", 512, 1000.0, "mrt", "none", "nebb",
     4_000_000, 10_000),
    ("re3200_384_mrt_fine", 384, 3200.0, "mrt", "none", "nebb",
     8_000_000, 10_000),
    # D. BASELINE config 3, literally: "Re=10000 cavity at 1024^2, tiled
    #    Pallas pull-streaming with VMEM-resident tiles" — the Re=10^4 LES
    #    physics row existed only at 512^2 (docs/artifacts/
    #    re10000_512_mrt_les); this is the same config at the named grid.
    ("re10000_1024_mrt_les", 1024, 10000.0, "mrt", "smagorinsky", "nebb",
     3_000_000, 150_000),
]


def main() -> int:
    only = set(sys.argv[1:])
    rows_path = os.path.join(ART, "validation_r5.json")
    rows = json.load(open(rows_path)) if os.path.exists(rows_path) else []
    done_names = {r["name"] for r in rows}
    for name, nx, re, coll, turb, bc, max_steps, interval in RUNS:
        if only and name not in only:
            continue
        out_dir = os.path.join(ART, name)
        marker = os.path.join(out_dir, ".r5_done")
        if os.path.exists(marker):
            print(f"skip {name} (marker present)", flush=True)
            continue
        os.makedirs(out_dir, exist_ok=True)
        # Preserve pre-r5 metrics of in-place re-measured runs.
        old = os.path.join(out_dir, f"{name}_metrics.jsonl")
        if os.path.exists(old) and name not in done_names:
            os.replace(old, os.path.join(out_dir, f"{name}_metrics_pre_r5.jsonl"))
        cfg = lbt.SimConfig(
            nx=nx, ny=nx, reynolds=re, collision=coll, turbulence=turb,
            boundary=bc, precision="float32", max_steps=max_steps,
            report_interval=interval,
        ).validate()
        t0 = time.perf_counter()
        s = simulate(cfg, SimOptions(
            out_dir=out_dir, project=name, save_plots=True,
            backend="auto", verbose=True,
        ))
        rec = {
            "name": name, "grid": nx, "re": re, "collision": coll,
            "turbulence": turb, "boundary": bc, "steps": s.steps,
            "report_interval": interval, "converged": s.converged,
            "r2_ux": s.r2_ux, "l2_pct": 100 * s.l2_combined,
            "mlups": s.mlups, "wall_s": round(time.perf_counter() - t0, 1),
        }
        rows = [r for r in rows if r["name"] != name] + [rec]
        with open(rows_path, "w") as fh:
            json.dump(rows, fh, indent=1)
        open(marker, "w").write("r5\n")
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
