"""Fidelity probes: compressibility (Ma^2) error vs the Ghia <1% gate, and
LES stabilization at Re=3200.  Writes docs/artifacts/probes.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import latticeboltzmannsimulations_tpu as lbt
from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate

ART = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts")

RUNS = [
    # name, nx, re, collision, turbulence, u_lid, max_steps
    ("re400_192_srt", 192, 400.0, "srt", "none", 0.08, 1_500_000),
    ("re1000_512_mrt_long", 512, 1000.0, "mrt", "none", 0.08, 8_000_000),
    ("re10000_512_mrt_les", 512, 10000.0, "mrt", "smagorinsky", 0.08, 3_000_000),
]


def main():
    os.makedirs(ART, exist_ok=True)
    rows = []
    for name, nx, re, coll, turb, ulid, max_steps in RUNS:
        cfg = lbt.SimConfig(
            nx=nx, ny=nx, reynolds=re, collision=coll, turbulence=turb,
            u_lid=ulid, precision="float32", max_steps=max_steps,
            report_interval=200_000,
        ).validate()
        t0 = time.perf_counter()
        s = simulate(cfg, SimOptions(
            out_dir=os.path.join(ART, name), project=name,
            save_plots=True, backend="auto", verbose=True,
        ))
        rows.append({
            "name": name, "grid": nx, "re": re, "u_lid": ulid,
            "steps": s.steps, "converged": s.converged,
            "r2_ux": s.r2_ux, "l2_pct": 100 * s.l2_combined,
            "wall_s": round(time.perf_counter() - t0, 1),
        })
        print(json.dumps(rows[-1]))
    with open(os.path.join(ART, "probes.json"), "w") as fh:
        json.dump(rows, fh, indent=2)


if __name__ == "__main__":
    main()
