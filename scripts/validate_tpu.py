"""Flagship physics validation on real TPU hardware: the BASELINE.md configs.

Runs converged cavities at the Ghia Reynolds numbers on the Pallas backend
and records R2/L2 + dashboards into docs/artifacts/ and docs/RESULTS.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import latticeboltzmannsimulations_tpu as lbt
from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate

ART = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts")

RUNS = [
    # (name, nx, Re, collision, turbulence, max_steps)
    # 256^2 plateaus at L2=1.9% (discretization-limited); 512^2 passes the
    # <1% BASELINE gate.  High-Re transients decay on the viscous timescale
    # ~nx^2/nu, hence the multi-million-step budgets.
    ("re1000_512_mrt", 512, 1000.0, "mrt", "none", 1_500_000),
    ("re3200_384_mrt", 384, 3200.0, "mrt", "none", 4_000_000),
    ("re5000_384_mrt_les", 384, 5000.0, "mrt", "smagorinsky", 1_500_000),
]


def main():
    os.makedirs(ART, exist_ok=True)
    rows = []
    for name, nx, re, coll, turb, max_steps in RUNS:
        cfg = lbt.SimConfig(
            nx=nx, ny=nx, reynolds=re, collision=coll, turbulence=turb,
            precision="float32", max_steps=max_steps, report_interval=100_000,
        ).validate()
        t0 = time.perf_counter()
        s = simulate(cfg, SimOptions(
            out_dir=os.path.join(ART, name), project=name,
            save_plots=True, backend="auto", verbose=True,
        ))
        rows.append({
            "name": name, "grid": nx, "re": re, "collision": coll,
            "turbulence": turb, "steps": s.steps, "converged": s.converged,
            "r2_ux": s.r2_ux, "l2_pct": 100 * s.l2_combined,
            "mlups": s.mlups, "wall_s": round(time.perf_counter() - t0, 1),
        })
        print(json.dumps(rows[-1]))
    with open(os.path.join(ART, "validation.json"), "w") as fh:
        json.dump(rows, fh, indent=2)


if __name__ == "__main__":
    main()
