#!/usr/bin/env python
"""Regenerate docs/artifacts/validation_rollup.json from the per-run metrics.

Each validation run directory (``docs/artifacts/re*/``) carries a
``<name>_metrics.jsonl`` whose last row is the run's final record
(``final: true`` — written by ``io/metrics.py``).  The rollup is a pure
mechanical aggregation of those rows, so it can never drift from the
artifacts the way the r2-era hand-assembled file did after the r4
re-measures refreshed three directories in place.

Usage:  python scripts/rollup_validation.py
"""

from __future__ import annotations

import glob
import json
import os

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts")

# Context a bare number would misrepresent (full stories in docs/RESULTS.md).
# The three rows the r4 rollup carried with "scored pre-correction" notes
# (re3200_384_{mrt,srt}_les, re400_192_srt) were RE-MEASURED in place under
# the current harness by scripts/r5_validate.py — every row is now
# single-protocol; the superseded metrics live in *_metrics_pre_r5.jsonl.
NOTES = {
    "re1000_512_tang": "BC-closure control: Zou-He tangential lid "
                       "(boundary=nebb_tangential); see RESULTS.md",
    "re1000_512_bb": "BC-closure control: halfway bounce-back walls; "
                     "see RESULTS.md",
}


def main() -> int:
    rows = []
    for path in sorted(glob.glob(os.path.join(ART, "re*", "*_metrics.jsonl"))):
        name = os.path.basename(os.path.dirname(path))
        with open(path) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        if not lines:
            continue
        rec = json.loads(lines[-1])
        if not rec.get("final"):
            continue
        row = {
            "run": name,
            "steps": int(rec["step"]),
            "r2_ux": round(float(rec["r2_ux"]), 5),
            "l2_pct": round(100.0 * float(rec["l2"]), 3),
            "mlups": round(float(rec["mlups"]), 1),
        }
        if name in NOTES:
            row["note"] = NOTES[name]
        rows.append(row)
    out = os.path.join(ART, "validation_rollup.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
        fh.write("\n")
    print(f"{out}: {len(rows)} runs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
