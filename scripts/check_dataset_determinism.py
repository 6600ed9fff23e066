#!/usr/bin/env python
"""Compare a rebuilt sweep dataset against the committed r4 metadata record.

The machine was re-provisioned twice during r5 (gitignored ``data/`` wiped),
so the 500-cavity dataset was regenerated from scratch.  The sweep is
deterministic by construction (same SimConfig, same batch partition, same
convergence gate, XLA f32 on the same chip), so the rebuilt dataset should
reproduce the r4 per-chunk record exactly: same cumulative ``steps`` and the
same ``converged`` count per chunk.  This script checks that claim
chunk-by-chunk against ``docs/artifacts/ml_full/dataset_metadata.json`` and
prints any mismatches — evidence either of reproducibility (ML retrains are
then controlled experiments on the *same* data) or of an environment drift
worth recording.

Usage: python scripts/check_dataset_determinism.py [new_metadata] [old_record]
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(new_path: str | None = None, old_path: str | None = None) -> int:
    new_path = new_path or os.path.join(ROOT, "data", "ml_full",
                                        "metadata.json")
    old_path = old_path or os.path.join(ROOT, "docs", "artifacts", "ml_full",
                                        "dataset_metadata.json")
    new = json.load(open(new_path))
    old = json.load(open(old_path))

    mismatches = []
    for field in ("grid", "n", "re", "collision", "turbulence", "u_lid",
                  "max_steps", "sweep_max_steps"):
        if new.get(field) != old.get(field):
            mismatches.append(f"{field}: old={old.get(field)} "
                              f"new={new.get(field)}")

    old_chunks = {(c["re_lo"], c["re_hi"]): c for c in old["chunks"]}
    new_chunks = {(c["re_lo"], c["re_hi"]): c for c in new["chunks"]}
    if set(old_chunks) != set(new_chunks):
        mismatches.append(
            f"chunk partition differs: {len(old_chunks)} vs "
            f"{len(new_chunks)} chunks; only-old="
            f"{sorted(set(old_chunks) - set(new_chunks))[:3]} only-new="
            f"{sorted(set(new_chunks) - set(old_chunks))[:3]}")
    agree = 0
    for key in sorted(set(old_chunks) & set(new_chunks)):
        o, n = old_chunks[key], new_chunks[key]
        if (o["steps"], o["converged"]) == (n["steps"], n["converged"]):
            agree += 1
        else:
            mismatches.append(
                f"chunk Re[{key[0]:.0f}..{key[1]:.0f}]: "
                f"old steps={o['steps']} conv={o['converged']} | "
                f"new steps={n['steps']} conv={n['converged']}")

    total = len(set(old_chunks) & set(new_chunks))
    print(f"chunks agreeing (steps+converged): {agree}/{total}")
    print(f"converged_cavities: old={old['converged_cavities']} "
          f"new={new['converged_cavities']}")
    for m in mismatches:
        print("MISMATCH:", m)
    print("DETERMINISTIC" if not mismatches else
          f"{len(mismatches)} mismatches")
    return 0 if not mismatches else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
