#!/usr/bin/env python
"""Compiled-Mosaic trajectory check of the cy-grouped plane-storage gather
(LBM_PLANE_ORDER=cy) on the real TPU chip: the permuted-layout scan runner
must reproduce the fused jit engine bit-for-bit in f32, exactly like the
lattice-order kernel (same pin scripts/check_sharded_tpu.py establishes for
the other backends).  Writes docs/artifacts/check_plane_order_tpu.json.

Usage: python scripts/check_plane_order_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latticeboltzmannsimulations_tpu import engine  # noqa: E402
from latticeboltzmannsimulations_tpu.config import SimConfig  # noqa: E402
from latticeboltzmannsimulations_tpu.kernels import pallas_pull  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts")


def main() -> int:
    n = 48
    cfg = SimConfig(nx=512, ny=512, reynolds=1000.0, collision="mrt",
                    precision="float32").validate()
    ref = engine.make_scan_runner(cfg, n)(engine.init_state(cfg))
    ref_f = np.asarray(ref.f)

    results = []
    failures = 0
    for order_name, order in (("lattice", None),
                              ("cy", pallas_pull.PLANE_ORDER_CY)):
        t0 = time.perf_counter()
        runner = pallas_pull.make_scan_runner(cfg, n, plane_order=order)
        out = runner(engine.init_state(cfg))
        out_f = np.asarray(out.f)
        dt = time.perf_counter() - t0
        ok = bool(np.array_equal(out_f, ref_f))
        if not ok:
            failures += 1
            bad = int(np.sum(out_f != ref_f))
            print(f"plane_order={order_name}: MISMATCH {bad} cells, "
                  f"max|d|={np.max(np.abs(out_f - ref_f)):.3e}", flush=True)
        else:
            print(f"plane_order={order_name}: bit-identical after {n} steps "
                  f"({dt:.0f}s incl. compile)", flush=True)
        results.append({"plane_order": order_name, "bit_identical": ok,
                        "wall_s": round(dt)})

    with open(os.path.join(ART, "check_plane_order_tpu.json"), "w") as fh:
        json.dump({
            "what": ("compiled-Mosaic trajectory check of the cy-grouped "
                     "plane-storage gather vs the fused jit engine, one TPU "
                     "v5e chip"),
            "script": "scripts/check_plane_order_tpu.py",
            "config": {"nx": cfg.nx, "ny": cfg.ny, "re": cfg.reynolds,
                       "collision": cfg.collision, "steps": n,
                       "precision": cfg.precision},
            "results": results,
        }, fh, indent=1)
    return failures


if __name__ == "__main__":
    sys.exit(main())
