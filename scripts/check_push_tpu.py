#!/usr/bin/env python
"""Compiled-path check of the Pallas push kernel on real TPU: drive the
Mosaic-compiled kernel N steps against the jitted push oracle on the same
chip and compare trajectories (expected agreement: ulp-level — the XLA:TPU
oracle and the Mosaic kernel contract FMAs differently, same as on CPU; a
real streaming/wall bug would show at 1e-2).  Appends a JSON record to
docs/artifacts/check_push_tpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from latticeboltzmannsimulations_tpu import engine  # noqa: E402
from latticeboltzmannsimulations_tpu.config import SimConfig  # noqa: E402
from latticeboltzmannsimulations_tpu.kernels import pallas_push  # noqa: E402


def main() -> int:
    n_steps = 48
    cfg = SimConfig(nx=256, ny=256, reynolds=1000.0, collision="mrt",
                    precision="float32").validate()
    oracle = jax.jit(engine.make_push_oracle_step(cfg))
    runner = pallas_push.make_push_scan_runner(cfg, n_steps)

    f0 = engine.init_state(cfg).f
    t0 = time.time()
    f_k = runner(f0)
    f_k = np.asarray(f_k)
    dt = time.time() - t0
    f_r = f0
    for _ in range(n_steps):
        f_r = oracle(f_r)
    f_r = np.asarray(f_r)

    max_abs = float(np.abs(f_k - f_r).max())
    rel = max_abs / float(np.abs(f_r).max())
    ok = bool(np.isfinite(f_k).all()) and rel < 1e-5
    rec = {
        "check": "pallas_push_vs_oracle_compiled",
        "grid": [cfg.nx, cfg.ny], "collision": cfg.collision,
        "steps": n_steps, "max_abs_diff": max_abs, "rel_diff": rel,
        "compile_plus_run_s": round(dt, 1), "ok": ok,
    }
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "check_push_tpu.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
