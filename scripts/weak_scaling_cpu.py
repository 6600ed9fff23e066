#!/usr/bin/env python
"""Weak-scaling shape check on the virtual CPU mesh (VERDICT r4 next #8).

One physical core serves every virtual device, so wall time cannot show
*parallel* speedup; what it CAN ground is the cost model's overhead term:
at a fixed per-shard block, total compute per step grows linearly with the
device count while the halo/shard_map machinery adds whatever it adds — so
**per-global-site step cost** should stay flat across meshes iff the
exchange overhead is O(edge) and small, exactly what docs/SCALING.md
predicts.  Deviation from flat IS the measured sharding overhead.

Runs the compiled jnp sharded engine (the temporally-blocked Pallas kernel
only *interprets* on CPU — interpreter overhead would dominate any number,
so it is attested by bit-equality tests + the dry run instead; the r4
measured tblock MLUPS in CLAUDE.md are real-chip numbers).

Each mesh runs in a fresh subprocess (XLA device count is fixed at init).

Usage: python scripts/weak_scaling_cpu.py          # writes the JSON artifact
       python scripts/weak_scaling_cpu.py --child 2x4   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "docs", "artifacts")
BLOCK = 256          # per-shard block edge (fixed: weak scaling)
STEPS = 200
REPS = 3
MESHES = [(1, 1), (2, 2), (2, 4)]


def child(mesh_str: str) -> int:
    mx, my = (int(v) for v in mesh_str.split("x"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, ROOT)
    from latticeboltzmannsimulations_tpu import engine
    from latticeboltzmannsimulations_tpu.config import SimConfig
    from latticeboltzmannsimulations_tpu.parallel import (
        make_mesh, make_sharded_scan_runner, shard_state,
    )

    cfg = SimConfig(nx=BLOCK * mx, ny=BLOCK * my, reynolds=1000.0,
                    collision="mrt", precision="float32",
                    mesh_shape=(mx, my)).validate()
    mesh = make_mesh((mx, my))
    runner = make_sharded_scan_runner(cfg, STEPS, mesh)
    state = shard_state(engine.init_state(cfg), mesh)
    state = runner(state)                      # compile + warm
    float(np.asarray(state.f[0, 0, 0]))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        state = runner(state)
        float(np.asarray(state.f[0, 0, 0]))    # force execution
        best = min(best, time.perf_counter() - t0)
    # Control: the UNSHARDED fused engine at the same *global* grid on one
    # device, separating cache-footprint growth (present in both) from the
    # halo/shard_map overhead (present only in the sharded run).
    cfg1 = SimConfig(nx=cfg.nx, ny=cfg.ny, reynolds=1000.0, collision="mrt",
                     precision="float32").validate()
    runner1 = engine.make_scan_runner(cfg1, STEPS)
    s1 = engine.init_state(cfg1)
    s1 = runner1(s1)
    float(np.asarray(s1.f[0, 0, 0]))
    best1 = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        s1 = runner1(s1)
        float(np.asarray(s1.f[0, 0, 0]))
        best1 = min(best1, time.perf_counter() - t0)
    sites = cfg.nx * cfg.ny
    rec = {
        "mesh": f"{mx}x{my}", "devices": mx * my,
        "grid": [cfg.nx, cfg.ny], "per_shard": [BLOCK, BLOCK],
        "steps": STEPS, "wall_s": round(best, 4),
        "ns_per_site_step": round(1e9 * best / (sites * STEPS), 3),
        "unsharded_ns_per_site_step": round(
            1e9 * best1 / (sites * STEPS), 3),
        "sharding_overhead_pct": round(100.0 * (best / best1 - 1.0), 1),
    }
    print(json.dumps(rec))
    return 0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        return child(sys.argv[2])
    rows = []
    for mx, my in MESHES:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={mx * my}")
        env["XLA_FLAGS"] = " ".join(flags)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             f"{mx}x{my}"],
            env=env, capture_output=True, text=True, timeout=1200, cwd=ROOT,
        )
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            return out.returncode
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    base = rows[0]["ns_per_site_step"]
    for r in rows:
        r["overhead_vs_1x1_pct"] = round(
            100.0 * (r["ns_per_site_step"] / base - 1.0), 1)
    payload = {
        "note": ("CPU shape check: 1 physical core serves all virtual "
                 "devices, so flat ns/site/step across meshes == the halo/"
                 "shard_map overhead is O(edge)-small; NOT a parallel-"
                 "speedup measurement"),
        "engine": "jnp sharded scan runner (compiled XLA:CPU)",
        "rows": rows,
    }
    path = os.path.join(ART, "weak_scaling_cpu.json")
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
