#!/usr/bin/env python
"""Backend MLUPS sweep on the current JAX default device.

Times any subset of the time-loop backends at given grid sizes and appends
JSON records to ``docs/artifacts/bench_backends.jsonl``.  Used for the
RESULTS.md performance tables (reference metric: MLUPS, MRTTiledPull.py:703).

Usage:
  python scripts/bench_backends.py --backends pallas,sharded-tblock \
      --sizes 1024,2048,4096 [--mesh 1x1] [--steps 3000] [--collision mrt]

Note: first Mosaic compile of a new kernel shape costs minutes on the remote
TPU helper; the warmup chunk absorbs it and is excluded from timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(x) -> float:
    return float(np.asarray(x[(0,) * x.ndim]))


def make_runner(name: str, cfg, steps: int, mesh_shape, k_steps: int = 16):
    from latticeboltzmannsimulations_tpu import engine

    if name == "fused-jit":
        return engine.make_scan_runner(cfg, steps), lambda s: s
    if name == "pallas":
        from latticeboltzmannsimulations_tpu.kernels import pallas_pull

        return pallas_pull.make_scan_runner(cfg, steps), lambda s: s
    if name == "tblock":
        from latticeboltzmannsimulations_tpu.kernels import pallas_pull_tblock

        return (pallas_pull_tblock.make_scan_runner(cfg, steps,
                                                    k_steps=k_steps),
                lambda s: s)
    if name == "pallas-push":
        from latticeboltzmannsimulations_tpu.kernels import pallas_push

        runner = pallas_push.make_push_scan_runner(cfg, steps)
        # push state is the plain pre-collision field
        return (lambda s: type(s)(f=runner(s.f), rho_lid=s.rho_lid),
                lambda s: s)
    from latticeboltzmannsimulations_tpu.parallel import make_mesh, shard_state

    mesh = make_mesh(mesh_shape)
    if name == "sharded-pallas":
        from latticeboltzmannsimulations_tpu.kernels.pallas_pull_sharded import (
            make_sharded_pallas_runner,
        )

        return (make_sharded_pallas_runner(cfg, steps, mesh),
                lambda s: shard_state(s, mesh))
    if name in ("sharded-tblock", "sharded-tblock-ylanes"):
        from latticeboltzmannsimulations_tpu.kernels.pallas_pull_tblock_sharded import (  # noqa: E501
            make_sharded_tblock_runner,
        )

        # -ylanes forces the y-sharded halo-lane layout on this mesh:
        # measures the padded-lane + lane-exchange tax of 2-D decompositions
        # on one chip.
        return (make_sharded_tblock_runner(
                    cfg, steps, mesh, k_steps=k_steps,
                    force_halo_layout=name.endswith("ylanes")),
                lambda s: shard_state(s, mesh))
    if name == "sharded-jnp":
        from latticeboltzmannsimulations_tpu.parallel.halo import (
            make_sharded_scan_runner,
        )

        return (make_sharded_scan_runner(cfg, steps, mesh),
                lambda s: shard_state(s, mesh))
    raise SystemExit(f"unknown backend {name!r}")


def main() -> int:
    from latticeboltzmannsimulations_tpu import engine
    from latticeboltzmannsimulations_tpu.config import SimConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", default="pallas,sharded-pallas,sharded-tblock")
    ap.add_argument("--sizes", default="1024,2048")
    ap.add_argument("--mesh", default="1x1")
    ap.add_argument("--steps", type=int, default=2000,
                    help="steps per timed chunk")
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--collision", default="mrt")
    ap.add_argument("--k", type=int, default=16,
                    help="temporal-block depth for the tblock backends")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    mesh_shape = tuple(int(v) for v in args.mesh.split("x"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(root, "docs", "artifacts",
                                   "bench_backends.jsonl")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    for size in (int(s) for s in args.sizes.split(",")):
        for name in args.backends.split(","):
            is_sharded = name.startswith("sharded")
            cfg = SimConfig(
                nx=size, ny=size, reynolds=5000.0, collision=args.collision,
                precision="float32",
                mesh_shape=mesh_shape if is_sharded else (1, 1),
            ).validate()
            try:
                runner, prep = make_runner(name, cfg, args.steps, mesh_shape,
                                           k_steps=args.k)
                state = prep(engine.init_state(cfg))
                t0 = time.perf_counter()
                state = runner(state)      # warmup: absorbs compile
                _force(state.f)
                t_compile = time.perf_counter() - t0
            except Exception as e:
                print(f"{name}@{size}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
                continue
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                state = runner(state)
            _force(state.f)
            dt = time.perf_counter() - t0
            mlups = size * size * args.steps * args.chunks * 1e-6 / dt
            rec = {
                "backend": name, "size": size, "collision": args.collision,
                "mesh": list(mesh_shape) if is_sharded else [1, 1],
                "mlups": round(mlups, 1), "compile_s": round(t_compile, 1),
                "steps": args.steps * args.chunks,
                **({"k": args.k} if "tblock" in name else {}),
            }
            print(json.dumps(rec), flush=True)
            with open(out, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
