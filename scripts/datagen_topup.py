#!/usr/bin/env python
"""Convergence top-up for the full-parity sweep: re-open dataset chunks that
hit the step cap (``scripts/datagen_full.py``), restart each batch from its
*stored* fields, and continue to the reference-parity total budget (3M steps,
``MRT_GPU_datagen.py:61``) or convergence, whichever first.

Restart state: the pull-scheme lid-density carry is reconstructed as the
plain lid-row density of the stored post-collision fields — a one-step
O(feq) perturbation that relaxes immediately at a near-steady state.

Chunks are rewritten in place with updated fields, cumulative ``steps`` and
per-cavity ``hits`` counters, so the pass is itself resumable.  Re-run
``datagen_full.py`` afterwards to reassemble the 4-array dataset.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/datagen_topup.py \
        [--extra-steps 1500000] [--total-cap 3000000]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from latticeboltzmannsimulations_tpu import engine  # noqa: E402
from latticeboltzmannsimulations_tpu.config import SimConfig  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--grid", type=int, default=384)
    ap.add_argument("--n-cav", type=int, default=7)
    ap.add_argument("--extra-steps", type=int, default=1_500_000,
                    help="max additional steps per batch this pass")
    ap.add_argument("--total-cap", type=int, default=3_000_000,
                    help="reference-parity cumulative cap (maxIt 3M)")
    ap.add_argument("--report-interval", type=int, default=5_000)
    ap.add_argument("--tol", type=float, default=1e-7)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = args.data or os.path.join(root, "data", "ml_full")
    chunk_dir = os.path.join(data_dir, "chunks")

    cfg = SimConfig(
        nx=args.grid, ny=args.grid, reynolds=1000.0, collision="srt",
        turbulence="smagorinsky", precision="float32",
        max_steps=args.extra_steps, report_interval=args.report_interval,
        convergence_tol=args.tol,
    ).validate()

    from latticeboltzmannsimulations_tpu.kernels import pallas_pull

    n_cav, nx, ny = args.n_cav, cfg.nx, cfg.ny
    chunk = cfg.report_interval
    runner = pallas_pull.make_sweep_runner(cfg, n_cav, chunk)
    obs_b = jax.jit(jax.vmap(lambda s: engine.observables(cfg, s)))

    @jax.jit
    def check_and_renorm(f, rho_lid):
        fb = f.reshape(9, n_cav, nx, ny).transpose(1, 0, 2, 3)
        lidb = rho_lid.reshape(n_cav, nx)
        rho_b, u_b = obs_b(engine.State(f=fb, rho_lid=lidb))
        scale = (1.0 / jnp.mean(rho_b, axis=(1, 2))).astype(f.dtype)
        f = (f.reshape(9, n_cav, nx, ny) * scale[None, :, None, None]
             ).reshape(f.shape)
        rho_lid = (rho_lid.reshape(n_cav, nx) * scale[:, None]).reshape(-1)
        return f, rho_lid, u_b

    t0 = time.time()
    log_path = os.path.join(data_dir, "topup.jsonl")
    todo = []
    for fn in sorted(os.listdir(chunk_dir)):
        if not fn.endswith(".npz"):
            continue
        with np.load(os.path.join(chunk_dir, fn)) as z:
            steps = int(z["steps"])
            conv = z["converged"] if "converged" in z else None
        if steps >= args.total_cap:
            continue
        if conv is not None and bool(np.all(conv)):
            continue
        # Heuristic for legacy chunks without flags: a batch that stopped
        # short of the original cap converged everywhere.
        if conv is None and steps < 1_500_000:
            continue
        todo.append(fn)
    print(f"{len(todo)} capped chunks to top up", flush=True)

    for fn in todo:
        path = os.path.join(chunk_dir, fn)
        with np.load(path) as z:
            res = z["re"]
            f_c = z["f_final"]          # (b, 9, nx, ny)
            u_c = z["u_final"]
            steps0 = int(z["steps"])
        b = len(res)
        pad = n_cav - b
        fb = np.concatenate([f_c, np.repeat(f_c[-1:], pad, 0)]) if pad else f_c
        f = jnp.asarray(
            np.ascontiguousarray(
                fb.transpose(1, 0, 2, 3).reshape(9, n_cav * nx, ny)))
        rho_lid = jnp.sum(f, axis=0)[:, 0]  # lid-row density carry
        res_pad = np.concatenate([res, np.repeat(res[-1:], pad)])
        omegas = jnp.asarray(
            [dataclasses.replace(cfg, reynolds=float(r)).omega
             for r in res_pad], dtype=cfg.dtype)

        budget = min(args.extra_steps, args.total_cap - steps0)
        mean_past = np.full(n_cav, np.inf)
        hits = np.zeros(n_cav, dtype=int)
        steps = 0
        while steps < budget:
            state = runner(engine.State(f=f, rho_lid=rho_lid), omegas)
            steps += chunk
            f, rho_lid, u_b = check_and_renorm(state.f, state.rho_lid)
            mean_u = np.asarray(u_b).mean(axis=(1, 2, 3), dtype=np.float64)
            if not np.all(np.isfinite(mean_u[:b])):
                raise FloatingPointError(f"divergence in top-up of {fn}")
            done = np.abs(mean_u - mean_past) / cfg.u_lid < cfg.convergence_tol
            hits = np.where(done, hits + 1, 0)
            mean_past = mean_u
            if np.all(hits[:b] > cfg.convergence_hits):
                break
        fb2 = np.asarray(f.reshape(9, n_cav, nx, ny).transpose(1, 0, 2, 3))
        lidb = np.asarray(rho_lid.reshape(n_cav, nx))
        _, u_b = obs_b(engine.State(f=jnp.asarray(fb2),
                                    rho_lid=jnp.asarray(lidb)))
        conv = hits[:b] > cfg.convergence_hits
        np.savez_compressed(
            path, re=res, f_final=fb2[:b], u_final=np.asarray(u_b)[:b],
            steps=steps0 + steps, converged=conv,
        )
        msg = {"chunk": fn, "re_lo": float(res[0]), "extra_steps": steps,
               "total_steps": steps0 + steps,
               "converged": int(conv.sum()), "of": b,
               "elapsed_s": round(time.time() - t0, 1)}
        print(json.dumps(msg), flush=True)
        with open(log_path, "a") as fh:
            fh.write(json.dumps(msg) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
