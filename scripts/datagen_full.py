#!/usr/bin/env python
"""Full-parity dataset generation (VERDICT r1 missing #2): 500 converged
cavities at 384², Re = 100..5090 step 10, SRT + Smagorinsky, convergence
gated — the reference sweep (``MRT_GPU_datagen.py:55-57,68,866-872``) run
batched: ``n_cav`` cavities stacked along x advance through ONE Pallas
dispatch (the width-2688 stack stays on the VMEM-residency fast path).

Incremental + resumable: each converged batch is saved to
``data/ml_full/chunks/`` immediately; re-running skips finished Re values
and finally assembles the reference's 4-file .npy layout in
``data/ml_full/``.

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/datagen_full.py \
            [--grid 384] [--n-cav 7] [--max-steps 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latticeboltzmannsimulations_tpu.config import SimConfig  # noqa: E402
from latticeboltzmannsimulations_tpu.ml import datagen  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=384)
    ap.add_argument("--n-cav", type=int, default=7,
                    help="cavities stacked per dispatch (7*384=2688 wide "
                         "stays VMEM-resident on v5e)")
    ap.add_argument("--max-steps", type=int, default=1_500_000)
    ap.add_argument("--report-interval", type=int, default=5_000)
    # Reference datagen convergence: |d mean(u)|/uLB < 1e-7 sustained,
    # checked per interval (MRT_GPU_datagen.py:729-733; maxIt 3M at :61).
    # The framework-wide default (1e-8, MRTtest.py heritage) is 10x stricter
    # and never fires within a practical cap at 384^2.
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--re-start", type=float, default=100.0)
    ap.add_argument("--re-stop", type=float, default=5100.0)
    ap.add_argument("--re-step", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--assemble-partial", action="store_true",
                    help="skip generation and assemble the 4-file layout "
                         "from whatever chunks exist (subset of Re values); "
                         "for bounded sweeps cut off by a time budget")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(root, "data", "ml_full")
    chunk_dir = os.path.join(out_dir, "chunks")
    os.makedirs(chunk_dir, exist_ok=True)

    cfg = SimConfig(
        nx=args.grid, ny=args.grid, reynolds=1000.0, collision="srt",
        turbulence="smagorinsky", precision="float32",
        max_steps=args.max_steps, report_interval=args.report_interval,
        convergence_tol=args.tol,
    ).validate()

    re_all = np.arange(args.re_start, args.re_stop, args.re_step,
                       dtype=np.float64)

    def chunk_path(re0: float) -> str:
        return os.path.join(chunk_dir, f"re{re0:08.1f}.npz")

    # Resume: drop Re values whose batch chunk already exists.  Batches are
    # formed sequentially from the remaining list, so chunks are keyed by
    # their first Re value.
    done = set()
    for fn in os.listdir(chunk_dir):
        if fn.endswith(".npz"):
            with np.load(os.path.join(chunk_dir, fn)) as z:
                done.update(float(r) for r in z["re"])
    remaining = np.asarray([r for r in re_all if float(r) not in done])
    print(f"{len(re_all)} Re values total, {len(done)} done, "
          f"{len(remaining)} remaining", flush=True)

    t_start = time.time()
    log_path = os.path.join(out_dir, "progress.jsonl")

    def on_batch(res, f_chunk, u_chunk, steps, converged, failed=None):
        if failed is None:
            failed = np.zeros(len(res), dtype=bool)
        np.savez_compressed(
            chunk_path(float(res[0])), re=res,
            f_final=f_chunk, u_final=u_chunk, steps=steps,
            converged=converged, failed=failed,
        )
        with open(log_path, "a") as fh:
            fh.write(json.dumps({
                "re_lo": float(res[0]), "re_hi": float(res[-1]),
                "steps": int(steps), "failed": int(np.sum(failed)),
                "elapsed_s": round(time.time() - t_start, 1),
            }) + "\n")

    def progress(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    # Batches are consecutive Re groups (similar convergence times, so a
    # batch's slowest member wastes little of the others' work), but the
    # batches themselves run in bit-reversed order: a sweep cut off by a
    # time budget then covers the WHOLE Re range at reduced density instead
    # of only the low end, and --assemble-partial can build a usable
    # training set from it.
    if len(remaining) and not args.assemble_partial:
        reordered = datagen.bit_reversed_batches(remaining, args.n_cav)
        datagen.generate_dataset(cfg, reordered, batch_size=args.n_cav,
                                 progress=progress, on_batch=on_batch)

    # Assemble the reference 4-file layout from the chunks.
    print("assembling...", flush=True)
    chunks = {}
    chunk_stats = []
    for fn in sorted(os.listdir(chunk_dir)):
        if fn.endswith(".npz"):
            z = np.load(os.path.join(chunk_dir, fn))
            b = len(z["re"])
            conv = (z["converged"] if "converged" in z
                    else np.zeros(b, dtype=bool))
            fail = z["failed"] if "failed" in z else np.zeros(b, dtype=bool)
            for i, r in enumerate(z["re"]):
                chunks[float(r)] = (z["f_final"][i], z["u_final"][i],
                                    bool(fail[i]))
            chunk_stats.append({
                "re_lo": float(z["re"][0]), "re_hi": float(z["re"][-1]),
                "steps": int(z["steps"]), "converged": int(np.sum(conv)),
                "failed": int(np.sum(fail)), "of": b,
            })
    missing = [r for r in re_all if float(r) not in chunks]
    if missing and args.assemble_partial:
        re_all = np.asarray([r for r in re_all if float(r) in chunks])
        print(f"partial assembly: {len(re_all)} of "
              f"{len(re_all) + len(missing)} Re values", flush=True)
        if len(re_all) == 0:
            return 1
    elif missing:
        print(f"STILL MISSING {len(missing)} Re values: {missing[:5]}...",
              file=sys.stderr)
        return 1
    from latticeboltzmannsimulations_tpu import engine
    state0 = engine.init_state(cfg)
    n, g = len(re_all), args.grid
    f_final = np.empty((n, 9, g, g), np.float32)
    u_final = np.empty((n, 2, g, g), np.float32)
    failed = np.zeros(n, dtype=bool)
    for i, r in enumerate(re_all):
        f_final[i], u_final[i], failed[i] = chunks[float(r)]
    ds = datagen.DatasetArrays(
        re_range=re_all, feq_initial=np.asarray(state0.f),
        f_final=f_final, u_final=u_final,
        failed=failed if failed.any() else None,
    )
    datagen.save_dataset(ds, out_dir)
    steps_arr = np.asarray([c["steps"] for c in chunk_stats])
    meta = {
        "grid": g, "n": n, "re": [float(re_all[0]), float(re_all[-1])],
        "collision": cfg.collision, "turbulence": cfg.turbulence,
        "u_lid": cfg.u_lid,
        # The budget actually applied: max cumulative steps over chunks.
        # Chunks topped up to the reference-parity 3M budget by
        # scripts/datagen_topup.py report their total steps + per-cavity
        # converged counts here (reference: MRT_GPU_datagen.py:61 maxIt=3M).
        "max_steps": int(steps_arr.max()) if len(steps_arr) else 0,
        "sweep_max_steps": args.max_steps,
        "converged_cavities": int(sum(c["converged"] for c in chunk_stats)),
        "failed_cavities": int(sum(c["failed"] for c in chunk_stats)),
        "chunks": chunk_stats,
        "shapes": {"f_final": list(f_final.shape),
                   "u_final": list(u_final.shape)},
        "elapsed_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    print(f"dataset written to {out_dir}: f_final {f_final.shape}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
