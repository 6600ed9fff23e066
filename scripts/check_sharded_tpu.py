#!/usr/bin/env python
"""Compiled-kernel trajectory check on real TPU: the sharded per-step and
temporally-blocked backends must match the fused jit engine bit-for-bit
(f32) on a 1-chip mesh — same contract the interpret-mode tests pin on the
CPU mesh, here exercised through the *compiled* Mosaic path.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/check_sharded_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latticeboltzmannsimulations_tpu import engine  # noqa: E402
from latticeboltzmannsimulations_tpu.config import SimConfig  # noqa: E402
from latticeboltzmannsimulations_tpu.parallel import make_mesh, shard_state  # noqa: E402


def main() -> int:
    n = 48
    cfg = SimConfig(nx=512, ny=512, reynolds=1000.0, collision="mrt",
                    precision="float32").validate()
    ref = engine.init_state(cfg)
    step = engine.make_scan_runner(cfg, n)
    ref = step(ref)
    ref_f = np.asarray(ref.f)

    mesh = make_mesh((1, 1))
    failures = 0
    for name in ("pallas", "tblock",
                 "sharded-pallas", "sharded-tblock", "sharded-tblock-ylanes",
                 "sharded-tblock-rdma"):
        t0 = time.perf_counter()
        if name == "pallas":
            # Plain single-chip kernels through the compiled Mosaic path —
            # added with the grouped gather schedule (r4) so the headline
            # kernel's trajectory pin is also exercised on chip, not only in
            # interpret mode.
            from latticeboltzmannsimulations_tpu.kernels import pallas_pull

            runner = pallas_pull.make_scan_runner(cfg, n)
        elif name == "tblock":
            from latticeboltzmannsimulations_tpu.kernels import (
                pallas_pull_tblock,
            )

            runner = pallas_pull_tblock.make_scan_runner(cfg, n, k_steps=16)
        elif name == "sharded-pallas":
            from latticeboltzmannsimulations_tpu.kernels.pallas_pull_sharded import (  # noqa: E501
                make_sharded_pallas_runner,
            )

            runner = make_sharded_pallas_runner(cfg, n, mesh)
        else:
            from latticeboltzmannsimulations_tpu.kernels.pallas_pull_tblock_sharded import (  # noqa: E501
                make_sharded_tblock_runner,
            )

            # -ylanes drives the y-sharded halo-lane layout (content-keyed
            # wall masks, padded lanes, self-exchange rings) through the
            # compiled Mosaic path — the only way to validate it on 1 chip.
            # -rdma drives the in-kernel DMA halo wrap (halo_rdma.py local
            # variant) through the compiled path likewise.
            runner = make_sharded_tblock_runner(
                cfg, n, mesh, k_steps=16,
                force_halo_layout=name.endswith("ylanes"),
                halo_impl="rdma" if name.endswith("rdma") else "ppermute")
        st0 = engine.init_state(cfg)
        if name.startswith("sharded"):
            st0 = shard_state(st0, mesh)
        out = runner(st0)
        out_f = np.asarray(out.f)
        dt = time.perf_counter() - t0
        if np.array_equal(out_f, ref_f):
            print(f"{name}: bit-identical after {n} steps "
                  f"({dt:.0f}s incl. compile)", flush=True)
        else:
            bad = np.sum(out_f != ref_f)
            print(f"{name}: MISMATCH {bad} cells, max|d|="
                  f"{np.max(np.abs(out_f - ref_f)):.3e}", flush=True)
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main())
