"""Headline benchmark: MLUPS at 1024x1024 D2Q9 MRT lid-driven cavity.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: 2000 MLUPS/chip (BASELINE.md build target; the reference's best
measured GPU number is 3456 MLUPS at 640^2 SRT, CythonPerformance.ods).

MLUPS = nx * ny * steps * 1e-6 / elapsed   (reference: MRTTiledPull.py:703)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np


def _force(x) -> float:
    """Force execution with a scalar fetch (block_until_ready does not block
    over the axon TPU relay)."""
    return float(np.asarray(x[(0,) * x.ndim]))


def _tpu_backend_alive(timeout_s: float = 240.0) -> bool:
    """Probe the TPU backend in a killable SUBPROCESS (a dead axon relay
    hangs backend init rather than raising — BENCH_r03 failure mode).
    Shared hardened implementation: ``relay_probe.backend_answers``."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import relay_probe

    return relay_probe.backend_answers(timeout_s)


def _reexec_on_cpu() -> None:
    """Replace this process with a CPU-pinned copy of the benchmark (small
    step budget — CPU is ~3 orders slower) so a dead relay still produces
    an honest, clearly-labeled record instead of rc!=0."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # stop sitecustomize's TPU hook
    env["_LBM_BENCH_CPU_FALLBACK"] = "1"
    env.setdefault("LBM_BENCH_CHUNK", "100")
    env.setdefault("LBM_BENCH_CHUNKS", "4")
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def main() -> None:
    # Dead-relay guard: if this process is pointed at the axon TPU tunnel,
    # prove the backend answers (twice, with a pause — transient drops do
    # recover) BEFORE importing anything that would trigger backend init in
    # this process.  A dead relay hangs init, so only a subprocess probe is
    # safe.  Falls back to a clearly-labeled CPU record rather than hanging
    # into the driver's kill timeout.  LBM_BENCH_NO_FALLBACK=1 disables.
    cpu_fallback = os.environ.get("_LBM_BENCH_CPU_FALLBACK") == "1"
    if (not cpu_fallback
            and os.environ.get("PALLAS_AXON_POOL_IPS")
            and os.environ.get("LBM_BENCH_NO_FALLBACK") != "1"):
        for attempt in range(2):
            if _tpu_backend_alive():
                break
            print(f"TPU backend probe {attempt + 1} failed",
                  file=sys.stderr, flush=True)
            if attempt == 0:
                time.sleep(60)
        else:
            print("TPU relay dead; re-running the benchmark on CPU",
                  file=sys.stderr, flush=True)
            _reexec_on_cpu()

    from latticeboltzmannsimulations_tpu import engine
    from latticeboltzmannsimulations_tpu.config import SimConfig

    # Env overrides (smoke tests / size probes); defaults are the headline.
    size = int(os.environ.get("LBM_BENCH_N", "1024"))
    cfg = SimConfig(
        nx=size, ny=size, reynolds=5000.0,
        # LBM_BENCH_COLLISION=srt isolates the collision cost (SRT≈MRT on
        # this kernel => gather/memory-bound, no headroom in the operator).
        collision=os.environ.get("LBM_BENCH_COLLISION", "mrt"),
        precision="float32",
    ).validate()

    # 10k-step dispatches: per-dispatch overhead over the axon relay is
    # ~4ms (dispatch + forced scalar fetch), which taxes a 500-step chunk
    # ~12% at 1024² — the metric is sustained kernel throughput, so the
    # dispatch must be long enough to amortize it (measured saturation:
    # 14,566 @500 -> 16,010 @2000 -> 16,346 @10000 MLUPS).
    steps_per_chunk = int(os.environ.get("LBM_BENCH_CHUNK", "10000"))

    def _build_runner(backend):
        if backend == "pallas-pull":
            from latticeboltzmannsimulations_tpu.kernels import pallas_pull

            return pallas_pull.make_scan_runner(cfg, steps_per_chunk)
        return engine.make_scan_runner(cfg, steps_per_chunk)

    # Warmup / compile.  The axon relay can drop transiently (r3: a giant
    # Mosaic compile killed it) or fail at *backend init* before the first
    # dispatch (BENCH_r03 rc=1 died in init_state, outside the old retry
    # loop) — so the whole first-touch sequence (allocate, build, dispatch)
    # retries together.  A deterministic error (bad kernel/config — e.g. the
    # Pallas path on a CPU backend) demotes to the fused-jnp runner instead
    # of burning retries; transient relay errors are printed and retried so
    # transient vs. real failures are distinguishable in the driver log.
    deterministic = (TypeError, ValueError, AttributeError, KeyError,
                     ImportError, NotImplementedError)
    runner = None
    for backend in ("pallas-pull", "fused-jnp"):
        for attempt in range(4):
            try:
                state = engine.init_state(cfg)
                runner = _build_runner(backend)
                state = runner(state)
                _force(state.f)
                break
            except deterministic:
                traceback.print_exc()
                if backend == "fused-jnp":
                    raise  # deterministic bug in the fallback — give up
                print("pallas-pull warmup failed deterministically; "
                      "falling back to fused-jnp", file=sys.stderr, flush=True)
                runner = None
                break  # skip remaining pallas attempts
            except Exception:
                traceback.print_exc()
                runner = None
                if attempt == 3:
                    if backend == "fused-jnp":
                        raise  # both backends exhausted their retries
                    print("pallas-pull warmup kept failing; "
                          "trying fused-jnp", file=sys.stderr, flush=True)
                else:
                    print(f"{backend} warmup attempt {attempt + 1} failed; "
                          "retrying in 60s", file=sys.stderr, flush=True)
                    time.sleep(60)
        if runner is not None:
            break
    if runner is None:
        raise RuntimeError("benchmark warmup never succeeded")

    n_chunks = int(os.environ.get("LBM_BENCH_CHUNKS", "3"))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = runner(state)
    _force(state.f)
    elapsed = time.perf_counter() - t0

    steps = steps_per_chunk * n_chunks
    mlups = cfg.nx * cfg.ny * steps * 1e-6 / elapsed
    if cpu_fallback:
        backend += "/cpu-fallback: TPU relay was down"
    print(json.dumps({
        "metric": (f"MLUPS {cfg.nx}x{cfg.ny} D2Q9 "
                   f"{cfg.collision.upper()} cavity ({backend})"),
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
