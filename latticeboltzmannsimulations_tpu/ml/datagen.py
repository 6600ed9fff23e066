"""Reynolds-sweep dataset generator.

Capability parity with the reference generator (``MRT_GPU_datagen.py``):
sweep Re (default 100..5090 step 10 — 500 runs at 384², SRT + Smagorinsky,
reference ``:55-57,63-69``), run each cavity to convergence
(|d mean(u)|/uLB < 1e-8 sustained, reference ``:866-872``), and emit the same
four-array schema (reference ``:886-902``)::

    Re_range    (N,)
    feq_initial (9, X, Y)
    f_final     (N, 9, X, Y)
    u_final     (N, 2, X, Y)

TPU-first redesign: one compiled step serves every Reynolds number — omega
is a *traced* argument.  On TPU the sweep runs each cavity through the fused
Pallas kernel (``kernels.pallas_pull.make_scan_runner_omega``, ~10 GLUPS, so
a 192² cavity converges in about a second); elsewhere it falls back to a
*vmapped* batch of the fused jit step (``engine.make_fused_step_omega``),
advancing a whole batch of independent cavities per dispatch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import engine
from ..config import SimConfig


@dataclasses.dataclass
class DatasetArrays:
    re_range: np.ndarray     # (N,)
    feq_initial: np.ndarray  # (9, X, Y)
    f_final: np.ndarray      # (N, 9, X, Y)
    u_final: np.ndarray      # (N, 2, X, Y)
    # Quarantined runs: a cavity that diverged mid-sweep is marked here and
    # its f/u slots zeroed; the rest of the batch completes (the reference's
    # sequential per-run loop simply moved on past a blown-up Re).
    failed: Optional[np.ndarray] = None  # (N,) bool


def _batched_runner(cfg: SimConfig, chunk_steps: int):
    """(batched state, omegas) -> batched state after ``chunk_steps``."""
    step = engine.make_fused_step_omega(cfg)
    vstep = jax.vmap(step, in_axes=(engine.State(f=0, rho_lid=0), 0))

    @jax.jit
    def run(state, omegas):
        def body(s, _):
            return vstep(s, omegas), None

        state, _ = jax.lax.scan(body, state, None, length=chunk_steps)
        return state

    return run


def _batched_observables(cfg: SimConfig):
    obs = lambda s: engine.observables(cfg, s)
    return jax.jit(jax.vmap(obs))


def _pallas_sweep_ok(cfg: SimConfig) -> bool:
    import jax as _jax

    return (
        _jax.default_backend() not in ("cpu",)
        and cfg.precision == "float32"
        and cfg.boundary == "nebb"
        and not cfg.van_driest
        and cfg.nx % 8 == 0 and cfg.nx >= 32 and cfg.ny % 128 == 0
    )


def _generate_stacked_pallas(cfg, re_values, n_cav, progress, on_batch=None):
    """Batched TPU sweep: ``n_cav`` cavities stacked along x advance through
    ONE Pallas dispatch per chunk (``kernels.pallas_pull.make_sweep_runner``)
    with a per-cavity omega vector, so the whole Reynolds batch runs at fused
    kernel speed instead of paying per-Re dispatch latency."""
    from ..kernels import pallas_pull

    n = len(re_values)
    state0 = engine.init_state(cfg)
    feq_initial = np.asarray(state0.f)
    chunk = max(1, cfg.report_interval)
    runner = pallas_pull.make_sweep_runner(cfg, n_cav, chunk)
    obs_b = _batched_observables(cfg)

    nx, ny = cfg.nx, cfg.ny

    @jax.jit
    def check_and_renorm(f, rho_lid):
        """Unstack -> boundary-corrected obs -> per-cavity mass renorm.
        Returns the renormed stacked state and the per-cavity u fields."""
        fb = f.reshape(9, n_cav, nx, ny).transpose(1, 0, 2, 3)
        lidb = rho_lid.reshape(n_cav, nx)
        rho_b, u_b = obs_b(engine.State(f=fb, rho_lid=lidb))
        scale = (1.0 / jnp.mean(rho_b, axis=(1, 2))).astype(f.dtype)
        f = (f.reshape(9, n_cav, nx, ny) * scale[None, :, None, None]
             ).reshape(f.shape)
        rho_lid = (rho_lid.reshape(n_cav, nx) * scale[:, None]).reshape(-1)
        return f, rho_lid, u_b

    f_final = np.empty((n, 9, nx, ny), dtype=feq_initial.dtype)
    u_final = np.empty((n, 2, nx, ny), dtype=feq_initial.dtype)
    failed = np.zeros(n, dtype=bool)

    for lo in range(0, n, n_cav):
        hi = min(lo + n_cav, n)
        res = re_values[lo:hi]
        b = hi - lo
        # Short batches pad with repeats of the last Re (results discarded).
        res_pad = np.concatenate([res, np.repeat(res[-1:], n_cav - b)])
        omegas = jnp.asarray(
            [dataclasses.replace(cfg, reynolds=float(r)).omega
             for r in res_pad],
            dtype=cfg.dtype,
        )
        state = engine.State(
            f=jnp.concatenate([state0.f] * n_cav, axis=1),
            rho_lid=jnp.concatenate([state0.rho_lid] * n_cav),
        )
        mean_past = np.full(n_cav, np.inf)
        hits = np.zeros(n_cav, dtype=int)
        fail_b = np.zeros(n_cav, dtype=bool)
        steps = 0
        while steps < cfg.max_steps:
            state = runner(state, omegas)
            steps += chunk
            f, rho_lid, u_b = check_and_renorm(state.f, state.rho_lid)
            state = engine.State(f=f, rho_lid=rho_lid)
            # f64 accumulation on the host (x64 is disabled on TPU)
            mean_u = np.asarray(u_b).mean(axis=(1, 2, 3), dtype=np.float64)
            # Quarantine diverged cavities: the stacked cavities are isolated
            # (cross-boundary gathers land only in wall-rewritten
            # populations), so a NaN slot cannot leak — mark it failed and
            # let the rest of the batch run on.
            newly = ~np.isfinite(mean_u) & ~fail_b
            if np.any(newly[:b]):
                fail_b |= newly
                if progress is not None:
                    progress(
                        f"quarantined diverged Re={res[newly[:b]].tolist()} "
                        f"at step {steps}"
                    )
            done = np.abs(mean_u - mean_past) / cfg.u_lid < cfg.convergence_tol
            hits = np.where(done, hits + 1, 0)
            mean_past = mean_u
            if np.all((hits[:b] > cfg.convergence_hits) | fail_b[:b]):
                break
        # Final observables from the converged (renormed) state.
        fb = state.f.reshape(9, n_cav, nx, ny).transpose(1, 0, 2, 3)
        lidb = state.rho_lid.reshape(n_cav, nx)
        _, u_b = obs_b(engine.State(f=fb, rho_lid=lidb))
        f_c, u_c = np.asarray(fb)[:b], np.asarray(u_b)[:b]
        if fail_b[:b].any():  # np.asarray of a jax array is read-only
            f_c, u_c = f_c.copy(), u_c.copy()
            f_c[fail_b[:b]] = 0.0
            u_c[fail_b[:b]] = 0.0
        f_final[lo:hi], u_final[lo:hi] = f_c, u_c
        failed[lo:hi] = fail_b[:b]
        if progress is not None:
            progress(
                f"Re[{lo}:{hi}] ({res[0]:g}..{res[-1]:g}): {steps} steps, "
                f"{int((hits[:b] > cfg.convergence_hits).sum())}/{b} converged"
                + (f", {int(fail_b[:b].sum())} failed" if fail_b[:b].any() else "")
            )
        if on_batch is not None:
            on_batch(res, f_final[lo:hi], u_final[lo:hi], steps,
                     hits[:b] > cfg.convergence_hits, fail_b[:b])
    return DatasetArrays(re_range=re_values, feq_initial=feq_initial,
                         f_final=f_final, u_final=u_final, failed=failed)


def _generate_sequential_pallas(cfg, re_values, progress):
    """Per-Re runs through the fused Pallas kernel (traced omega)."""
    from ..kernels import pallas_pull

    n = len(re_values)
    state0 = engine.init_state(cfg)
    feq_initial = np.asarray(state0.f)
    chunk = max(1, cfg.report_interval)
    runner = pallas_pull.make_scan_runner_omega(cfg, chunk)
    obs = jax.jit(lambda s: engine.observables(cfg, s))

    f_final = np.empty((n, 9, cfg.nx, cfg.ny), dtype=feq_initial.dtype)
    u_final = np.empty((n, 2, cfg.nx, cfg.ny), dtype=feq_initial.dtype)
    failed = np.zeros(n, dtype=bool)
    for idx, re in enumerate(re_values):
        omega = jnp.asarray(
            dataclasses.replace(cfg, reynolds=float(re)).omega, cfg.dtype)
        state = state0
        mean_past, hits, steps = np.inf, 0, 0
        while steps < cfg.max_steps:
            state = runner(state, omega)
            steps += chunk
            rho, u = obs(state)
            scale = np.float32(1.0 / np.asarray(rho).mean(dtype=np.float64))
            state = engine.State(f=state.f * scale,
                                 rho_lid=state.rho_lid * scale)
            mean_u = float(np.asarray(u).mean(dtype=np.float64))
            if not np.isfinite(mean_u):
                failed[idx] = True  # quarantine and move to the next Re
                if progress is not None:
                    progress(f"quarantined diverged Re={re:g} at step {steps}")
                break
            if abs(mean_u - mean_past) / cfg.u_lid < cfg.convergence_tol:
                hits += 1
                if hits > cfg.convergence_hits:
                    break
            else:
                hits = 0
            mean_past = mean_u
        if failed[idx]:
            f_final[idx] = 0.0
            u_final[idx] = 0.0
        else:
            rho, u = obs(state)
            f_final[idx] = np.asarray(state.f)
            u_final[idx] = np.asarray(u)
        if progress is not None and (idx + 1) % 25 == 0:
            progress(f"Re {re:g} ({idx + 1}/{n}): {steps} steps")
    return DatasetArrays(re_range=re_values, feq_initial=feq_initial,
                         f_final=f_final, u_final=u_final, failed=failed)


def generate_dataset(
    cfg: SimConfig,
    re_values: Optional[np.ndarray] = None,
    batch_size: int = 32,
    progress: Optional[Callable[[str], None]] = None,
    on_batch: Optional[Callable] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DatasetArrays:
    """Run the sweep and return the dataset arrays.

    ``cfg`` fixes the grid / operator / turbulence model; ``cfg.reynolds`` is
    ignored in favor of ``re_values``.  Convergence uses
    ``cfg.convergence_tol`` / ``cfg.convergence_hits`` / ``cfg.max_steps``
    with checks every ``cfg.report_interval`` steps.

    ``on_batch(res, f_chunk, u_chunk, steps, converged, failed)`` fires after
    each completed batch (``converged`` / ``failed`` are per-cavity bool
    vectors) so multi-hour sweeps can persist incrementally and resume by
    re-running with only the missing ``re_values``.  A cavity that diverges
    is quarantined — marked in ``failed`` with zeroed fields — and the rest
    of the sweep continues.

    ``mesh`` spreads each batch of independent cavities over the device
    mesh's first axis (data parallelism — the sweep is embarrassingly
    parallel, so there is no communication besides the host-side
    convergence reads; SURVEY §2.7 "sharded batch of independent cavities
    across chips").  Batches that do not divide evenly run unsharded.  The
    mesh path uses the vmapped engine (the stacked Pallas sweep is a
    single-chip kernel; run one sweep process per chip for that).
    """
    if re_values is None:
        re_values = np.arange(100, 5100, 10, dtype=np.float64)  # 500 runs
    re_values = np.asarray(re_values, dtype=np.float64)
    n = len(re_values)

    if mesh is None and _pallas_sweep_ok(cfg):
        if n > 1 and batch_size > 1:
            n_cav = min(batch_size, n)
            return _generate_stacked_pallas(cfg, re_values, n_cav, progress,
                                            on_batch=on_batch)
        return _generate_sequential_pallas(cfg, re_values, progress)

    state0 = engine.init_state(cfg)
    feq_initial = np.asarray(state0.f)  # initial equilibrium (datagen :281)

    chunk = max(1, cfg.report_interval)
    runner = _batched_runner(cfg, chunk)
    obs = _batched_observables(cfg)

    f_final = np.empty((n, 9, cfg.nx, cfg.ny), dtype=feq_initial.dtype)
    u_final = np.empty((n, 2, cfg.nx, cfg.ny), dtype=feq_initial.dtype)
    failed = np.zeros(n, dtype=bool)

    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        res = re_values[lo:hi]
        omegas = jnp.asarray(
            [dataclasses.replace(cfg, reynolds=float(r)).omega for r in res],
            dtype=cfg.dtype,
        )
        b = hi - lo
        state = engine.State(
            f=jnp.broadcast_to(state0.f, (b, *state0.f.shape)),
            rho_lid=jnp.broadcast_to(state0.rho_lid, (b, *state0.rho_lid.shape)),
        )
        if mesh is not None and b % mesh.shape[mesh.axis_names[0]] == 0:
            from jax.sharding import NamedSharding, PartitionSpec

            sb = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            state = engine.State(f=jax.device_put(state.f, sb),
                                 rho_lid=jax.device_put(state.rho_lid, sb))
            omegas = jax.device_put(omegas, sb)
        mean_past = np.full(b, np.inf)
        hits = np.zeros(b, dtype=int)
        fail_b = np.zeros(b, dtype=bool)
        steps = 0
        while steps < cfg.max_steps:
            state = runner(state, omegas)
            steps += chunk
            rho_b, u = obs(state)
            # per-run mass renormalization (see sim.SimOptions.mass_correction)
            scale = (1.0 / jnp.mean(rho_b, axis=(1, 2))).astype(cfg.dtype)
            state = engine.State(
                f=state.f * scale[:, None, None, None],
                rho_lid=state.rho_lid * scale[:, None],
            )
            # f64 accumulation on the host (x64 is disabled on TPU)
            mean_u = np.asarray(u).mean(axis=(1, 2, 3), dtype=np.float64)
            # Quarantine diverged runs (vmapped batch lanes are independent).
            newly = ~np.isfinite(mean_u) & ~fail_b
            if np.any(newly):
                fail_b |= newly
                if progress is not None:
                    progress(
                        f"quarantined diverged Re={res[newly].tolist()} "
                        f"at step {steps}"
                    )
            done = np.abs(mean_u - mean_past) / cfg.u_lid < cfg.convergence_tol
            hits = np.where(done, hits + 1, 0)
            mean_past = mean_u
            if np.all((hits > cfg.convergence_hits) | fail_b):
                break
        if progress is not None:
            progress(
                f"Re[{lo}:{hi}] ({res[0]:g}..{res[-1]:g}): {steps} steps, "
                f"{int((hits > cfg.convergence_hits).sum())}/{b} converged"
                + (f", {int(fail_b.sum())} failed" if fail_b.any() else "")
            )
        rho_b, u_b = obs(state)
        f_c, u_c = np.asarray(state.f), np.asarray(u_b)
        if fail_b.any():  # np.asarray of a jax array is read-only
            f_c, u_c = f_c.copy(), u_c.copy()
            f_c[fail_b] = 0.0
            u_c[fail_b] = 0.0
        f_final[lo:hi], u_final[lo:hi] = f_c, u_c
        failed[lo:hi] = fail_b
        if on_batch is not None:
            on_batch(res, f_final[lo:hi], u_final[lo:hi], steps,
                     hits > cfg.convergence_hits, fail_b)

    return DatasetArrays(
        re_range=re_values,
        feq_initial=feq_initial,
        f_final=f_final,
        u_final=u_final,
        failed=failed,
    )


def bit_reversed_batches(values: np.ndarray, batch_size: int) -> np.ndarray:
    """Reorder ``values`` so consecutive-value batches run in bit-reversed
    index order.

    Batches keep consecutive Re values (similar convergence times, so a
    batch's slowest member wastes little of the others' work), but the batch
    *sequence* is bit-reversed: any prefix of the reordered sweep covers the
    whole Re range at roughly uniform density, so a sweep cut off by a time
    budget still yields a usable training set (assembled with
    ``datagen_full.py --assemble-partial``).

    The consumer (``generate_dataset``) re-slices the flat result into
    aligned ``batch_size`` groups, so any short final batch must stay LAST:
    placing it mid-sequence would shift every later slice boundary and mix
    Re values thousands apart in one vmapped batch (which then runs until
    its slowest member converges)."""
    batches = [values[i:i + batch_size]
               for i in range(0, len(values), batch_size)]
    tail = []
    if len(batches) > 1 and len(batches[-1]) != batch_size:
        tail = [batches.pop()]
    nbits = max(1, (len(batches) - 1).bit_length())
    order = sorted(range(len(batches)),
                   key=lambda i: int(f"{i:0{nbits}b}"[::-1], 2))
    return np.concatenate([batches[i] for i in order] + tail)


def save_dataset(ds: DatasetArrays, out_dir: str) -> None:
    """Same four-file .npy layout as the reference
    (reference: ``MRT_GPU_datagen.py:899-902``), plus ``failed.npy`` — the
    quarantine mask — whenever any cavity diverged, so zero-filled slots can
    never silently flow into training."""
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "Re_range.npy"), ds.re_range)
    np.save(os.path.join(out_dir, "feq_initial.npy"), ds.feq_initial)
    np.save(os.path.join(out_dir, "f_final.npy"), ds.f_final)
    np.save(os.path.join(out_dir, "u_final.npy"), ds.u_final)
    failed_path = os.path.join(out_dir, "failed.npy")
    if ds.failed is not None and ds.failed.any():
        np.save(failed_path, ds.failed)
    elif os.path.exists(failed_path):
        os.remove(failed_path)  # don't let a stale mask shadow a clean save


def load_dataset(out_dir: str) -> DatasetArrays:
    failed_path = os.path.join(out_dir, "failed.npy")
    return DatasetArrays(
        re_range=np.load(os.path.join(out_dir, "Re_range.npy")),
        feq_initial=np.load(os.path.join(out_dir, "feq_initial.npy")),
        f_final=np.load(os.path.join(out_dir, "f_final.npy")),
        u_final=np.load(os.path.join(out_dir, "u_final.npy")),
        failed=np.load(failed_path) if os.path.exists(failed_path) else None,
    )


def drop_failed(ds: DatasetArrays) -> DatasetArrays:
    """Dataset with quarantined (zero-filled) cavities removed."""
    if ds.failed is None or not ds.failed.any():
        return ds
    keep = ~ds.failed
    return DatasetArrays(
        re_range=ds.re_range[keep],
        feq_initial=ds.feq_initial,
        f_final=ds.f_final[keep],
        u_final=ds.u_final[keep],
        failed=None,
    )
