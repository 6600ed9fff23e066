"""High-level simulation driver: the reference's per-script run experience
(time loop + per-interval dashboards/VTK/metrics + convergence + final
summary, reference: ``MRT.py:286-619``) as one function, with the subsystems
the reference lacks wired in: structured metrics, checkpoint/resume, blow-up
recovery, Ghia gating, and backend selection (fused jit / Pallas / sharded).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import numpy as np

from . import engine, viz
from .config import SimConfig
from .io import Checkpointer, MetricsLogger, save_to_vtk
from .io.metrics import mlups
from .validate import compare_to_ghia
from .validate.ghia_data import has_reynolds


@dataclasses.dataclass
class SimOptions:
    """Output & runtime switches (reference knobs ``MRT.py:33-38``)."""

    out_dir: str = "output"
    project: str = "ldc"
    save_plots: bool = False
    save_vtk: bool = False
    metrics_jsonl: bool = True
    checkpoint_every: int = 0     # steps; 0 = off
    resume_from: Optional[str] = None
    # 'auto' | 'jit' | 'pallas' | 'pallas-tblock' | 'sharded' |
    # 'sharded-pallas'  (auto picks per hardware/config; unknown values fall
    # back to the jit engine)
    backend: str = "auto"
    verbose: bool = True
    # The wet-node corner treatment (faithful to the reference kernels) leaks
    # a little mass each step — negligible over the reference's 3000-step
    # runs but a ~5%/10M-step density drift that biases long validation runs.
    # This rescales f to the initial mean density every report interval
    # (velocity is invariant under a uniform rescale of f).
    mass_correction: bool = True
    # Write a jax.profiler trace of the first compute chunk here (viewable
    # in Perfetto / TensorBoard); None = off.
    profile_dir: Optional[str] = None


@dataclasses.dataclass
class SimSummary:
    steps: int
    converged: bool
    elapsed_s: float
    mlups: float
    r2_ux: Optional[float]
    l2_combined: Optional[float]
    out_dir: str


def _push_style(cfg: SimConfig, step):
    """Runner + observables for the push-scheme engines (oracle and Pallas
    push kernel): state is the plain pre-collision field ``f``."""

    @jax.jit
    def runner_n(f, n):
        return jax.lax.fori_loop(0, n, lambda _, x: step(x), f)

    def runner(n):
        def run(state):
            f = runner_n(state.f, n)
            # the push engines carry no lid-density memory; fill the
            # State slot with a placeholder (never read on this path)
            return engine.State(f=f, rho_lid=f[0, :, 0])

        return run

    @jax.jit
    def obs(state):
        from .ops.equilibrium import macroscopics
        from .ops import boundary as bc_ops

        rho, u = macroscopics(state.f)
        lid_corners = "lid" if cfg.boundary == "nebb_west_eq" else "wall"
        u, rho = bc_ops.override_wall_velocity(
            u, rho, state.f, cfg.u_lid, lid_corners)
        return rho, u

    return runner, obs


def _select_backend(cfg: SimConfig, opts: SimOptions):
    """Pick the runner factory: sharded when a mesh is requested, the Pallas
    kernel on TPU f32 single chip, fused jit otherwise.  Non-NEBB boundary
    schemes (the reference's commented bounce-back / west-equilibrium
    experiments) run on the push-oracle engine, the only one that implements
    them."""
    if cfg.boundary != "nebb":
        if cfg.mesh_shape != (1, 1):
            raise ValueError(
                f"boundary {cfg.boundary!r} runs on a single-chip engine; "
                f"requested mesh {cfg.mesh_shape} would be silently ignored"
            )
        if cfg.boundary == "nebb_tangential":
            # Fused pull engine supports the tangential lid natively (r5:
            # flagship-resolution BC-closure control needs fused speed, not
            # the unfused push oracle's).
            runner = lambda n: engine.make_scan_runner(cfg, n)  # noqa: E731
            obs = jax.jit(lambda s: engine.observables(cfg, s))
            return runner, obs, (lambda s: s), "jit"
        runner, obs = _push_style(cfg, engine.make_push_oracle_step(cfg))
        return runner, obs, (lambda s: s), "push-oracle"
    # Explicitly-requested single-chip backends must not silently drop a
    # requested decomposition (code-review r4: 'pallas'/'pallas-tblock'/
    # 'jit' with mesh_shape=(2,2) used to run single-chip with no error).
    if opts.backend in ("pallas", "pallas-tblock", "pallas-push", "jit") \
            and cfg.mesh_shape != (1, 1):
        raise ValueError(
            f"backend {opts.backend!r} is single-chip only; requested mesh "
            f"{cfg.mesh_shape} would be silently ignored"
        )
    if opts.backend == "pallas-push":
        # Explicit-only (never auto-selected): the E10-parity fused push
        # kernel — pull stays the production path (see pallas_push.py).
        from .kernels import pallas_push

        interp = jax.default_backend() in ("cpu",)
        runner, obs = _push_style(
            cfg, pallas_push.make_push_step(cfg, interpret=interp))
        return runner, obs, (lambda s: s), "pallas-push"
    if opts.backend in ("sharded", "sharded-pallas", "sharded-tblock") or (
        opts.backend == "auto" and cfg.mesh_shape != (1, 1)
    ):
        from .parallel import (
            make_mesh, make_sharded_scan_runner, shard_state, sharded_observables,
        )

        mesh = make_mesh(cfg.mesh_shape)
        on_tpu = jax.default_backend() not in ("cpu",)
        pallas_ok = (
            on_tpu and cfg.precision == "float32" and cfg.boundary == "nebb"
        )
        # HBM-bound per-shard grids: temporal blocking amortizes the ICI
        # exchange over K steps (kernels/pallas_pull_tblock_sharded.py).
        mx, my = cfg.mesh_shape
        lxs, lys = cfg.nx // mx, cfg.ny // my
        from .kernels import pallas_pull as _pp

        tblock_fits = (
            not cfg.van_driest
            and (cfg.ny % 128 == 0 or my > 1)  # y-sharded lanes self-pad
            and lxs >= 256 and not _pp._is_small_field(lxs, lys)
        )
        runner = name = None
        if opts.backend == "sharded-tblock" or (
            opts.backend == "auto" and pallas_ok and tblock_fits
        ):
            from .kernels.pallas_pull_tblock_sharded import (
                make_sharded_tblock_runner,
            )

            # Eager constraint probe (tile_x >= 2K', tile divisibility, lane
            # layout): constructing a 0-step runner runs the same validation
            # as the real one without compiling anything.  'auto' falls back
            # to the per-step sharded kernel on rejection; an explicit
            # backend request surfaces the error.
            try:
                make_sharded_tblock_runner(cfg, 0, mesh, k_steps=16)
            except ValueError:
                if opts.backend == "sharded-tblock":
                    raise
            else:
                runner = lambda n: make_sharded_tblock_runner(cfg, n, mesh,
                                                              k_steps=16)
                name = "sharded-tblock"
        if runner is None:
            if opts.backend == "sharded-pallas" or (
                opts.backend == "auto" and pallas_ok
            ):
                from .kernels.pallas_pull_sharded import make_sharded_pallas_runner

                runner = lambda n: make_sharded_pallas_runner(cfg, n, mesh)
                name = "sharded-pallas"
            else:
                runner = lambda n: make_sharded_scan_runner(cfg, n, mesh)
                name = "sharded"
        obs = sharded_observables(cfg, mesh)
        prep = lambda s: shard_state(s, mesh)
        return runner, obs, prep, name
    on_tpu = jax.default_backend() not in ("cpu",)
    if opts.backend in ("pallas", "pallas-tblock") or (
        opts.backend == "auto" and on_tpu and cfg.precision == "float32"
        and cfg.nx % 8 == 0 and cfg.nx >= 32 and cfg.ny % 128 == 0
    ):
        from .kernels import pallas_pull

        obs = jax.jit(lambda s: engine.observables(cfg, s))
        # Large (HBM-bound) fields run K steps per VMEM window (temporal
        # blocking, ~3x); small fields ride the VMEM-residency fast path.
        # The tblock kernel does not stage the Van Driest Cs^2 plane; the
        # plain kernel does (as a pipelined VMEM input).
        big = not pallas_pull._is_small_field(cfg.nx, cfg.ny)
        if opts.backend == "pallas-tblock" or (
            opts.backend != "pallas" and big and cfg.nx >= 256
            and not cfg.van_driest
        ):
            from .kernels import pallas_pull_tblock

            runner = lambda n: pallas_pull_tblock.make_scan_runner(
                cfg, n, k_steps=16)
            return runner, obs, (lambda s: s), "pallas-tblock"
        runner = lambda n: pallas_pull.make_scan_runner(cfg, n)
        return runner, obs, (lambda s: s), "pallas"
    runner = lambda n: engine.make_scan_runner(cfg, n)
    obs = jax.jit(lambda s: engine.observables(cfg, s))
    return runner, obs, (lambda s: s), "jit"


def simulate(cfg: SimConfig, opts: Optional[SimOptions] = None) -> SimSummary:
    """Run a cavity simulation to convergence with full diagnostics."""
    opts = opts or SimOptions()
    cfg.validate()
    os.makedirs(opts.out_dir, exist_ok=True)

    runner_factory, obs, prep, backend = _select_backend(cfg, opts)
    chunk = max(1, cfg.report_interval)
    runner = runner_factory(chunk)

    if opts.resume_from:
        from .io.checkpoint import load_checkpoint

        state, start_step = load_checkpoint(opts.resume_from, cfg)
        state = prep(state)
    else:
        state, start_step = prep(engine.init_state(cfg)), 0

    metrics = MetricsLogger(
        os.path.join(opts.out_dir, f"{opts.project}_metrics.jsonl")
        if opts.metrics_jsonl else None
    )
    ckpt = (
        Checkpointer(os.path.join(opts.out_dir, "ckpt"), cfg,
                     every=opts.checkpoint_every, start_step=start_step)
        if opts.checkpoint_every else None
    )

    if opts.verbose:
        print(f"[{backend}] {cfg.describe()}")

    r2_history = []
    mean_past, hits = np.inf, 0
    converged = False
    step = start_step
    vtk_n = 0
    restores = 0
    t0 = time.perf_counter()
    while step < cfg.max_steps:
        if opts.profile_dir is not None and step == start_step:
            with jax.profiler.trace(opts.profile_dir):
                state = runner(state)
                # scalar fetch: block_until_ready does not block over the
                # axon TPU relay, and the trace must span real execution
                np.asarray(state.f[0, 0, 0])
        else:
            state = runner(state)
        step += chunk
        rho, u = obs(state)
        rho_h, u_h = np.asarray(rho), np.asarray(u)
        mean_u = float(u_h.mean(dtype=np.float64))

        if not np.isfinite(mean_u):
            # One restore gives transient blow-ups (bad resume file, cosmic
            # ray, preempted write) a second chance; identical dynamics that
            # diverge deterministically must not loop forever.
            if ckpt is not None and ckpt.last_good and restores < 1:
                restores += 1
                if opts.verbose:
                    print(f"blow-up at step {step}; restoring {ckpt.last_good}")
                restored, step = ckpt.restore_last_good()
                state = prep(restored)
                mean_past, hits = np.inf, 0
                continue
            raise FloatingPointError(f"simulation diverged at step {step}")

        if opts.mass_correction:
            scale = 1.0 / rho_h.mean(dtype=np.float64)
            if abs(scale - 1.0) > 1e-12:
                state = engine.State(
                    f=state.f * cfg.dtype(scale),
                    rho_lid=state.rho_lid * cfg.dtype(scale),
                )
                rho_h = rho_h * scale

        rec = {"mean_u": mean_u, "backend": backend}
        if has_reynolds(cfg.reynolds):
            cmp_ = compare_to_ghia(u_h, cfg.u_lid, cfg.reynolds)
            rec.update(r2_ux=cmp_.r2_ux, l2=cmp_.l2_combined)
            r2_history.append((step, cmp_.r2_ux))
        metrics.log(step, **rec)
        if opts.verbose:
            extra = f" R2={rec.get('r2_ux', float('nan')):.4f}" if "r2_ux" in rec else ""
            print(f"  step {step}: mean_u={mean_u:.3e}{extra}")

        if ckpt is not None:
            ckpt(step, engine.State(f=state.f, rho_lid=state.rho_lid),
                 rho_h, u_h)
        if opts.save_plots:
            viz.dashboard(cfg, rho_h, u_h, step, r2_history,
                          out_dir=opts.out_dir, prefix=opts.project)
        if opts.save_vtk:
            save_to_vtk(u_h, rho_h, opts.project, vtk_n, out_dir=opts.out_dir)
            vtk_n += 1

        if abs(mean_u - mean_past) / cfg.u_lid < cfg.convergence_tol:
            hits += 1
            if hits > cfg.convergence_hits:
                converged = True
                break
        else:
            hits = 0
        mean_past = mean_u
    elapsed = time.perf_counter() - t0

    rho, u = obs(state)
    u_h = np.asarray(u)
    r2 = l2 = None
    if has_reynolds(cfg.reynolds):
        cmp_ = compare_to_ghia(u_h, cfg.u_lid, cfg.reynolds)
        r2, l2 = cmp_.r2_ux, cmp_.l2_combined
    summary = SimSummary(
        steps=step, converged=converged, elapsed_s=elapsed,
        mlups=mlups(cfg.nx, cfg.ny, step - start_step, elapsed),
        r2_ux=r2, l2_combined=l2, out_dir=opts.out_dir,
    )
    metrics.log(step, final=True, mlups=summary.mlups,
                converged=converged, **({"r2_ux": r2, "l2": l2} if r2 is not None else {}))
    metrics.close()
    if opts.verbose:
        print(
            f"done: {step} steps, converged={converged}, "
            f"{summary.mlups:.1f} MLUPS"
            + (f", R2(ux)={r2:.4f}, L2={100 * l2:.2f}%" if r2 is not None else "")
        )
    return summary
