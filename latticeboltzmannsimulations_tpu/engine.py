"""Time-loop engines (layer L3).

Three step implementations with one trajectory semantics each:

``step_push_oracle``
    Readable, unfused collide→stream→BC step in the reference NumPy engine's
    order (reference: ``MRT.py:286-453``).  The correctness oracle.

``make_pull_oracle_step``
    Literal transcription of the reference pull-kernel semantics — gather,
    NEBB from the *previous* step's equilibrium, macros, collide — with the
    equilibrium field materialized in the carried state
    (reference: ``MRTTiledPull.py:403-508``).  Used to certify the fused step.

``make_fused_step``
    The TPU production step.  Algebraic reduction of the pull scheme: because
    NEBB's ``feq_k - feq_kbar`` equals ``6 rho w_k (c_k . u_wall)``, which
    vanishes at static walls and closes at the lid with only the previous lid
    density, the whole step needs just ``(f, rho_lid)`` as state and is a
    single fused memory pass — one read and one write of the 9 planes per
    step, the XLA analogue of the reference's fastest SoA pull kernel
    (reference: ``MRTTiledPull.py:379-515``).

Multiple steps run inside one device dispatch via ``lax.scan`` — the sound
TPU realization of the reference's persistent-kernel experiment
(reference: ``MRTtestLoopIn.py:366-472``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lattice
from .config import SimConfig
from .ops import boundary as bc_ops
from .ops import collision as coll
from .ops.equilibrium import equilibrium, macroscopics
from .ops.streaming import gather_pull, stream_push


class State(NamedTuple):
    """Carried state of the fused pull engine."""

    f: jnp.ndarray        # (9, X, Y) post-collision populations
    rho_lid: jnp.ndarray  # (X,) lid-row density from the previous step


class PullOracleState(NamedTuple):
    f: jnp.ndarray    # (9, X, Y) post-collision populations
    feq: jnp.ndarray  # (9, X, Y) equilibrium of the previous step


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def initial_fields(cfg: SimConfig):
    """rho = 1, u = 0 except lid row moving at u_lid (reference: MRT.py:260-268)."""
    dtype = cfg.dtype
    rho = jnp.ones((cfg.nx, cfg.ny), dtype)
    u = jnp.zeros((2, cfg.nx, cfg.ny), dtype)
    u = u.at[0, 1 : cfg.nx - 1, 0].set(cfg.u_lid)  # corners stay with the walls
    return rho, u


def init_state(cfg: SimConfig) -> State:
    rho, u = initial_fields(cfg)
    f = equilibrium(rho, u)
    return State(f=f, rho_lid=rho[:, 0])


def init_pull_oracle_state(cfg: SimConfig) -> PullOracleState:
    rho, u = initial_fields(cfg)
    f = equilibrium(rho, u)
    return PullOracleState(f=f, feq=f)


# ---------------------------------------------------------------------------
# Collision dispatch (shared by all engines)
# ---------------------------------------------------------------------------

def _collide(cfg: SimConfig, f_bc, feq, rho, omega=None, cs2_field=None):
    """Apply the configured collision operator, optionally with the
    Smagorinsky effective relaxation time.

    ``omega`` overrides the config-derived shear relaxation rate; it may be a
    *traced* scalar, which lets one compiled step serve a whole Reynolds
    sweep (``ml/datagen.py`` vmaps over it).

    ``cs2_field`` overrides the Van Driest Cs^2 plane with a precomputed one
    (callers with non-global field shapes — per-shard blocks under
    ``shard_map`` — must pass their own slice; see
    ``ops.collision.van_driest_cs2_block``).
    """
    om0 = cfg.omega if omega is None else omega
    tau0 = cfg.tau if omega is None else 1.0 / om0
    if cfg.turbulence == "smagorinsky":
        if cs2_field is not None:
            cs2 = cs2_field
        elif cfg.van_driest:
            # Wall-damped Cs^2 field (reference: MRT_GPU.py:372-375); the
            # viscous length uses the lid friction scaling u_tau ~ u_lid.
            cs2 = coll.van_driest_cs2(
                cfg.nx, cfg.ny, cfg.u_lid / cfg.nu, dtype=f_bc.dtype
            )
        else:
            cs2 = cfg.smagorinsky_cs2
        tau_eff = coll.smagorinsky_tau(f_bc, feq, rho, tau0, cs2)
        omega_eff = 1.0 / tau_eff  # (X, Y) field
    else:
        omega_eff = om0

    if cfg.collision == "srt":
        return coll.srt_collide(f_bc, feq, omega_eff)
    if cfg.collision == "trt":
        # omega^- from the magic parameter (traced-safe form of
        # cfg.trt_omega_minus).
        omega_minus = 1.0 / (0.5 + cfg.trt_magic / (tau0 - 0.5))
        return coll.trt_collide(f_bc, feq, omega_eff, omega_minus)
    if cfg.collision == "mrt":
        return coll.mrt_collide(
            f_bc, omega_eff, cfg.mrt_omega_e, cfg.mrt_omega_eps, cfg.mrt_omega_q
        )
    raise ValueError(cfg.collision)


# ---------------------------------------------------------------------------
# Push oracle (MRT.py order): collide -> stream -> BC
# ---------------------------------------------------------------------------

def make_push_oracle_step(cfg: SimConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    lid_corners = "lid" if cfg.boundary == "nebb_west_eq" else "wall"

    def step(f: jnp.ndarray) -> jnp.ndarray:
        rho, u = macroscopics(f)
        u, rho = bc_ops.override_wall_velocity(u, rho, f, cfg.u_lid, lid_corners)
        feq = equilibrium(rho, u)
        fpost = _collide(cfg, f, feq, rho)
        f_str = stream_push(fpost)
        return bc_ops.apply(f_str, feq, cfg.boundary, cfg.u_lid, fpost=fpost)

    return step


# ---------------------------------------------------------------------------
# Pull oracle (kernel order): gather -> BC(feq_prev) -> macros -> collide
# ---------------------------------------------------------------------------

def make_pull_oracle_step(cfg: SimConfig) -> Callable[[PullOracleState], PullOracleState]:
    def step(state: PullOracleState) -> PullOracleState:
        g = gather_pull(state.f)
        g = bc_ops.nebb(g, state.feq)
        rho, u = macroscopics(g)
        u, rho = bc_ops.override_wall_velocity(u, rho, g, cfg.u_lid, "wall")
        feq = equilibrium(rho, u)
        f_new = _collide(cfg, g, feq, rho)
        return PullOracleState(f=f_new, feq=feq)

    return step


# ---------------------------------------------------------------------------
# Fused production step
# ---------------------------------------------------------------------------

def _fused_gather_bc(cfg: SimConfig, f, rho_lid_prev):
    """Gather + reduced NEBB.  Returns the boundary-corrected populations.

    The reduction: NEBB is ``f_k = (feq_k - feq_kbar) + f_kbar`` and
    ``feq_k - feq_kbar = 6 rho w_k (c_k . u)`` for opposite pairs.  With the
    previous step's wall velocities (zero on static walls and the two lid
    corners, ``(u_lid, 0)`` on the interior lid row) every wall rewrite is a
    pure in-register bounce-back except the lid's diagonal pair, which picks
    up ``-+ rho_prev u_lid / 6``  (w_7 = w_8 = 1/36, c_x = -+1).
    """
    nx, ny = cfg.nx, cfg.ny
    g = gather_pull(f)

    # Left wall x=0: f1<-f3, f5<-f7, f8<-f6.
    g = g.at[1, 0, :].set(g[3, 0, :])
    g = g.at[5, 0, :].set(g[7, 0, :])
    g = g.at[8, 0, :].set(g[6, 0, :])
    # Right wall: f3<-f1, f6<-f8, f7<-f5.
    g = g.at[3, nx - 1, :].set(g[1, nx - 1, :])
    g = g.at[6, nx - 1, :].set(g[8, nx - 1, :])
    g = g.at[7, nx - 1, :].set(g[5, nx - 1, :])
    # Bottom wall y=ny-1: f2<-f4, f5<-f7, f6<-f8 (after x-wall updates, like
    # the sequential kernel branches).
    g = g.at[2, :, ny - 1].set(g[4, :, ny - 1])
    g = g.at[5, :, ny - 1].set(g[7, :, ny - 1])
    g = g.at[6, :, ny - 1].set(g[8, :, ny - 1])
    # Lid y=0: f4<-f2; f7<-f5 - rho_prev*uLB/6; f8<-f6 + rho_prev*uLB/6,
    # with zero momentum term at the two corners (their previous u was 0).
    mom = rho_lid_prev * (cfg.u_lid / 6.0)
    mom = mom.at[0].set(0.0).at[nx - 1].set(0.0)
    g = g.at[4, :, 0].set(g[2, :, 0])
    g = g.at[7, :, 0].set(g[5, :, 0] - mom)
    g = g.at[8, :, 0].set(g[6, :, 0] + mom)
    return g


def _fused_gather_bc_tangential(cfg: SimConfig, f):
    """Gather + reduced static walls + Zou-He tangential lid closure.

    The pull-scheme form of ``ops.boundary.nebb_tangential`` (reference
    commented experiment ``MRT.py:461-482``): the three static walls reduce
    to in-register bounce-back exactly as in ``_fused_gather_bc`` (their
    ``feq_k - feq_kbar`` momentum term vanishes at zero wall velocity), and
    the lid closure needs no equilibrium at all — only the post-gather
    populations and ``u_lid`` — so unlike reduced NEBB it carries *no*
    previous-step lid density.  Corner cells use the Zou-He corner rule at
    unit density.  Measured at the Re=100 gate this closure halves L2 vs
    the production reduced NEBB (docs/artifacts/slow_gates.json), which is
    why it exists as a flagship-resolution control (VERDICT r4 next #1).
    """
    nx, ny = cfg.nx, cfg.ny
    u_lid = cfg.u_lid
    g = gather_pull(f)
    # Static walls: in-register bounce-back (identical to _fused_gather_bc).
    g = g.at[1, 0, :].set(g[3, 0, :])
    g = g.at[5, 0, :].set(g[7, 0, :])
    g = g.at[8, 0, :].set(g[6, 0, :])
    g = g.at[3, nx - 1, :].set(g[1, nx - 1, :])
    g = g.at[6, nx - 1, :].set(g[8, nx - 1, :])
    g = g.at[7, nx - 1, :].set(g[5, nx - 1, :])
    g = g.at[2, :, ny - 1].set(g[4, :, ny - 1])
    g = g.at[5, :, ny - 1].set(g[7, :, ny - 1])
    g = g.at[6, :, ny - 1].set(g[8, :, ny - 1])
    # Zou-He tangential lid closure (full row; corners fixed below).
    tang = 0.5 * (g[1, :, 0] - g[3, :, 0]) - 0.5 * u_lid
    g = g.at[4, :, 0].set(g[2, :, 0])
    g = g.at[7, :, 0].set(g[5, :, 0] + tang)
    g = g.at[8, :, 0].set(g[6, :, 0] - tang)
    # Zou-He corner rule at unit density (ops.boundary.nebb_tangential).
    g = g.at[1, 0, 0].set(g[3, 0, 0] + (2.0 / 3.0) * u_lid)
    g = g.at[4, 0, 0].set(g[2, 0, 0])
    g = g.at[8, 0, 0].set(g[6, 0, 0] + (1.0 / 6.0) * u_lid)
    g = g.at[5, 0, 0].set(u_lid / 12.0)
    g = g.at[7, 0, 0].set(-u_lid / 12.0)
    g = g.at[0, 0, 0].set(1.0 - g[1:, 0, 0].sum(axis=0))
    e = nx - 1
    g = g.at[3, e, 0].set(g[1, e, 0] - (2.0 / 3.0) * u_lid)
    g = g.at[4, e, 0].set(g[2, e, 0])
    g = g.at[7, e, 0].set(g[5, e, 0] - (1.0 / 6.0) * u_lid)
    g = g.at[6, e, 0].set(-u_lid / 12.0)
    g = g.at[8, e, 0].set(u_lid / 12.0)
    g = g.at[0, e, 0].set(1.0 - g[1:, e, 0].sum(axis=0))
    return g


def _fused_bc(cfg: SimConfig, f, rho_lid_prev):
    """Boundary dispatch for the fused pull engines: reduced NEBB
    (production) or the tangential Zou-He lid variant."""
    if cfg.boundary == "nebb_tangential":
        return _fused_gather_bc_tangential(cfg, f)
    return _fused_gather_bc(cfg, f, rho_lid_prev)


def _fused_macros(cfg: SimConfig, g):
    """Macros + wall overrides for the fused step (GPU-kernel corner rules)."""
    rho, u = macroscopics(g)
    u, rho = bc_ops.override_wall_velocity(u, rho, g, cfg.u_lid, "wall")
    return rho, u


def make_fused_step(cfg: SimConfig) -> Callable[[State], State]:
    def step(state: State) -> State:
        g = _fused_bc(cfg, state.f, state.rho_lid)
        rho, u = _fused_macros(cfg, g)
        feq = equilibrium(rho, u)
        f_new = _collide(cfg, g, feq, rho)
        return State(f=f_new, rho_lid=rho[:, 0])

    return step


def make_fused_step_omega(cfg: SimConfig) -> Callable[[State, jnp.ndarray], State]:
    """Fused step with the shear relaxation rate as a *traced* argument, so a
    single compiled step serves every Reynolds number of a sweep (the
    TPU-native redesign of the reference's 500 sequential datagen runs,
    reference: ``MRT_GPU_datagen.py:55-57``).  Vmappable over (state, omega)."""

    def step(state: State, omega) -> State:
        g = _fused_gather_bc(cfg, state.f, state.rho_lid)
        rho, u = _fused_macros(cfg, g)
        feq = equilibrium(rho, u)
        f_new = _collide(cfg, g, feq, rho, omega=omega)
        return State(f=f_new, rho_lid=rho[:, 0])

    return step


# ---------------------------------------------------------------------------
# Observables & runners
# ---------------------------------------------------------------------------

def observables(cfg: SimConfig, state: State):
    """Macroscopic (rho, u) as the reference engines report them: the
    boundary-corrected pre-collision moments with wall overrides applied
    (reference: MRTTiledPull.py:454-472)."""
    g = _fused_bc(cfg, state.f, state.rho_lid)
    return _fused_macros(cfg, g)


def make_scan_runner(cfg: SimConfig, n_steps: int):
    """N fused steps inside one compiled dispatch via lax.scan — the sound
    version of the reference's in-kernel time loop (MRTtestLoopIn.py:366)."""
    step = make_fused_step(cfg)

    @jax.jit
    def run(state: State) -> State:
        def body(s, _):
            return step(s), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


class RunResult(NamedTuple):
    state: State
    steps: int
    converged: bool
    mean_u_history: list


def run_to_convergence(
    cfg: SimConfig,
    state: State | None = None,
    callback=None,
) -> RunResult:
    """Chunked driver: ``report_interval`` steps per dispatch, then one scalar
    fetch for the convergence test |d mean(u)| / uLB < tol sustained for
    ``convergence_hits`` + 1 consecutive checks (the stop fires once hits
    *exceed* the threshold; reference: MRTtest.py:915-921).

    ``callback(step, state, rho, u)`` runs every interval (plots/VTK/metrics).
    """
    cfg.validate()
    if state is None:
        state = init_state(cfg)
    chunk = max(1, cfg.report_interval)
    runner = make_scan_runner(cfg, chunk)
    obs = jax.jit(functools.partial(observables, cfg))

    mean_u_past = np.inf
    hits = 0
    history = []
    steps_done = 0
    converged = False
    while steps_done < cfg.max_steps:
        state = runner(state)
        steps_done += chunk
        rho, u = obs(state)
        # f64 host reduction: at f32 the device mean's rounding floor sits near
        # the 1e-8 convergence tolerance (SURVEY.md section 7 risk note).
        mean_u = float(np.mean(np.asarray(u), dtype=np.float64))
        history.append(mean_u)
        if not np.isfinite(mean_u):
            raise FloatingPointError(
                f"simulation diverged at step {steps_done} (mean u = {mean_u})"
            )
        if callback is not None:
            callback(steps_done, state, rho, u)
        if abs(mean_u - mean_u_past) / cfg.u_lid < cfg.convergence_tol:
            hits += 1
            if hits > cfg.convergence_hits:
                converged = True
                break
        else:
            hits = 0
        mean_u_past = mean_u
    return RunResult(state=state, steps=steps_done, converged=converged,
                     mean_u_history=history)
