"""Sharded fused step: explicit two-phase halo exchange + masked wall handling.

The reference has no distributed backend (SURVEY.md §2.7); this module is the
TPU-native scale-out path.  The global lattice ``f (9, X, Y)`` is split over a
2-D device mesh; every step each shard

1. exchanges one-cell edge strips with its 4 axis neighbors over ICI
   (``jax.lax.ppermute``), two-phase (y strips first, then x strips of the
   y-padded block) so diagonal populations f5..f8 receive corner values,
2. gathers (pull-streams) from its padded block,
3. applies the reduced NEBB wall rewrites *masked* to shards that own a
   global boundary,
4. computes macros / equilibrium / collision purely locally.

The ppermute rings are periodic, which reproduces the single-chip engine's
``jnp.roll`` wrap semantics exactly: wrapped values only ever land in
populations that the wall rewrite overwrites (see ``ops/streaming.py``), so a
sharded run is bit-identical to the single-chip fused step on the same global
grid — and the test suite asserts exactly that.

Physics order mirrors ``engine._fused_gather_bc`` / ``engine._fused_macros``
(reference semantics: ``MRTTiledPull.py:403-508``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import lattice
from ..config import SimConfig
from ..engine import State, _collide, init_state
from ..ops.collision import van_driest_cs2_block
from ..ops.equilibrium import equilibrium, lid_row_density, macroscopics
from .mesh import lattice_sharding, row_sharding

_SPECS_STATE = (P(None, "mx", "my"), P("mx"))


def _ring(n: int, shift: int):
    """Periodic permutation: shard i sends to shard (i + shift) mod n."""
    return [(i, (i + shift) % n) for i in range(n)]


def exchange_halo(f: jnp.ndarray, mx: int, my: int) -> jnp.ndarray:
    """Pad the local block ``f (9, lx, ly)`` to ``(9, lx+2, ly+2)`` with
    neighbor edge strips; two-phase so corners propagate diagonally.

    Index convention: y index 0 is the lid side.  The strip that belongs at
    padded position ``y = 0`` is the *last* row of the ``my``-predecessor.
    """
    # Phase 1: y halos (rows).  Send our last row forward (+1) so everyone's
    # top halo is the predecessor's last row; first row backward for the
    # bottom halo.  Single-device axes wrap onto themselves == jnp.roll.
    top = jax.lax.ppermute(f[:, :, -1:], "my", _ring(my, 1))
    bot = jax.lax.ppermute(f[:, :, :1], "my", _ring(my, -1))
    fy = jnp.concatenate([top, f, bot], axis=2)        # (9, lx, ly+2)
    # Phase 2: x halos (columns of the y-padded block, corners included).
    left = jax.lax.ppermute(fy[:, -1:, :], "mx", _ring(mx, 1))
    right = jax.lax.ppermute(fy[:, :1, :], "mx", _ring(mx, -1))
    return jnp.concatenate([left, fy, right], axis=1)  # (9, lx+2, ly+2)


def _gather_from_padded(fpad: jnp.ndarray, lx: int, ly: int) -> jnp.ndarray:
    """Pull gather on the halo-padded block:
    out[k](x, y) = f[k](x - cx_k, y + cy_k)  (see ops/streaming.py)."""
    planes = []
    for k in range(lattice.Q):
        x0 = 1 - int(lattice.CX[k])
        y0 = 1 + int(lattice.CY[k])
        planes.append(fpad[k, x0 : x0 + lx, y0 : y0 + ly])
    return jnp.stack(planes)


def _edge_flags():
    """Scalar bools: does this shard own a global wall?"""
    ix = jax.lax.axis_index("mx")
    iy = jax.lax.axis_index("my")
    nx_sh = jax.lax.axis_size("mx")
    ny_sh = jax.lax.axis_size("my")
    return ix == 0, ix == nx_sh - 1, iy == 0, iy == ny_sh - 1


def _masked_set(g, k, idx_x, idx_y, value, flag):
    """g[k, idx_x, idx_y] = value where flag (a traced scalar) else keep."""
    old = g[k, idx_x, idx_y]
    return g.at[k, idx_x, idx_y].set(jnp.where(flag, value, old))


def _local_gather_bc(cfg: SimConfig, f, rho_lid_prev):
    """Local-shard version of ``engine._fused_gather_bc``: gather + reduced
    NEBB, with each wall rewrite masked to the shards owning that wall.
    Update order matches the single-chip step so corner chaining is identical."""
    mx, my = cfg.mesh_shape
    lx, ly = cfg.nx // mx, cfg.ny // my
    is_left, is_right, is_top, is_bottom = _edge_flags()

    fpad = exchange_halo(f, mx, my)
    g = _gather_from_padded(fpad, lx, ly)

    # Left wall (global x = 0): f1<-f3, f5<-f7, f8<-f6.
    g = _masked_set(g, 1, 0, slice(None), g[3, 0, :], is_left)
    g = _masked_set(g, 5, 0, slice(None), g[7, 0, :], is_left)
    g = _masked_set(g, 8, 0, slice(None), g[6, 0, :], is_left)
    # Right wall: f3<-f1, f6<-f8, f7<-f5.
    g = _masked_set(g, 3, lx - 1, slice(None), g[1, lx - 1, :], is_right)
    g = _masked_set(g, 6, lx - 1, slice(None), g[8, lx - 1, :], is_right)
    g = _masked_set(g, 7, lx - 1, slice(None), g[5, lx - 1, :], is_right)
    # Bottom wall (global y = ny-1): f2<-f4, f5<-f7, f6<-f8.
    g = _masked_set(g, 2, slice(None), ly - 1, g[4, :, ly - 1], is_bottom)
    g = _masked_set(g, 5, slice(None), ly - 1, g[7, :, ly - 1], is_bottom)
    g = _masked_set(g, 6, slice(None), ly - 1, g[8, :, ly - 1], is_bottom)
    # Moving lid (global y = 0): f4<-f2; f7<-f5 - mom; f8<-f6 + mom, with the
    # momentum term zeroed at the two global corner columns.
    mom = rho_lid_prev * (cfg.u_lid / 6.0)
    mom = mom.at[0].set(jnp.where(is_left, 0.0, mom[0]))
    mom = mom.at[lx - 1].set(jnp.where(is_right, 0.0, mom[lx - 1]))
    g = _masked_set(g, 4, slice(None), 0, g[2, :, 0], is_top)
    g = _masked_set(g, 7, slice(None), 0, g[5, :, 0] - mom, is_top)
    g = _masked_set(g, 8, slice(None), 0, g[6, :, 0] + mom, is_top)
    return g


def _local_macros(cfg: SimConfig, g):
    """Local-shard version of ``engine._fused_macros`` (GPU-kernel corner
    rules: the two lid corners belong to the side walls)."""
    mx, my = cfg.mesh_shape
    lx = cfg.nx // mx
    is_left, is_right, is_top, _is_bottom = _edge_flags()
    ly = cfg.ny // my

    rho, u = macroscopics(g)
    zero = jnp.zeros((), dtype=u.dtype)
    # Static walls: u = 0.
    u = u.at[:, 0, :].set(jnp.where(is_left, zero, u[:, 0, :]))
    u = u.at[:, lx - 1, :].set(jnp.where(is_right, zero, u[:, lx - 1, :]))
    u = u.at[:, :, ly - 1].set(jnp.where(_is_bottom, zero, u[:, :, ly - 1]))
    # Lid row: u = (u_lid, 0) and Zou-He closure density, excluding the global
    # corner columns (owned by the side walls).
    col_ok = jnp.ones((lx,), dtype=u.dtype)
    col_ok = col_ok.at[0].set(jnp.where(is_left, 0.0, 1.0))
    col_ok = col_ok.at[lx - 1].set(jnp.where(is_right, 0.0, 1.0))
    lid_mask = jnp.where(is_top, col_ok, jnp.zeros_like(col_ok))  # (lx,)
    u = u.at[0, :, 0].set(jnp.where(lid_mask > 0, cfg.u_lid, u[0, :, 0]))
    u = u.at[1, :, 0].set(jnp.where(lid_mask > 0, 0.0, u[1, :, 0]))
    rho_closure = lid_row_density(g[:, :, 0])
    rho = rho.at[:, 0].set(jnp.where(lid_mask > 0, rho_closure, rho[:, 0]))
    return rho, u


def _local_step(cfg: SimConfig, f, rho_lid):
    g = _local_gather_bc(cfg, f, rho_lid)
    rho, u = _local_macros(cfg, g)
    feq = equilibrium(rho, u)
    cs2 = None
    if cfg.turbulence == "smagorinsky" and cfg.van_driest:
        # Per-shard slice of the global Van Driest Cs^2 plane: wall distances
        # are global, so offset by this shard's mesh coordinates.
        mx, my = cfg.mesh_shape
        lx, ly = cfg.nx // mx, cfg.ny // my
        cs2 = van_driest_cs2_block(
            cfg.nx, cfg.ny,
            jax.lax.axis_index("mx") * lx, jax.lax.axis_index("my") * ly,
            lx, ly, cfg.u_lid / cfg.nu, dtype=f.dtype,
        )
    f_new = _collide(cfg, g, feq, rho, cs2_field=cs2)
    # New lid density, replicated across the my axis so the carried (X,)
    # vector stays consistent: only the top shards contribute.
    _, _, is_top, _ = _edge_flags()
    rho_lid_new = jax.lax.psum(
        jnp.where(is_top, rho[:, 0], jnp.zeros_like(rho[:, 0])), "my"
    )
    return f_new, rho_lid_new


def make_sharded_fused_step(cfg: SimConfig, mesh: Mesh) -> Callable[[State], State]:
    """One fused collide-and-stream step over the device mesh."""

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=_SPECS_STATE, out_specs=_SPECS_STATE
    )
    def step_local(f, rho_lid):
        return _local_step(cfg, f, rho_lid)

    def step(state: State) -> State:
        f, rho_lid = step_local(state.f, state.rho_lid)
        return State(f=f, rho_lid=rho_lid)

    return step


def make_sharded_scan_runner(cfg: SimConfig, n_steps: int, mesh: Mesh):
    """N sharded steps in one dispatch: the lax.scan lives *inside* shard_map
    so the whole chunk compiles to one SPMD program with per-step ICI halo
    exchanges and no host round-trips."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=_SPECS_STATE, out_specs=_SPECS_STATE
    )
    def run_local(f, rho_lid):
        def body(carry, _):
            return _local_step(cfg, *carry), None

        (f, rho_lid), _ = jax.lax.scan(body, (f, rho_lid), None, length=n_steps)
        return f, rho_lid

    def run(state: State) -> State:
        f, rho_lid = run_local(state.f, state.rho_lid)
        return State(f=f, rho_lid=rho_lid)

    return run


def sharded_observables(cfg: SimConfig, mesh: Mesh):
    """Sharded analogue of ``engine.observables``: boundary-corrected
    pre-collision (rho, u) as global (sharded) arrays."""

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=_SPECS_STATE,
        out_specs=(P("mx", "my"), P(None, "mx", "my")),
    )
    def obs_local(f, rho_lid):
        g = _local_gather_bc(cfg, f, rho_lid)
        return _local_macros(cfg, g)

    def obs(state: State):
        return obs_local(state.f, state.rho_lid)

    return obs


def shard_state(state: State, mesh: Mesh) -> State:
    """Place a (host or single-device) State onto the mesh."""
    f = jax.device_put(state.f, lattice_sharding(mesh))
    rho_lid = jax.device_put(state.rho_lid, row_sharding(mesh))
    return State(f=f, rho_lid=rho_lid)


def init_sharded_state(cfg: SimConfig, mesh: Mesh) -> State:
    return shard_state(init_state(cfg), mesh)
