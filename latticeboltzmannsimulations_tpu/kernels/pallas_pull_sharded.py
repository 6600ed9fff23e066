"""Sharded Pallas fused step: per-shard collide-and-stream kernel fed by the
ICI halo exchange — the scale-out performance path.

Composition (all inside ``shard_map``):

1. the carried local block is y-padded ``(9, lx, ly+2)``; each step its two
   halo lanes are refreshed by ``ppermute`` row strips, then the x edge
   columns (including the fresh y-halo lanes — the two-phase corner trick)
   are exchanged and concatenated into an x-padded window ``(9, lx+8, ly+2)``
   (8-aligned for the DMA tiling rule),
2. a Pallas kernel tiles the real columns, windows the padded field
   HBM→VMEM, pull-gathers with purely static offsets (no edge clamping —
   every neighbor exists in the padded window), applies the reduced NEBB
   rewrites masked by *shard ownership flags* passed as scalars, and writes
   the next local block,
3. the halo lanes the kernel writes are garbage; the next step's exchange
   overwrites them before anything reads them.

The periodic ppermute rings reproduce the single-chip engine's wrap
semantics, so this backend is bit-identical to ``engine.make_fused_step`` on
the same global grid (asserted by tests on a CPU mesh in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .. import lattice
from ..config import SimConfig
from ..engine import State, _collide
from ..ops.equilibrium import equilibrium, lid_row_density, macroscopics
from .pallas_pull import _compiler_params, _lane_roll, pick_tile_x

_SPECS_STATE = (P(None, "mx", "my"), P("mx"))


def _ring(n: int, shift: int):
    return [(i, (i + shift) % n) for i in range(n)]


def _padded_lanes(ly: int) -> int:
    """Carried lane width: ly real lanes + 2 halo lanes, rounded up to the
    128-lane tile so Mosaic can sublane-slice the HBM buffer (unpadded-lane
    arrays get relayout-padded and become unsliceable).  Dead lanes beyond
    ly+2 hold garbage that no real cell ever reads."""
    return ((ly + 2 + 127) // 128) * 128


def _make_local_kernel(cfg: SimConfig, lx: int, ly: int, tile_x: int,
                       interpret: bool):
    """Kernel over one shard's x-padded window.

    Real cells live at padded cols [1, lx+1) and lanes [1, ly+1).
    ``flags_ref`` holds (is_left, is_right, is_top, is_bottom) as int32.
    """
    u_lid = cfg.u_lid
    n_tiles = lx // tile_x
    py = _padded_lanes(ly)

    def kernel(flags_ref, rho_lid_ref, fp_hbm, f_out_ref, rho_row_ref,
               scratch, sem):
        i = pl.program_id(0)
        f_left = flags_ref[0, 0] != 0
        f_right = flags_ref[0, 1] != 0
        f_top = flags_ref[0, 2] != 0
        f_bot = flags_ref[0, 3] != 0
        first = jnp.logical_and(i == 0, f_left)
        last = jnp.logical_and(i == n_tiles - 1, f_right)

        src0 = pl.multiple_of(i * tile_x, 8)
        dma = pltpu.make_async_copy(
            fp_hbm.at[:, pl.ds(src0, tile_x + 8), :], scratch, sem
        )
        dma.start()
        dma.wait()

        # Pull gather: tile-local col t is padded col i*TX+1+t; population k
        # reads padded col (…)-cx -> scratch col 1+t-cx, lanes roll by -cy
        # (halo lanes absorb the wrap; real lanes read real neighbors).
        gs = []
        for k in range(lattice.Q):
            cx = int(lattice.CX[k])
            cy = int(lattice.CY[k])
            p = scratch[k, 1 - cx : 1 - cx + tile_x, :]
            gs.append(_lane_roll(p, -cy, interpret))

        col = jax.lax.broadcasted_iota(jnp.int32, (tile_x, py), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_x, py), 1)
        m_left = jnp.logical_and(first, col == 0)
        m_right = jnp.logical_and(last, col == tile_x - 1)
        m_bot = jnp.logical_and(f_bot, lane == ly)   # last real lane
        m_lid = jnp.logical_and(f_top, lane == 1)    # first real lane

        # Reduced NEBB, fused-engine order (left, right, bottom, lid).
        gs[1] = jnp.where(m_left, gs[3], gs[1])
        gs[5] = jnp.where(m_left, gs[7], gs[5])
        gs[8] = jnp.where(m_left, gs[6], gs[8])
        gs[3] = jnp.where(m_right, gs[1], gs[3])
        gs[6] = jnp.where(m_right, gs[8], gs[6])
        gs[7] = jnp.where(m_right, gs[5], gs[7])
        gs[2] = jnp.where(m_bot, gs[4], gs[2])
        gs[5] = jnp.where(m_bot, gs[7], gs[5])
        gs[6] = jnp.where(m_bot, gs[8], gs[6])
        mom_col = rho_lid_ref[:, 0] * (u_lid / 6.0)
        corner = jnp.logical_or(m_left[:, 0], m_right[:, 0])
        mom_col = jnp.where(corner, 0.0, mom_col)
        mom = mom_col[:, None]
        gs[4] = jnp.where(m_lid, gs[2], gs[4])
        gs[7] = jnp.where(m_lid, gs[5] - mom, gs[7])
        gs[8] = jnp.where(m_lid, gs[6] + mom, gs[8])
        g = jnp.stack(gs)

        rho, u = macroscopics(g)
        m_static = m_left | m_right | m_bot
        ux = jnp.where(m_static, 0.0, u[0])
        uy = jnp.where(m_static, 0.0, u[1])
        m_lid_in = jnp.logical_and(m_lid, jnp.logical_not(m_left | m_right))
        ux = jnp.where(m_lid_in, u_lid, ux)
        uy = jnp.where(m_lid_in, 0.0, uy)
        rho_closure = lid_row_density(g)
        rho = jnp.where(m_lid_in, rho_closure, rho)
        u = jnp.stack([ux, uy])

        feq = equilibrium(rho, u)
        f_new = _collide(cfg, g, feq, rho)

        f_out_ref[:, :, :] = f_new
        rho_row_ref[:, 0] = rho[:, 1]  # lid value sits at the first real lane

    return kernel


def _make_local_step(cfg: SimConfig, mesh_shape, interpret: bool):
    mx, my = mesh_shape
    lx, ly = cfg.nx // mx, cfg.ny // my
    py = _padded_lanes(ly)
    tile_x = pick_tile_x(lx, py)
    n_tiles = lx // tile_x
    kernel = _make_local_kernel(cfg, lx, ly, tile_x, interpret)

    def kernel_call(fp, rho_lid, flags):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((lattice.Q, tile_x, py), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((lattice.Q, lx, py), fp.dtype),
                jax.ShapeDtypeStruct((lx, 1), fp.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((lattice.Q, tile_x + 8, py), fp.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * lx * py,
                bytes_accessed=2 * 9 * lx * py * 4,
                transcendentals=0,
            ),
            compiler_params=_compiler_params(lx, py),
            interpret=interpret,
        )(flags, rho_lid, fp)

    def local_step(fy, rho_lid, flags):
        """One step on the y-padded local block ``fy (9, lx, ly+2)``."""
        # Refresh y-halo lanes (rows) from the my neighbors.
        top = jax.lax.ppermute(fy[:, :, ly : ly + 1], "my", _ring(my, 1))
        bot = jax.lax.ppermute(fy[:, :, 1:2], "my", _ring(my, -1))
        fy = jax.lax.dynamic_update_slice(fy, top, (0, 0, 0))
        fy = jax.lax.dynamic_update_slice(fy, bot, (0, 0, ly + 1))
        # x halo columns (carrying the fresh y-halo lanes -> corners).
        left = jax.lax.ppermute(fy[:, lx - 1 : lx, :], "mx", _ring(mx, 1))
        right = jax.lax.ppermute(fy[:, 0:1, :], "mx", _ring(mx, -1))
        dead = jnp.zeros((lattice.Q, 6, py), fy.dtype)
        fp = jnp.concatenate([left, fy, right, dead], axis=1)

        rho_lid_col = rho_lid[:, None]
        f_next, rho_row = kernel_call(fp, rho_lid_col, flags)
        is_top = flags[0, 2] != 0
        rho_lid_next = jax.lax.psum(
            jnp.where(is_top, rho_row[:, 0], jnp.zeros_like(rho_row[:, 0])),
            "my",
        )
        return f_next, rho_lid_next

    return local_step, lx, ly


def make_sharded_pallas_runner(
    cfg: SimConfig, n_steps: int, mesh: Mesh, interpret: bool = False
):
    """N sharded Pallas steps per dispatch; State-compatible with the jnp
    engines (global ``(9, X, Y)`` + ``(X,)`` lid density)."""
    cfg.validate()
    if cfg.boundary != "nebb":
        raise ValueError("sharded Pallas implements the reduced NEBB walls")
    mx, my = cfg.mesh_shape
    local_step, lx, ly = _make_local_step(cfg, cfg.mesh_shape, interpret)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=_SPECS_STATE,
        out_specs=_SPECS_STATE,
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    def run_local(f, rho_lid):
        ix = jax.lax.axis_index("mx")
        iy = jax.lax.axis_index("my")
        flags = jnp.stack([
            (ix == 0).astype(jnp.int32),
            (ix == mx - 1).astype(jnp.int32),
            (iy == 0).astype(jnp.int32),
            (iy == my - 1).astype(jnp.int32),
        ]).reshape(1, 4)
        py = _padded_lanes(ly)
        fy = jnp.pad(f, ((0, 0), (0, 0), (1, py - ly - 1)))

        def body(carry, _):
            fy, rho_lid = carry
            fy, rho_lid = local_step(fy, rho_lid, flags)
            return (fy, rho_lid), None

        (fy, rho_lid), _ = jax.lax.scan(
            body, (fy, rho_lid), None, length=n_steps)
        return fy[:, :, 1 : ly + 1], rho_lid

    def run(state: State) -> State:
        f, rho_lid = run_local(state.f, state.rho_lid)
        return State(f=f, rho_lid=rho_lid)

    return run
