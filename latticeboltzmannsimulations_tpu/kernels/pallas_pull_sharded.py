"""Sharded Pallas fused step: per-shard collide-and-stream kernel fed by an
ICI strip halo exchange — the scale-out performance path.

The local block is carried *already x-padded* ``(9, lx+2*tile_x, ly-ish)``
across steps (real columns at ``[tile_x, lx+tile_x)`` — a whole-tile anchor
so the kernel's output rides a normal pipelined BlockSpec with index map
``i+1``), so the per-step halo exchange is four
``ppermute`` edge strips plus four one-column ``dynamic_update_slice`` writes
— O(edge) traffic instead of the full-field concatenate an unpadded carry
would force (which costs an entire extra HBM pass per step).  The kernel
both *reads* windows of the padded buffer and *writes* its output back into
the same padded layout (pipelined block outputs at index ``i+1``), so the
carried layout is closed under the step and nothing ever reshapes the field.

Composition (all inside ``shard_map``):

1. y-halo lanes are refreshed by ``ppermute`` row strips (only when the mesh
   has ``my > 1`` or the lane count needs padding — an ``my == 1`` mesh with
   ``ly % 128 == 0`` skips halo lanes entirely and uses the single-chip
   kernel's lane-roll wrap semantics, avoiding the padded-lane tax), then
   the x edge columns (including fresh y-halo lanes — the two-phase corner
   trick) are exchanged and written into the halo columns 7 and ``lx+8``,
2. a Pallas kernel tiles the real columns, stages each tile's 8-aligned
   x-halo window HBM→VMEM double-buffered (prefetch rides under compute),
   pull-gathers with purely static offsets, applies the reduced NEBB
   rewrites masked by *shard ownership flags* passed as scalars, and DMAs
   the new tile back to the padded output buffer,
3. halo/dead columns of the output are garbage; the next step's strip
   exchange overwrites the halos before anything reads them.

The periodic ppermute rings reproduce the single-chip engine's wrap
semantics, so this backend is bit-identical to ``engine.make_fused_step`` on
the same global grid (asserted by tests on a CPU mesh in interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .. import lattice
from ..config import SimConfig
from ..engine import State, _collide
from ..ops.equilibrium import equilibrium, lid_row_density, macroscopics
from .pallas_pull import (_compiler_params, _grouped_rolls, _lane_roll,
                          pick_tile_x)

# Shared with the ppermute halo engine: the State sharding specs and the
# periodic ring permutation MUST stay identical across backends (the
# sharded runners are bit-pinned against each other), so there is exactly
# one definition, in parallel/halo.py.
from ..parallel.halo import _SPECS_STATE, _ring  # noqa: E402


def _shift_strip(x, axis_name: str, n: int, shift: int):
    """ppermute ring, with size-1 axes elided: a self-permute is an identity,
    but leaving the collective in the graph pins the surrounding buffers to
    HBM and forfeits XLA's VMEM-residency placement on degenerate meshes."""
    if n == 1:
        return x
    return jax.lax.ppermute(x, axis_name, _ring(n, shift))


def _lane_layout(my: int, ly: int) -> tuple[int, int]:
    """(py, y0): carried lane width and the first real lane.

    ``my == 1`` with tile-aligned lanes needs no halo lanes at all — the
    in-kernel lane roll wraps exactly like the single-chip engine (wrap
    values only land in wall-rewritten populations).  Otherwise carry
    ``ly + 2`` halo-padded lanes rounded up to the 128-lane tile so Mosaic
    can sublane-slice the HBM buffer; dead lanes beyond ``ly + 2`` hold
    garbage no real cell ever reads."""
    if my == 1 and ly % 128 == 0:
        return ly, 0
    return ((ly + 2 + 127) // 128) * 128, 1


def _make_local_kernel(cfg: SimConfig, lx: int, ly: int, tile_x: int,
                       py: int, y0: int, van_driest: bool, interpret: bool):
    """Kernel over one shard's x-padded block ``(9, lx + 2*tile_x, py)``.

    Real cells live at padded cols ``[tile_x, lx+tile_x)`` and lanes
    ``[y0, y0+ly)``.  Anchoring the real region at a whole-tile offset lets
    the *output* ride a normal pipelined BlockSpec (index map ``i + 1``)
    instead of manual DMA — Mosaic overlaps the writeback with compute, and
    XLA keeps its VMEM-residency placement option for the carried buffer.
    ``flags_ref`` holds (is_left, is_right, is_top, is_bottom) as int32.
    With ``van_driest`` the per-shard wall-damped Cs^2 plane rides in as a
    pipelined VMEM input tile (it is static per config and shard).
    """
    u_lid = cfg.u_lid
    n_tiles = lx // tile_x
    # Compiled path only — interpret keeps per-plane rolls (see pallas_pull).
    grouped_gather = (not interpret
                      and os.environ.get("LBM_GATHER_GROUPED", "1") == "1")

    def kernel(*refs):
        refs = list(refs)
        flags_ref, rho_lid_ref = refs.pop(0), refs.pop(0)
        cs2_ref = refs.pop(0) if van_driest else None
        (fp_hbm, f_out_ref, rho_row_ref, in_scratch, in_sem) = refs
        i = pl.program_id(0)
        f_left = flags_ref[0, 0] != 0
        f_right = flags_ref[0, 1] != 0
        f_top = flags_ref[0, 2] != 0
        f_bot = flags_ref[0, 3] != 0
        first = jnp.logical_and(i == 0, f_left)
        last = jnp.logical_and(i == n_tiles - 1, f_right)

        # --- stage the x-halo window HBM -> VMEM, double-buffered ----------
        # Window for tile t covers padded cols [(t+1)*TX - 8, (t+1)*TX + TX
        # + 8): the tile's real cols sit at scratch offset 8, its left/right
        # neighbors (halo or adjacent tile) at 7 / TX+8.  All offsets/shapes
        # 8-aligned; no edge clamping — every neighbor exists in the padded
        # buffer.
        def in_dma(t, slot):
            src0 = pl.multiple_of((t + 1) * tile_x - 8, 8)
            return pltpu.make_async_copy(
                fp_hbm.at[:, pl.ds(src0, tile_x + 16), :],
                in_scratch.at[slot],
                in_sem.at[slot],
            )

        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        @pl.when(i == 0)
        def _():
            in_dma(0, 0).start()

        @pl.when(i + 1 < n_tiles)
        def _():
            in_dma(i + 1, 1 - slot).start()

        in_dma(i, slot).wait()

        # --- pull gather: g_k(x, y) = f_k(x - cx, y + cy) -------------------
        # x via static slices of the staged window; y via a lane roll (halo
        # lanes absorb the roll wrap when carried; with y0 == 0 the wrap
        # values only land in wall-rewritten populations, single-chip style).
        planes = [in_scratch[slot, k,
                             8 - int(lattice.CX[k]):
                             8 - int(lattice.CX[k]) + tile_x, :]
                  for k in range(lattice.Q)]
        shifts = [-int(lattice.CY[k]) for k in range(lattice.Q)]
        if grouped_gather:
            gs = _grouped_rolls(planes, shifts, axis=1, interpret=interpret)
        else:
            gs = [_lane_roll(p, s, interpret)
                  for p, s in zip(planes, shifts)]

        col = jax.lax.broadcasted_iota(jnp.int32, (tile_x, py), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_x, py), 1)
        m_left = jnp.logical_and(first, col == 0)
        m_right = jnp.logical_and(last, col == tile_x - 1)
        m_bot = jnp.logical_and(f_bot, lane == y0 + ly - 1)  # last real lane
        m_lid = jnp.logical_and(f_top, lane == y0)           # first real lane

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
        cs2 = cs2_ref[:, :] if van_driest else None
        f_new = _collide(cfg, g, feq, rho, cs2_field=cs2)

        f_out_ref[:, :, :] = f_new
        rho_row_ref[:, 0] = rho[:, y0]  # lid value sits at the first real lane

    return kernel


def _make_local_step(cfg: SimConfig, mesh_shape, interpret: bool):
    mx, my = mesh_shape
    lx, ly = cfg.nx // mx, cfg.ny // my
    py, y0 = _lane_layout(my, ly)
    tile_x = pick_tile_x(lx, py)
    lxp = lx + 2 * tile_x  # real cols [tile_x, lx+tile_x)
    n_tiles = lx // tile_x
    van_driest = cfg.turbulence == "smagorinsky" and cfg.van_driest
    kernel = _make_local_kernel(cfg, lx, ly, tile_x, py, y0, van_driest,
                                interpret)

    def kernel_call(fp, rho_lid, flags, cs2):
        in_specs = [
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = [flags, rho_lid, fp]
        if van_driest:
            in_specs.insert(2, pl.BlockSpec((tile_x, py), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM))
            args.insert(2, cs2)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=[
                # real cols start a whole tile in: block index i + 1
                pl.BlockSpec((lattice.Q, tile_x, py), lambda i: (0, i + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((lattice.Q, lxp, py), fp.dtype),
                jax.ShapeDtypeStruct((lx, 1), fp.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, lattice.Q, tile_x + 16, py), fp.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * lx * py,
                bytes_accessed=2 * 9 * lx * py * 4,
                transcendentals=0,
            ),
            compiler_params=_compiler_params(lx, py),
            interpret=interpret,
        )(*args)

    def local_step(fp, rho_lid, flags, cs2):
        """One step on the x-padded local block ``fp (9, lx+2*tile_x, py)``."""
        ox = tile_x  # first real col
        if y0:
            # Refresh y-halo lanes (rows) from the my neighbors.
            top = _shift_strip(fp[:, ox : ox + lx, ly : ly + 1], "my", my, 1)
            bot = _shift_strip(fp[:, ox : ox + lx, 1:2], "my", my, -1)
            fp = jax.lax.dynamic_update_slice(fp, top, (0, ox, 0))
            fp = jax.lax.dynamic_update_slice(fp, bot, (0, ox, ly + 1))
        # x halo columns (carrying the fresh y-halo lanes -> corners).
        left = _shift_strip(fp[:, ox + lx - 1 : ox + lx, :], "mx", mx, 1)
        right = _shift_strip(fp[:, ox : ox + 1, :], "mx", mx, -1)
        fp = jax.lax.dynamic_update_slice(fp, left, (0, ox - 1, 0))
        fp = jax.lax.dynamic_update_slice(fp, right, (0, ox + lx, 0))

        fp_next, rho_row = kernel_call(fp, rho_lid[:, None], flags, cs2)
        is_top = flags[0, 2] != 0
        rho_lid_next = jax.lax.psum(
            jnp.where(is_top, rho_row[:, 0], jnp.zeros_like(rho_row[:, 0])),
            "my",
        )
        return fp_next, rho_lid_next

    return local_step, lx, ly, py, y0, tile_x, van_driest


def make_sharded_pallas_runner(
    cfg: SimConfig, n_steps: int, mesh: Mesh, interpret: bool = False
):
    """N sharded Pallas steps per dispatch; State-compatible with the jnp
    engines (global ``(9, X, Y)`` + ``(X,)`` lid density)."""
    cfg.validate()
    if cfg.boundary != "nebb":
        raise ValueError("sharded Pallas implements the reduced NEBB walls")
    mx, my = cfg.mesh_shape
    local_step, lx, ly, py, y0, ox, van_driest = _make_local_step(
        cfg, cfg.mesh_shape, interpret)

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
        fp = jnp.pad(f, ((0, 0), (ox, ox), (y0, py - ly - y0)))
        cs2 = None
        if van_driest:
            # Per-shard slice of the global wall-damped Cs^2 plane, padded
            # to the carried lane layout (halo/dead-lane values are inert).
            from ..ops.collision import van_driest_cs2_block

            blk = van_driest_cs2_block(
                cfg.nx, cfg.ny, ix * lx, iy * ly, lx, ly,
                cfg.u_lid / cfg.nu, dtype=f.dtype,
            )
            cs2 = jnp.pad(blk, ((0, 0), (y0, py - ly - y0)))

        def body(carry, _):
            fp, rho_lid = carry
            fp, rho_lid = local_step(fp, rho_lid, flags, cs2)
            return (fp, rho_lid), None

        (fp, rho_lid), _ = jax.lax.scan(
            body, (fp, rho_lid), None, length=n_steps)
        return fp[:, ox : ox + lx, y0 : y0 + ly], rho_lid

    def run(state: State) -> State:
        f, rho_lid = run_local(state.f, state.rho_lid)
        return State(f=f, rho_lid=rho_lid)

    return run
