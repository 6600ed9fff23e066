"""Sharded temporally-blocked pull kernel: K collide-and-stream steps per
dispatch *per shard*, with the ICI halo exchange amortized over K steps —
the scale-out design point for HBM-bound grids (BASELINE "4096² sharded").

Composition (any ``mesh_shape = (mx, my)``; an ``my == 1`` mesh with
tile-aligned lanes keeps the single-chip lane layout and wrap semantics):

1. the local block is carried x-padded ``(9, lx + 2*tile_x, py)`` (real
   columns at ``[tile_x, lx+tile_x)``, the whole-tile anchor that lets
   outputs ride pipelined BlockSpecs with index map ``i+1``); when the mesh
   shards y (or ``ly % 128 != 0``) the lane axis carries K'-deep halo lanes
   too, rounded up to the 128-lane tile (``py``, real lanes at
   ``[y0, y0+ly)``);
2. every K steps, ``K'``-wide edge strips (K' = K rounded up to the
   8-sublane tile) are exchanged with the mesh neighbors (``ppermute``
   rings) — lane strips first, then column strips carrying the fresh
   corner lanes (two-phase corner trick) — ONE exchange per K steps
   instead of the per-step exchange of ``pallas_pull_sharded``;
3. the kernel advances each tile's trapezoid window K steps entirely in
   VMEM (same validity bookkeeping as ``pallas_pull_tblock``: exchanged K'
   halo cells are valid at block start, staleness creeps one cell per step,
   own cells sit >= K from every stale edge);  x wall masks are keyed to
   *global* columns via a per-shard offset scalar; y wall masks are keyed to
   the halo lanes' *content* rows (``grow in {0, ny}`` for the lid image,
   ``{-1, ny-1}`` for the bottom image), because the y wrap — unlike the x
   wrap — is trajectory-visible at the corners, so the ring-wrapped halo
   lanes must evolve exactly like the rows they mirror.  The result is
   bit-identical to ``engine.make_fused_step`` (tests);
4. the lid-density recurrence advances inside the window from a carried
   per-shard panel whose halo strips ride the same exchange; each shard
   reads the recurrence off whichever live lane holds content row 0 (the
   real lid on top shards, its wrap image on bottom shards), and after each
   block the panel is re-replicated across ``my`` from the top shard's
   exact value.
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
from .pallas_pull import VMEM_LIMIT_BYTES, _grouped_rolls, _lane_roll
from .pallas_pull_sharded import _SPECS_STATE, _shift_strip
from .pallas_pull_tblock import _sublane_roll, pick_block


def _make_kernel(cfg: SimConfig, lx: int, ly: int, tile_x: int, k_steps: int,
                 kp: int, py: int, y0: int, interpret: bool):
    nx, ny = cfg.nx, cfg.ny
    u_lid = cfg.u_lid
    w = tile_x + 4 * kp  # window width; own cols at offset 2*kp
    halo_lanes = y0 > 0  # y-sharded layout: real lanes at [y0, y0+ly)
    # Compiled path only — interpret keeps per-plane rolls (see pallas_pull).
    grouped_gather = (not interpret
                      and os.environ.get("LBM_GATHER_GROUPED", "1") == "1")
    x_shifts = [int(lattice.CX[k]) for k in range(lattice.Q)]
    y_shifts = [-int(lattice.CY[k]) for k in range(lattice.Q)]

    def kernel(sc_ref, rho_panel, f_hbm, f_out_ref, rho_out_ref,
               scratch, scratch_l, sem, sem_l):
        i = pl.program_id(0)
        # Window covers padded cols [(i+1)*TX - 2K', (i+1)*TX + TX + 2K'):
        # own cols at offset 2K', the K'-wide valid halo beyond them for the
        # shard-edge tiles, garbage pad past that (creep-safe, see module
        # docstring).  Always in bounds — no clipping, no dst shift.
        src0 = pl.multiple_of((i + 1) * tile_x - 2 * kp, 8)
        dma = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(src0, w), :], scratch, sem)
        dma.start()
        dma_l = pltpu.make_async_copy(
            rho_panel.at[pl.ds(src0, w), :], scratch_l, sem_l)
        dma_l.start()
        dma.wait()
        dma_l.wait()

        # Global column of each window column: window offset + padded-col
        # origin + this shard's global offset (SMEM scalar, = ix*lx - TX).
        gcol = (
            jax.lax.broadcasted_iota(jnp.int32, (w, py), 0)
            + src0 + sc_ref[0, 0]
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, py), 1)
        m_left = gcol == 0
        m_right = gcol == nx - 1
        if halo_lanes:
            # Content row of each lane (lane + iy*ly - y0, SMEM scalar):
            # masks key to content so ring-wrapped halo lanes evolve exactly
            # like the rows they mirror (grow == -1 / ny are the wrap images
            # of the bottom / lid rows on the edge shards).
            grow = lane + sc_ref[0, 1]
            live = lane < ly + 2 * kp
            m_bot = jnp.logical_and(
                jnp.logical_or(grow == ny - 1, grow == -1), live)
            m_lid = jnp.logical_and(
                jnp.logical_or(grow == 0, grow == ny), live)
            # Lid-density recurrence source: the single live lane holding
            # content row 0 (sc_ref[0,2] = 0 on row-0 shards, ny elsewhere;
            # middle shards match nothing and their panel is unused).
            m_rec = jnp.logical_and(grow == sc_ref[0, 2], live)
        else:
            m_bot = lane == ny - 1
            m_lid = lane == 0
            m_rec = None
        # All lid-density bookkeeping stays 2-D (W, 1): Mosaic rejects the
        # 1-D slice/gather forms (compiled-path constraint; interpret mode
        # accepts both).
        corner = jnp.logical_or(m_left[:, 0:1], m_right[:, 0:1])  # (W, 1)

        fs = [scratch[k, :, :] for k in range(lattice.Q)]
        rho_l = scratch_l[:, 0:1]  # (W, 1) lid-density carry

        for _s in range(k_steps):
            # Gather grouped by shift (4 wide rolls instead of 12 narrow —
            # same values; see pallas_pull._grouped_rolls).
            if grouped_gather:
                xs = _grouped_rolls(fs, x_shifts, axis=0, interpret=interpret)
                gs = _grouped_rolls(xs, y_shifts, axis=1, interpret=interpret)
            else:
                gs = [_lane_roll(_sublane_roll(fs[k], x_shifts[k], interpret),
                                 y_shifts[k], interpret)
                      for k in range(lattice.Q)]
            gs[1] = jnp.where(m_left, gs[3], gs[1])
            gs[5] = jnp.where(m_left, gs[7], gs[5])
            gs[8] = jnp.where(m_left, gs[6], gs[8])
            gs[3] = jnp.where(m_right, gs[1], gs[3])
            gs[6] = jnp.where(m_right, gs[8], gs[6])
            gs[7] = jnp.where(m_right, gs[5], gs[7])
            gs[2] = jnp.where(m_bot, gs[4], gs[2])
            gs[5] = jnp.where(m_bot, gs[7], gs[5])
            gs[6] = jnp.where(m_bot, gs[8], gs[6])
            mom = jnp.where(corner, 0.0, rho_l * (u_lid / 6.0))  # (W, 1)
            gs[4] = jnp.where(m_lid, gs[2], gs[4])
            gs[7] = jnp.where(m_lid, gs[5] - mom, gs[7])
            gs[8] = jnp.where(m_lid, gs[6] + mom, gs[8])
            g = jnp.stack(gs)
            rho, u = macroscopics(g)
            m_static = m_left | m_right | m_bot
            ux = jnp.where(m_static, 0.0, u[0])
            uy = jnp.where(m_static, 0.0, u[1])
            m_lid_in = jnp.logical_and(
                m_lid, jnp.logical_not(m_left | m_right))
            ux = jnp.where(m_lid_in, u_lid, ux)
            uy = jnp.where(m_lid_in, 0.0, uy)
            rho = jnp.where(m_lid_in, lid_row_density(g), rho)
            u = jnp.stack([ux, uy])
            feq = equilibrium(rho, u)
            f_new = _collide(cfg, g, feq, rho)
            fs = [f_new[k] for k in range(lattice.Q)]
            if halo_lanes:
                rho_l = jnp.sum(jnp.where(m_rec, rho, 0.0),
                                axis=1, keepdims=True)
            else:
                rho_l = rho[:, 0:1]

        f_out_ref[:, :, :] = jnp.stack(
            [p[2 * kp : 2 * kp + tile_x, :] for p in fs]
        )
        rho_out_ref[:, :] = jnp.broadcast_to(
            rho_l[2 * kp : 2 * kp + tile_x, :], (tile_x, 128)
        )

    return kernel


def make_sharded_tblock_runner(
    cfg: SimConfig, n_steps: int, mesh: Mesh, k_steps: int = 16,
    interpret: bool = False, force_halo_layout: bool = False,
    halo_impl: str = "ppermute",
):
    """N sharded steps per dispatch, K at a time per halo exchange.
    State-compatible with the jnp engines; remainder steps (``n_steps %
    k_steps``) run through the per-step sharded kernel.

    ``force_halo_layout`` opts an ``my == 1`` mesh into the y-sharded
    halo-lane layout (self-exchange rings): it lets a single chip drive the
    content-keyed mask path through the compiled Mosaic kernel, where the
    multi-device parity tests only reach interpret mode.

    ``halo_impl`` selects the x-ring strip transport: ``"ppermute"`` (XLA
    collectives, the validated default) or ``"rdma"`` (in-kernel
    ``make_async_remote_copy`` pushes, ``kernels/halo_rdma.py`` — flag-gated
    until real multi-chip hardware can validate the ``mx > 1`` path)."""
    cfg.validate()
    if halo_impl not in ("ppermute", "rdma"):
        raise ValueError(f"unknown halo_impl {halo_impl!r}")
    if cfg.boundary != "nebb":
        raise ValueError("sharded tblock implements the reduced NEBB walls")
    if cfg.turbulence == "smagorinsky" and cfg.van_driest:
        raise ValueError("van-Driest needs a static plane; not staged here")
    mx, my = cfg.mesh_shape
    if cfg.nx % mx or cfg.ny % my:
        raise ValueError("grid must divide the mesh shape")
    lx, ly = cfg.nx // mx, cfg.ny // my
    ny = cfg.ny
    kp = ((k_steps + 7) // 8) * 8
    if my == 1 and not force_halo_layout:
        # Lanes keep the full ny width: single-chip lane layout, in-kernel
        # roll wrap — no halo lanes, no padded-lane tax.
        if not interpret and ny % 128:
            raise ValueError("compiled kernel needs ny % 128 == 0")
        py, y0 = ny, 0
    else:
        # y-sharded: carry K'-deep halo lanes each side, rounded up to the
        # 128-lane tile; real lanes at [y0, y0+ly).
        if ly < kp:
            raise ValueError(
                f"shard lane width ({ly}) narrower than the K'={kp} halo"
            )
        py = -(-(ly + 2 * kp) // 128) * 128 if not interpret else ly + 2 * kp
        y0 = kp
    tile_x, kp = pick_block(lx, py, k_steps)
    if k_steps > kp:
        raise ValueError(f"k_steps={k_steps} exceeds the K'={kp} halo depth")
    if tile_x < 2 * kp:
        raise ValueError(
            f"shard tile ({tile_x}) narrower than 2K'={2 * kp}; lower k_steps"
        )
    lxp = lx + 2 * tile_x  # real cols [tile_x, lx+tile_x)
    n_tiles = lx // tile_x
    ox = tile_x
    kernel = _make_kernel(cfg, lx, ly, tile_x, k_steps, kp, py, y0, interpret)

    x_exchange = None
    if halo_impl == "rdma":
        from .halo_rdma import make_x_halo_exchange

        x_exchange = make_x_halo_exchange(
            mx, lxp, py, kp, ox, lx,
            jnp.float32 if cfg.precision == "float32" else jnp.float64,
            interpret=interpret,
        )

    n_blocks, rem = divmod(n_steps, k_steps)

    def kernel_call(fp, rho_panel, sc):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # rho panel, windowed
                pl.BlockSpec(memory_space=pl.ANY),  # f, windowed
            ],
            out_specs=[
                pl.BlockSpec((lattice.Q, tile_x, py), lambda i: (0, i + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_x, 128), lambda i: (i + 1, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((lattice.Q, lxp, py), fp.dtype),
                jax.ShapeDtypeStruct((lxp, 128), fp.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((lattice.Q, tile_x + 4 * kp, py), fp.dtype),
                pltpu.VMEM((tile_x + 4 * kp, 128), fp.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * lx * ly * k_steps,
                bytes_accessed=2 * 9 * lx * py * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(sc, rho_panel, fp)

    def block_step(fp, rho_panel, sc, is_row0):
        """K steps: exchange K'-deep halo strips (lane strips first, then
        column strips carrying the fresh corner lanes), one kernel call,
        then re-replicate the lid panel across the y axis."""
        if y0:
            dn = _shift_strip(fp[:, :, y0 + ly - kp : y0 + ly], "my", my, 1)
            up = _shift_strip(fp[:, :, y0 : y0 + kp], "my", my, -1)
            fp = jax.lax.dynamic_update_slice(fp, dn, (0, 0, 0))
            fp = jax.lax.dynamic_update_slice(fp, up, (0, 0, y0 + ly))
        if x_exchange is not None:
            # In-kernel RDMA strip push (after the y phase, so the strips
            # carry the fresh corner lanes exactly like the ppermute path).
            fp, rho_panel = x_exchange(fp, rho_panel)
        else:
            left = _shift_strip(fp[:, ox + lx - kp : ox + lx, :], "mx", mx, 1)
            right = _shift_strip(fp[:, ox : ox + kp, :], "mx", mx, -1)
            fp = jax.lax.dynamic_update_slice(fp, left, (0, ox - kp, 0))
            fp = jax.lax.dynamic_update_slice(fp, right, (0, ox + lx, 0))
            lid_l = _shift_strip(
                rho_panel[ox + lx - kp : ox + lx, :], "mx", mx, 1)
            lid_r = _shift_strip(rho_panel[ox : ox + kp, :], "mx", mx, -1)
            rho_panel = jax.lax.dynamic_update_slice(
                rho_panel, lid_l, (ox - kp, 0))
            rho_panel = jax.lax.dynamic_update_slice(
                rho_panel, lid_r, (ox + lx, 0))
        fp, rho_panel = kernel_call(fp, rho_panel, sc)
        if my > 1:
            # Only the row-0 shards advanced the recurrence from the real
            # lid lane; broadcast their exact panel to the rest of the ring.
            rho_panel = jax.lax.psum(
                jnp.where(is_row0, rho_panel, jnp.zeros_like(rho_panel)),
                "my",
            )
        return fp, rho_panel

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=_SPECS_STATE,
        out_specs=_SPECS_STATE,
        check_vma=False,
    )
    def run_local(f, rho_lid):
        ix = jax.lax.axis_index("mx")
        iy = jax.lax.axis_index("my")
        sc = jnp.stack([
            ix * lx - ox,
            iy * ly - y0,
            jnp.where(iy == 0, 0, ny),
        ]).astype(jnp.int32).reshape(1, 3)
        is_row0 = iy == 0
        fp = jnp.pad(f, ((0, 0), (ox, ox), (y0, py - ly - y0)))
        rho_panel = jnp.pad(rho_lid[:, None], ((ox, ox), (0, 127)))

        def body(carry, _):
            fp, rho_panel = carry
            return block_step(fp, rho_panel, sc, is_row0), None

        (fp, rho_panel), _ = jax.lax.scan(
            body, (fp, rho_panel), None, length=n_blocks)
        return fp[:, ox : ox + lx, y0 : y0 + ly], rho_panel[ox : ox + lx, 0]

    single = None
    if rem:
        from .pallas_pull_sharded import make_sharded_pallas_runner

        single = make_sharded_pallas_runner(cfg, rem, mesh,
                                            interpret=interpret)

    def run(state: State) -> State:
        f, rho_lid = run_local(state.f, state.rho_lid)
        state = State(f=f, rho_lid=rho_lid)
        if single is not None:
            state = single(state)
        return state

    return run
