"""Sharded temporally-blocked pull kernel: K collide-and-stream steps per
dispatch *per shard*, with the ICI halo exchange amortized over K steps —
the scale-out design point for HBM-bound grids (BASELINE "4096² sharded").

Composition (x-only decomposition, ``mesh_shape = (mx, 1)`` — the natural
pod mapping for this stencil: lanes keep the full ny width and the lane-roll
wrap semantics of the single-chip kernels, while the sharded axis exchanges
thin column strips over ICI):

1. the local block is carried x-padded ``(9, lx + 2*tile_x, ny)`` (real
   columns at ``[tile_x, lx+tile_x)``, the whole-tile anchor that lets
   outputs ride pipelined BlockSpecs with index map ``i+1``);
2. every K steps, ``K'``-wide edge strips (K' = K rounded up to the
   8-sublane tile) are exchanged with the x neighbors (``ppermute``) and
   written into the halo region — ONE exchange per K steps instead of the
   per-step exchange of ``pallas_pull_sharded``;
3. the kernel advances each tile's trapezoid window K steps entirely in
   VMEM (same validity bookkeeping as ``pallas_pull_tblock``: the exchanged
   K' halo columns are valid at block start, staleness creeps one column
   per step, and own columns sit 2K' >= K + K' from every window edge);
   wall masks are keyed to *global* columns via a per-shard offset scalar,
   so the periodic strip rings reproduce the single-chip wrap semantics and
   the result is bit-identical to ``engine.make_fused_step`` (tests);
4. the lid-density recurrence advances inside the window from a carried
   per-shard panel whose halo strips ride the same exchange.
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
from .pallas_pull import VMEM_LIMIT_BYTES, _lane_roll
from .pallas_pull_sharded import _SPECS_STATE, _shift_strip
from .pallas_pull_tblock import _sublane_roll, pick_block


def _make_kernel(cfg: SimConfig, lx: int, tile_x: int, k_steps: int, kp: int,
                 interpret: bool):
    nx, ny = cfg.nx, cfg.ny
    u_lid = cfg.u_lid
    w = tile_x + 4 * kp  # window width; own cols at offset 2*kp

    def kernel(xoff_ref, rho_panel, f_hbm, f_out_ref, rho_out_ref,
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
            jax.lax.broadcasted_iota(jnp.int32, (w, ny), 0)
            + src0 + xoff_ref[0, 0]
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, ny), 1)
        m_left = gcol == 0
        m_right = gcol == nx - 1
        m_bot = lane == ny - 1
        m_lid = lane == 0
        # All lid-density bookkeeping stays 2-D (W, 1): Mosaic rejects the
        # 1-D slice/gather forms (compiled-path constraint; interpret mode
        # accepts both).
        corner = jnp.logical_or(m_left[:, 0:1], m_right[:, 0:1])  # (W, 1)

        fs = [scratch[k, :, :] for k in range(lattice.Q)]
        rho_l = scratch_l[:, 0:1]  # (W, 1) lid-density carry

        for _s in range(k_steps):
            gs = []
            for k in range(lattice.Q):
                cx = int(lattice.CX[k])
                cy = int(lattice.CY[k])
                p = _sublane_roll(fs[k], cx, interpret)
                gs.append(_lane_roll(p, -cy, interpret))
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
    interpret: bool = False,
):
    """N sharded steps per dispatch, K at a time per halo exchange.
    State-compatible with the jnp engines; remainder steps (``n_steps %
    k_steps``) run through the per-step sharded kernel."""
    cfg.validate()
    if cfg.boundary != "nebb":
        raise ValueError("sharded tblock implements the reduced NEBB walls")
    if cfg.turbulence == "smagorinsky" and cfg.van_driest:
        raise ValueError("van-Driest needs a static plane; not staged here")
    mx, my = cfg.mesh_shape
    if my != 1:
        raise ValueError(
            "sharded temporal blocking is x-only decomposition (mesh (mx, 1))"
            " — lanes keep full ny so the wrap semantics stay single-chip"
        )
    if not interpret and cfg.ny % 128:
        raise ValueError("compiled kernel needs ny % 128 == 0")
    lx, ny = cfg.nx // mx, cfg.ny
    tile_x, kp = pick_block(lx, ny, k_steps)
    if k_steps > kp:
        raise ValueError(f"k_steps={k_steps} exceeds the K'={kp} halo depth")
    if tile_x < 2 * kp:
        raise ValueError(
            f"shard tile ({tile_x}) narrower than 2K'={2 * kp}; lower k_steps"
        )
    lxp = lx + 2 * tile_x  # real cols [tile_x, lx+tile_x)
    n_tiles = lx // tile_x
    ox = tile_x
    kernel = _make_kernel(cfg, lx, tile_x, k_steps, kp, interpret)

    n_blocks, rem = divmod(n_steps, k_steps)

    def kernel_call(fp, rho_panel, xoff):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # rho panel, windowed
                pl.BlockSpec(memory_space=pl.ANY),  # f, windowed
            ],
            out_specs=[
                pl.BlockSpec((lattice.Q, tile_x, ny), lambda i: (0, i + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_x, 128), lambda i: (i + 1, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((lattice.Q, lxp, ny), fp.dtype),
                jax.ShapeDtypeStruct((lxp, 128), fp.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((lattice.Q, tile_x + 4 * kp, ny), fp.dtype),
                pltpu.VMEM((tile_x + 4 * kp, 128), fp.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * lx * ny * k_steps,
                bytes_accessed=2 * 9 * lx * ny * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(xoff, rho_panel, fp)

    def block_step(fp, rho_panel, xoff):
        """K steps: exchange K'-wide halo strips, then one kernel call."""
        left = _shift_strip(fp[:, ox + lx - kp : ox + lx, :], "mx", mx, 1)
        right = _shift_strip(fp[:, ox : ox + kp, :], "mx", mx, -1)
        fp = jax.lax.dynamic_update_slice(fp, left, (0, ox - kp, 0))
        fp = jax.lax.dynamic_update_slice(fp, right, (0, ox + lx, 0))
        lid_l = _shift_strip(
            rho_panel[ox + lx - kp : ox + lx, :], "mx", mx, 1)
        lid_r = _shift_strip(rho_panel[ox : ox + kp, :], "mx", mx, -1)
        rho_panel = jax.lax.dynamic_update_slice(rho_panel, lid_l, (ox - kp, 0))
        rho_panel = jax.lax.dynamic_update_slice(rho_panel, lid_r, (ox + lx, 0))
        return kernel_call(fp, rho_panel, xoff)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=_SPECS_STATE,
        out_specs=_SPECS_STATE,
        check_vma=False,
    )
    def run_local(f, rho_lid):
        ix = jax.lax.axis_index("mx")
        xoff = (ix * lx - ox).astype(jnp.int32).reshape(1, 1)
        fp = jnp.pad(f, ((0, 0), (ox, ox), (0, 0)))
        rho_panel = jnp.pad(rho_lid[:, None], ((ox, ox), (0, 127)))

        def body(carry, _):
            fp, rho_panel = carry
            return block_step(fp, rho_panel, xoff), None

        (fp, rho_panel), _ = jax.lax.scan(
            body, (fp, rho_panel), None, length=n_blocks)
        return fp[:, ox : ox + lx, :], rho_panel[ox : ox + lx, 0]

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
