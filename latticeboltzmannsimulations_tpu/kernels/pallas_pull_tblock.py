"""Temporally-blocked fused pull kernel: K collide-and-stream steps per
VMEM window — the classic trapezoid time-skewing optimization, sized for the
HBM-bound regime (fields too large for the VMEM-residency fast path of
``pallas_pull``).

Each grid program stages an x-window wide enough for K steps of upwind
reach, advances the *whole window* K steps entirely in VMEM, and writes back
only its own TX columns.  HBM traffic per step drops from
``(1 + halo) + 1`` field passes to ``((TX + 2K') / TX + 1) / K`` — ~7x less
at TX=64, K=8 — pushing the step from memory-bound toward compute-bound.

Correctness bookkeeping (the trapezoid):

* window column c holds global column i*TX - 2K' + c (K' = K rounded up to
  the 8-sublane tile); the tile's own columns sit at [2K', 2K'+TX);
* per in-window step, gathers use sublane/lane *rolls*: roll wrap plants
  garbage only at the window edges, and garbage creeps inward one column
  per step from each non-wall edge.  Own columns stay valid because their
  distance to any window edge is 2K' >= K + K';
* the domain walls *block* the creep: every population entering through a
  wall is NEBB-rewritten each step (masks keyed to global positions), so
  edge tiles lose no validity at the boundary side — and the lane rolls
  reproduce the single-chip engine's wrap semantics exactly (bit-parity
  with ``engine.make_fused_step``, asserted by tests);
* the lid-density memory ``rho_lid`` advances *inside* the window (the pull
  scheme's one-step recurrence), seeded from a windowed strip of the carried
  vector and written back for the own columns.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import lattice
from ..config import SimConfig
from ..engine import State, _collide
from ..ops.equilibrium import equilibrium, lid_row_density, macroscopics
from .pallas_pull import (VMEM_LIMIT_BYTES, _grouped_rolls, _lane_roll,
                          make_step)


def _sublane_roll(plane: jnp.ndarray, shift: int, interpret: bool):
    if shift == 0:
        return plane
    if interpret:
        return jnp.roll(plane, shift, axis=0)
    return pltpu.roll(plane, shift=shift % plane.shape[0], axis=0)


def pick_block(nx: int, ny: int, k_steps: int = 8):
    """(tile_x, K') under the raised VMEM limit: window (9, TX+4K', ny) +
    double out block + temps must fit ~64MB."""
    kp = ((k_steps + 7) // 8) * 8
    tx = 8
    while tx < nx // 2:
        cand = tx * 2
        if nx % cand:
            break
        working = 4 * ny * (9 * (cand + 4 * kp) + 18 * cand + 14 * cand)
        if working > 64 * 2**20:
            break
        tx = cand
    return tx, kp


def _make_kernel(cfg: SimConfig, tile_x: int, k_steps: int, kp: int,
                 interpret: bool):
    nx, ny = cfg.nx, cfg.ny
    u_lid = cfg.u_lid
    n_tiles = nx // tile_x
    w = tile_x + 4 * kp          # window width (sublanes)
    c = tile_x + 2 * kp          # columns copied per tile
    # Compiled path only — interpret keeps per-plane rolls (see pallas_pull).
    grouped_gather = (not interpret
                      and os.environ.get("LBM_GATHER_GROUPED", "1") == "1")

    def kernel(rho_lid_ref, f_hbm, f_out_ref, rho_lid_out_ref,
               scratch, scratch_l, sem, sem_l):
        i = pl.program_id(0)
        src0 = pl.multiple_of(jnp.clip(i * tile_x - kp, 0, nx - c), 8)
        dst0 = pl.multiple_of(src0 - (i * tile_x - 2 * kp), 8)  # {0,kp,2kp}
        dma = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(src0, c), :],
            scratch.at[:, pl.ds(dst0, c), :],
            sem,
        )
        dma.start()
        # rho_lid rides in a 128-lane panel (lane 0 is the value) so the
        # manual sublane-sliced DMA sees an unpadded lane dim.
        dma_l = pltpu.make_async_copy(
            rho_lid_ref.at[pl.ds(src0, c), :],
            scratch_l.at[pl.ds(dst0, c), :],
            sem_l,
        )
        dma_l.start()
        dma.wait()
        dma_l.wait()

        # Global column index of each window column (edge tiles: out-of-range
        # values simply never match a wall mask).
        gcol = (
            jax.lax.broadcasted_iota(jnp.int32, (w, ny), 0)
            + (i * tile_x - 2 * kp)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, ny), 1)
        m_left = gcol == 0
        m_right = gcol == nx - 1
        m_bot = lane == ny - 1
        m_lid = lane == 0
        corner = jnp.logical_or(m_left[:, 0], m_right[:, 0])  # (W,)

        fs = [scratch[k, :, :] for k in range(lattice.Q)]
        rho_lid_vec = scratch_l[:, 0]  # (W,)

        x_shifts = [int(lattice.CX[k]) for k in range(lattice.Q)]
        y_shifts = [-int(lattice.CY[k]) for k in range(lattice.Q)]
        for _s in range(k_steps):
            # pull gather on the window: sublane roll in x, lane roll in y,
            # grouped by shift (4 wide rolls instead of 12 narrow — same
            # values; see pallas_pull._grouped_rolls)
            if grouped_gather:
                xs = _grouped_rolls(fs, x_shifts, axis=0, interpret=interpret)
                gs = _grouped_rolls(xs, y_shifts, axis=1, interpret=interpret)
            else:
                gs = [_lane_roll(_sublane_roll(fs[k], x_shifts[k], interpret),
                                 y_shifts[k], interpret)
                      for k in range(lattice.Q)]
            # reduced NEBB, fused-engine order
            gs[1] = jnp.where(m_left, gs[3], gs[1])
            gs[5] = jnp.where(m_left, gs[7], gs[5])
            gs[8] = jnp.where(m_left, gs[6], gs[8])
            gs[3] = jnp.where(m_right, gs[1], gs[3])
            gs[6] = jnp.where(m_right, gs[8], gs[6])
            gs[7] = jnp.where(m_right, gs[5], gs[7])
            gs[2] = jnp.where(m_bot, gs[4], gs[2])
            gs[5] = jnp.where(m_bot, gs[7], gs[5])
            gs[6] = jnp.where(m_bot, gs[8], gs[6])
            mom_col = jnp.where(corner, 0.0, rho_lid_vec * (u_lid / 6.0))
            mom = mom_col[:, None]
            gs[4] = jnp.where(m_lid, gs[2], gs[4])
            gs[7] = jnp.where(m_lid, gs[5] - mom, gs[7])
            gs[8] = jnp.where(m_lid, gs[6] + mom, gs[8])
            g = jnp.stack(gs)
            # macros + wall overrides
            rho, u = macroscopics(g)
            m_static = m_left | m_right | m_bot
            ux = jnp.where(m_static, 0.0, u[0])
            uy = jnp.where(m_static, 0.0, u[1])
            m_lid_in = jnp.logical_and(m_lid, jnp.logical_not(m_left | m_right))
            ux = jnp.where(m_lid_in, u_lid, ux)
            uy = jnp.where(m_lid_in, 0.0, uy)
            rho = jnp.where(m_lid_in, lid_row_density(g), rho)
            u = jnp.stack([ux, uy])
            feq = equilibrium(rho, u)
            f_new = _collide(cfg, g, feq, rho)
            fs = [f_new[k] for k in range(lattice.Q)]
            rho_lid_vec = rho[:, 0]

        f_out_ref[:, :, :] = jnp.stack(
            [p[2 * kp : 2 * kp + tile_x, :] for p in fs]
        )
        rho_lid_out_ref[:, 0] = rho_lid_vec[2 * kp : 2 * kp + tile_x]

    return kernel


def make_block_step(cfg: SimConfig, k_steps: int = 8,
                    interpret: bool = False) -> Callable[[State], State]:
    """Advance the state by ``k_steps`` in ONE kernel dispatch."""
    cfg.validate()
    if cfg.precision != "float32" and not interpret:
        raise ValueError("the Pallas kernels are float32 (TPU-native precision)")
    if cfg.boundary != "nebb":
        raise ValueError("temporal blocking implements the reduced NEBB walls")
    if cfg.turbulence == "smagorinsky" and cfg.van_driest:
        raise ValueError("van-Driest needs a global field; use the jit engine")
    if not interpret and cfg.ny % 128:
        raise ValueError("compiled kernel needs ny % 128 == 0")
    nx, ny = cfg.nx, cfg.ny
    if nx % 8:
        raise ValueError(f"temporal blocking needs nx % 8 == 0, got {nx}")
    tile_x, kp = pick_block(nx, ny, k_steps)
    if nx % tile_x:
        raise ValueError(f"nx={nx} is not a multiple of the tile ({tile_x})")
    if k_steps > kp:
        raise ValueError(f"k_steps={k_steps} exceeds the K'={kp} halo depth")
    if nx < tile_x + 2 * kp:
        raise ValueError(f"grid nx={nx} too small for the K={k_steps} window")
    n_tiles = nx // tile_x
    kernel = _make_kernel(cfg, tile_x, k_steps, kp, interpret)

    def step(state: State) -> State:
        f = state.f
        rho_lid = jnp.pad(state.rho_lid.reshape(nx, 1), ((0, 0), (0, 127)))
        f_new, rho_lid_new = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # rho_lid windowed
                pl.BlockSpec(memory_space=pl.ANY),  # f stays in HBM
            ],
            out_specs=[
                pl.BlockSpec((lattice.Q, tile_x, ny), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(f.shape, f.dtype),
                jax.ShapeDtypeStruct((nx, 1), f.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((lattice.Q, tile_x + 4 * kp, ny), f.dtype),
                pltpu.VMEM((tile_x + 4 * kp, 128), f.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * nx * ny * k_steps,
                bytes_accessed=2 * 9 * nx * ny * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(rho_lid, f)
        return State(f=f_new, rho_lid=rho_lid_new.reshape(nx))

    return step


def make_scan_runner(cfg: SimConfig, n_steps: int, k_steps: int = 8,
                     interpret: bool = False):
    """n_steps via temporally-blocked dispatches (+ plain-kernel remainder)."""
    block = make_block_step(cfg, k_steps, interpret=interpret)
    n_blocks, rem = divmod(n_steps, k_steps)
    single = make_step(cfg, interpret=interpret) if rem else None

    @jax.jit
    def run(state: State) -> State:
        def body(s, _):
            return block(s), None

        state, _ = jax.lax.scan(body, state, None, length=n_blocks)
        for _ in range(rem):
            state = single(state)
        return state

    return run
