"""Fused push collide-and-stream Pallas kernel (reference E10 capability).

TPU re-design of the reference's SoA tiled *push* kernel
(``MRTTiledPush.py:347-470``).  Mosaic has no scatter store, so the push
scheme's defining operation — write population ``k`` to the downwind
neighbor — cannot be expressed as an overlapping store the way the CUDA
kernel does it.  Instead this kernel uses the halo-recompute trick:

* each grid program stages an 8-aligned x-halo window of the *pre-collision*
  field (the same DMA layout as ``pallas_pull.py``),
* computes macroscopics → wall-velocity override → equilibrium → collision
  over the window *including its one-column halos* (the halo collision is
  redundant with the neighbor tile's own compute — that redundancy is what
  replaces the scatter),
* streams in VMEM: per-plane static x-slices + lane rolls of the
  *post-collision* window (``stream_push`` ≡ ``gather_pull`` on fpost,
  ``ops/streaming.py:53``),
* applies the full NEBB wall rewrite branch-free in the ``boundary.nebb``
  order (left, right, bottom, lid) with this step's equilibrium.

The trajectory is pinned to ``engine.make_push_oracle_step`` (MRT.py order:
collide → stream → BC) by ``tests/test_pallas_push.py`` — to 1e-13 in f64
(the oracle-pinning convention); in f32 the agreement is ulp-level rather
than bit-exact because XLA contracts the oracle's row-sliced ``.at`` NEBB
into FMAs differently than the kernel's plane-wide ``where`` form.
State is the plain pre-collision field ``f`` — the push scheme needs no
lid-density carry (the wet-node closure runs before collision each step).

Stale window columns at the global edges (and the x-wrap they replace) feed
only populations the NEBB rewrite overwrites — the same invariant the pull
kernel relies on; the y-wrap rides full-width lane rolls and is therefore
global, exactly like the oracle's ``jnp.roll``.

The pull kernel remains the production path: push pays the halo-recompute
tax of (TX+16)/TX on compute and needs the full 4-term NEBB (the pull
scheme's reduced in-register form does not apply), reproducing the
reference's own E9-over-E10 conclusion at kernel-design level rather than
by measurement accident.
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
from ..engine import _collide
from ..ops.equilibrium import equilibrium, lid_row_density, macroscopics
from .pallas_pull import (
    _compiler_params,
    _grouped_rolls,
    _is_small_field,
    _lane_roll,
    _make_window_dma,
    pick_tile_x,
)


def _make_kernel(cfg: SimConfig, tile_x: int, interpret: bool, n_buf: int):
    nx, ny = cfg.nx, cfg.ny
    u_lid = cfg.u_lid
    n_tiles = nx // tile_x
    grouped_gather = (not interpret
                      and os.environ.get("LBM_GATHER_GROUPED", "1") == "1")
    w = tile_x + 16          # compute-slice width (own cols at offset 8)

    def kernel(f_hbm, f_out_ref, scratch, sem):
        i = pl.program_id(0)
        first = i == 0
        last = i == n_tiles - 1

        # --- stage the x-halo window HBM -> VMEM (pallas_pull layout) ------
        window_dma = _make_window_dma(nx, tile_x, f_hbm, scratch, sem)

        if n_buf == 2:
            slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

            @pl.when(i == 0)
            def _():
                window_dma(i, slot).start()

            @pl.when(i + 1 < n_tiles)
            def _():
                window_dma(i + 1, 1 - slot).start()
        else:
            slot = 0
            window_dma(i, slot).start()

        window_dma(i, slot).wait()

        # Compute slice: c-index j holds global column i*TX - 8 + j; the
        # tile's own columns sit at j in [8, 8+TX).  Streaming reach is one
        # column, so only j in [7, 8+TX+1) matters — stale columns beyond
        # feed nothing that survives.
        fs = [scratch[slot, k, 8 : 8 + w, :] for k in range(lattice.Q)]
        f_c = jnp.stack(fs)  # (9, W, ny)

        # --- macroscopics + wall-velocity override (oracle order) ---------
        col = jax.lax.broadcasted_iota(jnp.int32, (w, ny), 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (w, ny), 1)
        m_left = jnp.logical_and(first, col == 8)
        m_right = jnp.logical_and(last, col == 8 + tile_x - 1)
        m_bot = row == ny - 1
        m_lid = row == 0

        rho, u = macroscopics(f_c)
        m_static = m_left | m_right | m_bot
        ux = jnp.where(m_static, 0.0, u[0])
        uy = jnp.where(m_static, 0.0, u[1])
        # lid_corners="wall": interior lid columns only (boundary.py:155).
        m_lid_in = jnp.logical_and(m_lid, jnp.logical_not(m_left | m_right))
        ux = jnp.where(m_lid_in, u_lid, ux)
        uy = jnp.where(m_lid_in, 0.0, uy)
        rho = jnp.where(m_lid_in, lid_row_density(f_c), rho)
        u = jnp.stack([ux, uy])

        # --- equilibrium + collision over the window (halo recompute) ------
        feq = equilibrium(rho, u)
        fpost = _collide(cfg, f_c, feq, rho)

        # --- push streaming: st_k(x, y) = fpost_k(x - cx, y + cy) ----------
        planes = [fpost[k, 8 - int(lattice.CX[k]):
                        8 - int(lattice.CX[k]) + tile_x, :]
                  for k in range(lattice.Q)]
        shifts = [-int(lattice.CY[k]) for k in range(lattice.Q)]
        if grouped_gather:
            # Grouped roll schedule on the compiled path, same as the pull
            # kernels (see pallas_pull._grouped_rolls); interpret keeps
            # per-plane rolls for the ulp-exact oracle pins.
            st = _grouped_rolls(planes, shifts, axis=1, interpret=interpret)
        else:
            st = [_lane_roll(p, sh, interpret)
                  for p, sh in zip(planes, shifts)]
        feq_t = [feq[k, 8 : 8 + tile_x, :] for k in range(lattice.Q)]

        # --- full NEBB rewrite, boundary.nebb branch order -----------------
        tcol = jax.lax.broadcasted_iota(jnp.int32, (tile_x, ny), 0)
        trow = jax.lax.broadcasted_iota(jnp.int32, (tile_x, ny), 1)
        mL = jnp.logical_and(first, tcol == 0)
        mR = jnp.logical_and(last, tcol == tile_x - 1)
        mB = trow == ny - 1
        mT = trow == 0
        # Left wall: incoming +x populations (1, 5, 8).
        st[1] = jnp.where(mL, feq_t[1] - feq_t[3] + st[3], st[1])
        st[5] = jnp.where(mL, feq_t[5] - feq_t[7] + st[7], st[5])
        st[8] = jnp.where(mL, feq_t[8] - feq_t[6] + st[6], st[8])
        # Right wall: incoming -x populations (3, 6, 7).
        st[3] = jnp.where(mR, feq_t[3] - feq_t[1] + st[1], st[3])
        st[6] = jnp.where(mR, feq_t[6] - feq_t[8] + st[8], st[6])
        st[7] = jnp.where(mR, feq_t[7] - feq_t[5] + st[5], st[7])
        # Bottom wall: incoming +y populations (2, 5, 6).
        st[2] = jnp.where(mB, feq_t[2] - feq_t[4] + st[4], st[2])
        st[5] = jnp.where(mB, feq_t[5] - feq_t[7] + st[7], st[5])
        st[6] = jnp.where(mB, feq_t[6] - feq_t[8] + st[8], st[6])
        # Lid: incoming -y populations (4, 7, 8).
        st[4] = jnp.where(mT, feq_t[4] - feq_t[2] + st[2], st[4])
        st[7] = jnp.where(mT, feq_t[7] - feq_t[5] + st[5], st[7])
        st[8] = jnp.where(mT, feq_t[8] - feq_t[6] + st[6], st[8])

        f_out_ref[:, :, :] = jnp.stack(st)

    return kernel


def make_push_step(cfg: SimConfig,
                   interpret: bool = False) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """One fused Pallas push step on the plain pre-collision field ``f``,
    same trajectory as ``engine.make_push_oracle_step`` (asserted by tests)."""
    cfg.validate()
    if cfg.precision != "float32" and not interpret:
        raise ValueError("the Pallas kernel is float32 (TPU-native precision)")
    if cfg.boundary != "nebb":
        raise ValueError(
            "the Pallas push kernel implements the NEBB walls; use the "
            "oracle engine for other boundary schemes"
        )
    if cfg.turbulence == "smagorinsky" and cfg.van_driest:
        raise ValueError(
            "van-Driest LES is served by the production pull kernel "
            "(pallas_pull.py stages the cs^2 plane); the push kernel "
            "supports fixed-Cs^2 Smagorinsky only"
        )
    if not interpret and cfg.ny % 128:
        raise ValueError(
            "the compiled kernel needs ny % 128 == 0; use the fused jit "
            "engine for other widths"
        )
    nx, ny = cfg.nx, cfg.ny
    tile_x = pick_tile_x(nx, ny)
    n_tiles = nx // tile_x
    n_buf = 1 if _is_small_field(nx, ny) else 2
    kernel = _make_kernel(cfg, tile_x, interpret, n_buf)

    def step(f: jnp.ndarray) -> jnp.ndarray:
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # f stays in HBM
            out_specs=pl.BlockSpec((lattice.Q, tile_x, ny), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
            scratch_shapes=[
                pltpu.VMEM((n_buf, lattice.Q, tile_x + 32, ny), f.dtype),
                pltpu.SemaphoreType.DMA((n_buf,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * (tile_x + 16) * n_tiles * ny,
                bytes_accessed=2 * 9 * nx * ny * 4,
                transcendentals=0,
            ),
            compiler_params=_compiler_params(nx, ny),
            interpret=interpret,
        )(f)

    return step


def make_push_scan_runner(cfg: SimConfig, n_steps: int,
                          interpret: bool = False):
    """N Pallas push steps in one jitted dispatch (lax.scan)."""
    step = make_push_step(cfg, interpret=interpret)

    @jax.jit
    def run(f: jnp.ndarray) -> jnp.ndarray:
        def body(s, _):
            return step(s), None

        f_out, _ = jax.lax.scan(body, f, None, length=n_steps)
        return f_out

    return run
