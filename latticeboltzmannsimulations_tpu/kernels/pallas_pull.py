"""Fused pull collide-and-stream Pallas kernel.

TPU re-design of the reference's fastest backend, the structure-of-arrays
tiled pull CUDA kernel (reference: ``MRTTiledPull.py:379-515``): each step is
ONE pass over the 9 population planes — gather from upwind neighbors, NEBB
wall rewrite in registers, macroscopic moments, collision, in-place-style
store — so the step moves exactly 2 x 9 planes of HBM traffic (1 read +
1 write), the speed-of-light for this memory-bound stencil.

Mapping onto the TPU:

* the lattice is ``(9, X, Y)`` planar f32, Y on the 128-wide lane axis;
* the grid tiles X into column strips; each program DMAs its
  ``(9, TX+2, Y)`` x-halo window from HBM into VMEM scratch (the +-1 halo is
  the pull stencil's upwind reach — the CUDA kernel's cross-block gathers),
* the y-direction gather is an in-VMEM lane roll (wrap values only ever land
  in populations the wall rewrite overwrites, exactly like the single-chip
  ``jnp.roll`` engine — see ``ops/streaming.py``),
* wall rewrites are branch-free ``where`` selects masked by lane/sublane
  iota and the tile's position in the grid,
* macros / equilibrium / collision reuse the exact ``ops`` functions, so the
  kernel is arithmetic-identical to the fused-jnp engine (the test suite
  asserts near-bit equality).

State contract matches ``engine.State``: ``(f, rho_lid)`` where ``f`` is the
post-collision field and ``rho_lid`` the previous lid-row density (the pull
scheme's one-step memory; reference pre-collision trick:
``MRTTiledPull.py:272``).
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import lattice
from ..config import SimConfig
from ..engine import State, _collide
from ..ops.equilibrium import equilibrium, lid_row_density, macroscopics


VMEM_LIMIT_BYTES = 100 * 2**20  # v5e exposes ~128MB; default scoped limit is 16MB

# cy-grouped plane-storage order (the r5 gather-schedule experiment,
# CLAUDE.md "gather schedule (a)"): planes sharing a lane shift are stored
# k-contiguously — thirds [UP | CENT_H | DOWN] = [2,5,6 | 0,1,3 | 4,7,8] —
# so the y-gather becomes ONE wide ``pltpu.roll`` per moving third applied
# directly to the staged scratch slab (no concatenate/split data movement),
# and the x-gather offsets turn into value slices of the rolled slabs.
# The layout is internal to a scan dispatch: ``make_scan_runner`` permutes
# the lattice-order state once on entry and back once on exit, so the
# external ``engine.State`` contract is unchanged.
PLANE_ORDER_CY: tuple = tuple(
    int(k) for k in (*lattice.UP, *lattice.CENT_H, *lattice.DOWN)
)


def _env_plane_order():
    return PLANE_ORDER_CY if os.environ.get("LBM_PLANE_ORDER") == "cy" else None


def _is_small_field(nx: int, ny: int) -> bool:
    """Does the in+out field pair fit the compiler's VMEM-residency fast
    path (v5e ~128MB VMEM)?  Measured: keeping scratch pressure low and the
    default scoped limit lets Mosaic hold f in VMEM across the scan
    (~850GB/s effective, ~3x the practical HBM rate)."""
    return 2 * 9 * nx * ny * 4 <= 80 * 2**20


def _compiler_params(nx: int, ny: int):
    """Raise the scoped-VMEM limit only for large fields — overriding the
    limit on small fields measurably disables the VMEM-residency path."""
    if _is_small_field(nx, ny):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def pick_tile_x(nx: int, ny: int, vmem_budget_bytes: int | None = None) -> int:
    """Largest power-of-two x-tile that divides nx and keeps the working set
    (halo scratch + double-buffered output + ~5 live temps) under budget.
    Minimum 8 (the f32 sublane tile); capped at nx/2 so every tile's
    8-aligned halo window fits inside the array.

    The budget is size-aware (measured on v5e): when the whole field pair
    fits in the chip's ~128MB VMEM, small tiles leave room for the compiler
    to keep f VMEM-resident across the scan (~850GB/s effective — 3x the
    practical HBM rate); for larger fields the run is HBM-bound and wide
    tiles minimize the halo-window read amplification instead."""
    if nx % 8 or nx < 32:
        raise ValueError(
            f"Pallas kernel needs nx % 8 == 0 and nx >= 32, got {nx}"
        )
    if vmem_budget_bytes is None:
        vmem_budget_bytes = (
            16 * 2**20 if _is_small_field(nx, ny) else 64 * 2**20
        )
    tx = 8
    while tx < nx // 2:
        cand = tx * 2
        if nx % cand:
            break
        # double-buffered window (2,9,tx+32,ny) + 2x out (9,tx,ny) + ~5
        # temps (tx,ny), f32
        working = 4 * ny * (18 * (cand + 32) + 18 * cand + 5 * cand)
        if working > vmem_budget_bytes:
            break
        tx = cand
    return tx


def _make_window_dma(nx_total: int, tile_x: int, f_hbm, scratch, sem):
    """The 8-aligned clipped x-halo staging copy (HBM window -> VMEM
    scratch slot).  Shared verbatim with the push kernel
    (``pallas_push.py``): the stale-column safety argument at both call
    sites depends on this exact clip-and-slide arithmetic, so there is
    exactly one definition."""

    def window_dma(t, slot):
        src0 = pl.multiple_of(
            jnp.clip(t * tile_x - 8, 0, nx_total - (tile_x + 16)), 8
        )
        dst0 = pl.multiple_of(src0 - (t * tile_x - 16), 8)  # {0, 8, 16}
        return pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(src0, tile_x + 16), :],
            scratch.at[slot, :, pl.ds(dst0, tile_x + 16), :],
            sem.at[slot],
        )

    return window_dma


def _lane_roll(plane: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    if shift == 0:
        return plane
    if interpret:  # pltpu.roll has no interpreter lowering
        return jnp.roll(plane, shift, axis=1)
    # pltpu.roll requires a non-negative shift.
    return pltpu.roll(plane, shift=shift % plane.shape[1], axis=1)


def _grouped_rolls(planes: list, shifts: list, axis: int, interpret: bool):
    """Roll each 2-D plane by its own shift along ``axis``, issuing ONE wide
    ``pltpu.roll`` per distinct non-zero shift: planes sharing a shift are
    concatenated along the *other* axis, rolled together, and split back.

    Exactly the same values as per-plane rolls (bit-identity preserved —
    the roll axis never crosses the concatenated seams), but measured ~6%
    faster at 1024² because roll cost on the VPU is per-op-dominated, not
    per-byte (RESULTS.md "gather schedule").  Split offsets stay aligned:
    concatenating along sublanes keeps 8-multiple offsets, along lanes
    128-multiple offsets, because every plane dimension in these kernels is
    itself tile-aligned.
    """
    out = [None] * len(planes)
    cat_axis = 1 - axis

    def _roll(p, s):
        if interpret:
            return jnp.roll(p, s, axis=axis)
        return pltpu.roll(p, shift=s % p.shape[axis], axis=axis)

    for s in sorted(set(shifts)):
        idx = [i for i, sh in enumerate(shifts) if sh == s]
        if s == 0:
            for i in idx:
                out[i] = planes[i]
        elif len(idx) == 1:
            out[idx[0]] = _roll(planes[idx[0]], s)
        else:
            sizes = [planes[i].shape[cat_axis] for i in idx]
            wide = _roll(jnp.concatenate([planes[i] for i in idx],
                                         axis=cat_axis), s)
            off = 0
            for i, sz in zip(idx, sizes):
                sl = [slice(None), slice(None)]
                sl[cat_axis] = slice(off, off + sz)
                out[i] = wide[tuple(sl)]
                off += sz
    return out


def _make_kernel(cfg: SimConfig, tile_x: int, interpret: bool,
                 n_buf: int = 2, traced_omega: bool = False,
                 n_cav: int = 1, van_driest: bool = False,
                 plane_order: tuple | None = None):
    """``n_cav > 1`` stacks that many *independent* cavities along x (field
    width ``n_cav * nx``), each with its own traced omega — the wall rewrite
    fires at every cavity boundary, and every population that a tile gathers
    from a neighboring cavity is one the wall rewrite overwrites, so the
    stacked run is exactly ``n_cav`` isolated cavities in one dispatch (the
    TPU batch form of the reference's one-GPU-run-per-Re sweep,
    ``MRT_GPU_datagen.py:55-69``)."""
    nx, ny = cfg.nx, cfg.ny
    nx_total = nx * n_cav
    u_lid = cfg.u_lid
    n_tiles = nx_total // tile_x
    tiles_per_cav = nx // tile_x
    # Grouped y-gather is the measured default on the compiled path (+6%
    # @1024²; see RESULTS.md "gather schedule"); LBM_GATHER_GROUPED=0
    # restores per-plane rolls.  Interpret mode ALWAYS rolls per-plane: the
    # grouping is a Mosaic op-scheduling optimization, and on XLA:CPU the
    # reshaped producers shift FMA contraction enough to break the ulp-exact
    # engine pin the CPU tests assert (same class of difference as the
    # pallas_push interpret note); _grouped_rolls itself is value-pinned by
    # a direct unit test.
    grouped_gather = (not interpret
                      and os.environ.get("LBM_GATHER_GROUPED", "1") == "1")
    if plane_order is not None:
        # Each stored third must share one cy so it rolls as a single slab.
        for t3 in range(3):
            cys = {int(lattice.CY[plane_order[3 * t3 + i]]) for i in range(3)}
            assert len(cys) == 1, plane_order

    def kernel(*refs):
        refs = list(refs)
        omega_ref = refs.pop(0) if traced_omega else None
        rho_lid_ref = refs.pop(0)
        # Van Driest: the wall-damped Cs^2(x, y) plane is static per config,
        # so it rides in as a regular pipelined VMEM input tile instead of
        # being rebuilt per step (VERDICT r1: keeps the Re=10000 LES config
        # at kernel speed; reference capability MRT_GPU.py:368-387).
        cs2_ref = refs.pop(0) if van_driest else None
        (f_hbm, f_out_ref, rho_lid_out_ref, scratch, sem) = refs
        i = pl.program_id(0)
        if n_cav == 1:
            first = i == 0
            last = i == n_tiles - 1
        else:
            pos = jax.lax.rem(i, jnp.asarray(tiles_per_cav, i.dtype))
            first = pos == 0
            last = pos == tiles_per_cav - 1

        # --- stage the x-halo window HBM -> VMEM, double-buffered ----------
        # Mosaic requires DMA slice shapes/offsets aligned to the 8-sublane
        # f32 tiling, so the one-column halo is over-fetched to an 8-aligned
        # window: scratch column c holds global column t*TX - 16 + c (width
        # TX+32); the tile's own columns always sit at offset 16.  The DMA
        # copies TX+16 in-bounds columns and slides its *destination* offset
        # (0/8/16, all aligned) instead of the source window at the global
        # edges.  Stale columns there feed only wall populations, which the
        # NEBB rewrite below overwrites.
        #
        # Grid programs run sequentially on the core and scratch persists
        # across them, so each program prefetches the NEXT tile's window
        # into the other buffer slot before computing — the fetch rides
        # under the current tile's compute instead of stalling it.
        window_dma = _make_window_dma(nx_total, tile_x, f_hbm, scratch, sem)

        if n_buf == 2:
            slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

            # Prologue must fire ONLY at the very first grid program.  In
            # stacked-cavity mode `first` is per-cavity (pos == 0): using it
            # here would start a second DMA into a slot the previous program
            # already prefetched, leaving surplus semaphore credit so a later
            # wait() could return before its copy lands (stale window reads).
            @pl.when(i == 0)
            def _():
                window_dma(i, slot).start()

            @pl.when(i + 1 < n_tiles)
            def _():
                window_dma(i + 1, 1 - slot).start()
        else:
            # single-buffered: on the VMEM-resident small-field path the
            # "DMA" is a VMEM copy; prefetch buys nothing and the extra
            # buffer evicts field data.
            slot = 0
            window_dma(i, slot).start()

        window_dma(i, slot).wait()

        # --- pull gather: g_k(x, y) = f_k(x - cx, y + cy) ------------------
        # x via static slices of the staged halo window; y via a lane roll
        # whose wrap values only land in lid/bottom-rewritten populations.
        if plane_order is not None:
            # cy-grouped storage: each stored third shares one lane shift,
            # so the moving thirds roll as whole scratch slabs (2 wide rolls,
            # zero concatenate/split movement) and the per-plane x-offsets
            # become value slices of the rolled slabs.  Same values as the
            # per-plane schedule — rolls and slices are pure data movement.
            pos = {int(k): j for j, k in enumerate(plane_order)}
            slabs = []
            for t3 in range(3):
                s = -int(lattice.CY[plane_order[3 * t3]])
                if s == 0:
                    slabs.append(None)  # static third: slice scratch directly
                    continue
                slab = scratch[slot, 3 * t3:3 * t3 + 3, :, :]
                slab = (jnp.roll(slab, s, axis=2) if interpret
                        else pltpu.roll(slab, shift=s % ny, axis=2))
                slabs.append(slab)
            gs = []
            for k in range(lattice.Q):
                j = pos[k]
                off = 16 - int(lattice.CX[k])
                slab = slabs[j // 3]
                if slab is None:
                    gs.append(scratch[slot, j, off:off + tile_x, :])
                else:
                    gs.append(slab[j % 3, off:off + tile_x, :])
        else:
            planes = [scratch[slot, k,
                              16 - int(lattice.CX[k]):
                              16 - int(lattice.CX[k]) + tile_x, :]
                      for k in range(lattice.Q)]
            shifts = [-int(lattice.CY[k]) for k in range(lattice.Q)]
            if grouped_gather:
                # Grouped schedule (default): one 3x-wide lane roll per y
                # direction (2 rolls instead of 6) — same values,
                # bit-identical; measured +6% @1024² (see _grouped_rolls).
                gs = _grouped_rolls(planes, shifts, axis=1,
                                    interpret=interpret)
            else:
                gs = [_lane_roll(p, s, interpret)
                      for p, s in zip(planes, shifts)]

        # --- reduced NEBB wall rewrite (engine._fused_gather_bc) ----------
        # Branch-free where-selects on the individual planes (a scatter-free
        # form Mosaic can lower).  Update order matches the fused engine so
        # corner chaining is identical.
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_x, ny), 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_x, ny), 1)
        m_left = jnp.logical_and(first, col == 0)
        m_right = jnp.logical_and(last, col == tile_x - 1)
        m_bot = row == ny - 1
        m_lid = row == 0

        # Left wall: f1<-f3, f5<-f7, f8<-f6.
        gs[1] = jnp.where(m_left, gs[3], gs[1])
        gs[5] = jnp.where(m_left, gs[7], gs[5])
        gs[8] = jnp.where(m_left, gs[6], gs[8])
        # Right wall: f3<-f1, f6<-f8, f7<-f5.
        gs[3] = jnp.where(m_right, gs[1], gs[3])
        gs[6] = jnp.where(m_right, gs[8], gs[6])
        gs[7] = jnp.where(m_right, gs[5], gs[7])
        # Bottom wall: f2<-f4, f5<-f7, f6<-f8.
        gs[2] = jnp.where(m_bot, gs[4], gs[2])
        gs[5] = jnp.where(m_bot, gs[7], gs[5])
        gs[6] = jnp.where(m_bot, gs[8], gs[6])
        # Lid: f4<-f2; f7<-f5 - mom; f8<-f6 + mom, mom zeroed at the two
        # global corner columns (their previous wall velocity is 0).
        mom_col = rho_lid_ref[:, 0] * (u_lid / 6.0)  # (TX,)
        corner = jnp.logical_or(m_left[:, 0], m_right[:, 0])  # (TX,)
        mom_col = jnp.where(corner, 0.0, mom_col)
        mom = mom_col[:, None]  # (TX, 1) broadcasts over lanes
        gs[4] = jnp.where(m_lid, gs[2], gs[4])
        gs[7] = jnp.where(m_lid, gs[5] - mom, gs[7])
        gs[8] = jnp.where(m_lid, gs[6] + mom, gs[8])
        g = jnp.stack(gs)  # (9, TX, ny)

        # --- macros + wall velocity overrides (engine._fused_macros) ------
        rho, u = macroscopics(g)
        m_static = m_left | m_right | m_bot
        ux = jnp.where(m_static, 0.0, u[0])
        uy = jnp.where(m_static, 0.0, u[1])
        m_lid_in = jnp.logical_and(m_lid, jnp.logical_not(m_left | m_right))
        ux = jnp.where(m_lid_in, u_lid, ux)
        uy = jnp.where(m_lid_in, 0.0, uy)
        rho_closure = lid_row_density(g)  # closure of full planes; row 0 valid
        rho = jnp.where(m_lid_in, rho_closure, rho)
        u = jnp.stack([ux, uy])

        # --- equilibrium + collision (shared ops code) ---------------------
        feq = equilibrium(rho, u)
        if traced_omega:
            if n_cav == 1:
                omega = omega_ref[0, 0]
            else:
                cav = jax.lax.div(i, jnp.asarray(tiles_per_cav, i.dtype))
                omega = omega_ref[cav, 0]
        else:
            omega = None
        cs2 = cs2_ref[:, :] if van_driest else None
        f_new = _collide(cfg, g, feq, rho, omega=omega, cs2_field=cs2)

        if plane_order is not None:
            f_out_ref[:, :, :] = jnp.stack([f_new[int(k)]
                                            for k in plane_order])
        else:
            f_out_ref[:, :, :] = f_new
        rho_lid_out_ref[:, 0] = rho[:, 0]

    return kernel


def make_step(cfg: SimConfig, interpret: bool = False,
              traced_omega: bool = False, n_cav: int = 1,
              plane_order: tuple | None = None) -> Callable[..., State]:
    """One fused Pallas collide-and-stream step, same trajectory as
    ``engine.make_fused_step`` (asserted by tests).

    With ``traced_omega=True`` the step takes ``(state, omega)`` — the shear
    relaxation rate rides in as an SMEM scalar, so ONE compiled kernel serves
    a whole Reynolds sweep (the Pallas analogue of
    ``engine.make_fused_step_omega``; used by ``ml/datagen.py``).

    With ``n_cav > 1`` (requires ``traced_omega``) the state stacks that many
    independent cavities along x — ``f (9, n_cav*nx, ny)``,
    ``rho_lid (n_cav*nx,)`` — and ``omega`` is a ``(n_cav,)`` vector: one
    dispatch advances a whole batch of Reynolds numbers at kernel speed.

    With ``plane_order`` set, ``state.f`` is expected AND returned in that
    permuted plane layout (stored plane ``j`` = lattice plane
    ``plane_order[j]``); callers own the boundary permutes — see
    ``make_scan_runner``."""
    cfg.validate()
    if n_cav > 1 and not traced_omega:
        raise ValueError("stacked cavities (n_cav > 1) require traced_omega")
    if cfg.precision != "float32" and not interpret:
        raise ValueError("the Pallas kernel is float32 (TPU-native precision)")
    if cfg.boundary != "nebb":
        raise ValueError(
            "the Pallas kernel implements the reduced NEBB walls; use the "
            "oracle engine for other boundary schemes"
        )
    van_driest = cfg.turbulence == "smagorinsky" and cfg.van_driest
    if van_driest and traced_omega:
        raise ValueError(
            "van-Driest damping depends on the Reynolds number through the "
            "viscous length, so it cannot ride a traced-omega sweep; use "
            "per-Re kernels or fixed-Cs^2 Smagorinsky"
        )
    if not interpret and cfg.ny % 128:
        raise ValueError(
            "the compiled kernel needs ny % 128 == 0 (lane tiling: Mosaic "
            "cannot sublane-slice an HBM buffer with padded lanes); use the "
            "fused jit engine for other widths"
        )
    nx, ny = cfg.nx, cfg.ny
    nx_total = nx * n_cav
    tile_x = pick_tile_x(nx, ny)
    n_tiles = nx_total // tile_x
    n_buf = 1 if _is_small_field(nx_total, ny) else 2
    kernel = _make_kernel(cfg, tile_x, interpret, n_buf=n_buf,
                          traced_omega=traced_omega, n_cav=n_cav,
                          van_driest=van_driest, plane_order=plane_order)
    if van_driest:
        from ..ops.collision import van_driest_cs2

        cs2_plane = van_driest_cs2(nx, ny, cfg.u_lid / cfg.nu,
                                   dtype=jnp.float32)

    def step(state: State, omega=None) -> State:
        f = state.f
        rho_lid = state.rho_lid.reshape(nx_total, 1)
        in_specs = [
            # (nx, 1) column layout: the tiled dim rides the sublanes so
            # the block obeys the (8, 128) tiling rule at any tile size.
            pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # f stays in HBM
        ]
        args = [rho_lid, f]
        if van_driest:
            in_specs.insert(1, pl.BlockSpec((tile_x, ny), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM))
            args.insert(1, cs2_plane)
        if traced_omega:
            in_specs.insert(0, pl.BlockSpec((n_cav, 1), lambda i: (0, 0),
                                            memory_space=pltpu.SMEM))
            args.insert(0, jnp.asarray(omega, f.dtype).reshape(n_cav, 1))
        f_new, rho_lid_new = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((lattice.Q, tile_x, ny), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_x, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(f.shape, f.dtype),
                jax.ShapeDtypeStruct((nx_total, 1), f.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_buf, lattice.Q, tile_x + 32, ny), f.dtype),
                pltpu.SemaphoreType.DMA((n_buf,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=300 * nx_total * ny,
                bytes_accessed=2 * 9 * nx_total * ny * 4,
                transcendentals=0,
            ),
            compiler_params=_compiler_params(nx_total, ny),
            interpret=interpret,
        )(*args)
        return State(f=f_new, rho_lid=rho_lid_new.reshape(nx_total))

    return step


def make_scan_runner(cfg: SimConfig, n_steps: int, interpret: bool = False,
                     plane_order: tuple | None | str = "env"):
    """N Pallas steps in one jitted dispatch (lax.scan) — the sound TPU
    version of the reference's persistent-kernel time loop
    (reference: ``MRTtestLoopIn.py:366-472``).

    ``plane_order`` selects the internal plane-storage layout experiment:
    the default ``"env"`` reads ``LBM_PLANE_ORDER`` (``cy`` →
    ``PLANE_ORDER_CY``, unset → lattice order).  The permute in/out costs
    one extra f-copy per *dispatch*, amortized over ``n_steps``; the
    external state contract stays lattice-order either way."""
    if plane_order == "env":
        plane_order = _env_plane_order()
    step = make_step(cfg, interpret=interpret, plane_order=plane_order)

    if plane_order is None:
        @jax.jit
        def run(state: State) -> State:
            def body(s, _):
                return step(s), None

            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        return run

    perm = jnp.asarray(plane_order)
    inv = jnp.asarray(np.argsort(np.asarray(plane_order)))

    @jax.jit
    def run(state: State) -> State:
        s = State(f=state.f[perm], rho_lid=state.rho_lid)

        def body(s, _):
            return step(s), None

        s, _ = jax.lax.scan(body, s, None, length=n_steps)
        return State(f=s.f[inv], rho_lid=s.rho_lid)

    return run


def make_scan_runner_omega(cfg: SimConfig, n_steps: int,
                           interpret: bool = False):
    """Scan runner with omega as a traced argument: one compiled kernel for
    every Reynolds number of a sweep."""
    step = make_step(cfg, interpret=interpret, traced_omega=True)

    @jax.jit
    def run(state: State, omega) -> State:
        def body(s, _):
            return step(s, omega), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run


def make_sweep_runner(cfg: SimConfig, n_cav: int, n_steps: int,
                      interpret: bool = False):
    """N steps of a whole *batch* of cavities in one dispatch: ``n_cav``
    independent cavities stacked along x, per-cavity omega vector.  One
    compiled program advances the entire Reynolds batch ``n_steps`` at fused
    kernel speed (the TPU redesign of the reference's sequential
    one-run-per-Re datagen loop, ``MRT_GPU_datagen.py:55-69``)."""
    step = make_step(cfg, interpret=interpret, traced_omega=True,
                     n_cav=n_cav)

    @jax.jit
    def run(state: State, omegas) -> State:
        def body(s, _):
            return step(s, omegas), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return run
