"""In-kernel x-ring halo exchange via TPU inter-chip RDMA (flag-gated).

The production sharded runners exchange halo strips with ``jax.lax.ppermute``
(XLA collectives) between Pallas kernel calls.  That is correct and already
O(edge), but each exchange costs an XLA collective dispatch plus
``dynamic_update_slice`` traffic on the padded carry.  This module folds the
**x-axis** strip exchange into one Pallas kernel that writes the K'-wide edge
column strips *directly into the ring neighbors' carry buffers* with
``pltpu.make_async_remote_copy`` — the DMA engines push over ICI while
nothing else blocks, and the carry is updated in place (input/output
aliasing) instead of being rebuilt.

Why x only
----------
Mosaic DMA windows must keep full (or 128-aligned) lane extents; the x strips
slice the 8-aligned *sublane* axis with full lanes, so they are directly
DMA-legal.  The y strips slice the minor lane axis K' (= 16) wide, which is
not a legal DMA lane window — they would need a transposed staging buffer, so
the y exchange stays on the ppermute path (``force_halo_layout`` meshes).
The flagship sharded layout is x-only (see CLAUDE.md measured table), so the
RDMA path covers the axis that matters.

Synchronization protocol (SPMD-symmetric; every shard executes the same ops)
----------------------------------------------------------------------------
1. Barrier with both x-ring neighbors (``pltpu.get_barrier_semaphore``):
   a neighbor may still be *reading* our halo columns inside its previous
   compute kernel; nobody writes remotely before everyone enters.
2. Start two RDMAs: our east edge -> successor's west halo, our west edge ->
   predecessor's east halo (plus the same pair for the lid-density panel).
3. ``.wait()`` each: completes when our outgoing strip has left *and* the
   symmetric incoming strip has landed (the local recv semaphore is signaled
   by the neighbor's copy of the same program).

Degenerate ``mx == 1`` meshes lower the wrap to *local* ``make_async_copy``
between disjoint regions of the same buffer (the ppermute self-ring
identity), which compiles and runs on a single chip and in interpret mode —
that is the validation path available without multi-chip hardware.

STATUS: the ``mx > 1`` remote path compiles but CANNOT be executed on this
machine (one physical chip; interpret mode does not emulate remote DMA).
Validating it needs real multi-chip hardware; until then the default
``halo_impl="ppermute"`` stays in production.  See docs/RDMA_HALO.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import lattice


def _make_local_kernel(ox: int, lx: int, kp: int):
    """mx == 1: the ring wraps onto itself — two local region copies."""

    def kernel(f_ref, rho_ref, f_out, rho_out, sems):
        copies = [
            # east real edge -> own west halo (the +1 ring wrap)
            pltpu.make_async_copy(
                f_out.at[:, ox + lx - kp : ox + lx, :],
                f_out.at[:, ox - kp : ox, :], sems.at[0]),
            # west real edge -> own east halo (the -1 ring wrap)
            pltpu.make_async_copy(
                f_out.at[:, ox : ox + kp, :],
                f_out.at[:, ox + lx : ox + lx + kp, :], sems.at[1]),
            pltpu.make_async_copy(
                rho_out.at[ox + lx - kp : ox + lx, :],
                rho_out.at[ox - kp : ox, :], sems.at[2]),
            pltpu.make_async_copy(
                rho_out.at[ox : ox + kp, :],
                rho_out.at[ox + lx : ox + lx + kp, :], sems.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    return kernel


def _make_remote_kernel(ox: int, lx: int, kp: int):
    """mx > 1: symmetric ring RDMA.  SMEM scalars carry the neighbor mesh
    coordinates along the x axis (sc = [[ix_next, ix_prev]])."""

    def kernel(sc, f_ref, rho_ref, f_out, rho_out, send_sems, recv_sems):
        # MESH-type device ids name only the axis being traversed: the copy
        # stays inside this shard's y row.
        nxt = {"mx": sc[0, 0]}
        prv = {"mx": sc[0, 1]}
        # 1. Neighbor barrier: our halo columns may still be read by the
        # neighbors' previous kernel; nobody writes before everyone arrives.
        barrier = pltpu.get_barrier_semaphore()
        for nbr in (nxt, prv):
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=nbr,
                device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_wait(barrier, 2)
        # 2. Symmetric strip pushes.  recv semaphore slots are per-direction:
        # slot 0 = "my west halo arrived" (sent by my predecessor's east
        # push), slot 1 = "my east halo arrived".
        rdmas = [
            pltpu.make_async_remote_copy(  # my east edge -> successor's west halo
                src_ref=f_out.at[:, ox + lx - kp : ox + lx, :],
                dst_ref=f_out.at[:, ox - kp : ox, :],
                send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
                device_id=nxt, device_id_type=pltpu.DeviceIdType.MESH),
            pltpu.make_async_remote_copy(  # my west edge -> predecessor's east halo
                src_ref=f_out.at[:, ox : ox + kp, :],
                dst_ref=f_out.at[:, ox + lx : ox + lx + kp, :],
                send_sem=send_sems.at[1], recv_sem=recv_sems.at[1],
                device_id=prv, device_id_type=pltpu.DeviceIdType.MESH),
            pltpu.make_async_remote_copy(
                src_ref=rho_out.at[ox + lx - kp : ox + lx, :],
                dst_ref=rho_out.at[ox - kp : ox, :],
                send_sem=send_sems.at[2], recv_sem=recv_sems.at[2],
                device_id=nxt, device_id_type=pltpu.DeviceIdType.MESH),
            pltpu.make_async_remote_copy(
                src_ref=rho_out.at[ox : ox + kp, :],
                dst_ref=rho_out.at[ox + lx : ox + lx + kp, :],
                send_sem=send_sems.at[3], recv_sem=recv_sems.at[3],
                device_id=prv, device_id_type=pltpu.DeviceIdType.MESH),
        ]
        for r in rdmas:
            r.start()
        # 3. wait() = our strip has left AND the symmetric incoming strip has
        # landed (local recv sem signaled by the neighbor's matching push).
        for r in rdmas:
            r.wait()

    return kernel


def make_x_halo_exchange(mx: int, lxp: int, py: int, kp: int, ox: int,
                         lx: int, dtype, interpret: bool = False):
    """Build ``exchange(fp, rho_panel) -> (fp, rho_panel)`` performing the
    K'-wide x-ring strip exchange in place via DMA.

    Must be called inside a ``shard_map`` over mesh axes ``("mx", "my")``
    (the x ring; degenerate rings use local copies).  Drop-in replacement
    for the ``_shift_strip`` + ``dynamic_update_slice`` x phase of
    ``pallas_pull_tblock_sharded.block_step``.
    """
    out_shape = [
        jax.ShapeDtypeStruct((lattice.Q, lxp, py), dtype),
        jax.ShapeDtypeStruct((lxp, 128), dtype),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]

    if mx == 1:
        call = pl.pallas_call(
            _make_local_kernel(ox, lx, kp),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={0: 0, 1: 1},
            scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        def exchange(fp, rho_panel):
            return call(fp, rho_panel)

        return exchange

    kernel = _make_remote_kernel(ox, lx, kp)
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 2), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1: 0, 2: 1},
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7),
    )

    def exchange(fp, rho_panel):
        ix = jax.lax.axis_index("mx")
        sc = jnp.stack([
            (ix + 1) % mx, (ix - 1) % mx,
        ]).astype(jnp.int32).reshape(1, 2)
        return call(sc, fp, rho_panel)

    return exchange
