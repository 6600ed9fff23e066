"""Streaming (advection) operators: push scatter and pull gather.

Index convention (see ``lattice.py``): population ``k`` moves from cell
``(x, y)`` to ``(x + cx_k, y - cy_k)`` — the y index grows downwards, so a
positive ``cy`` is a shift towards smaller y index.  This reproduces the
reference's slice stencil (push: ``MRT.py:404-414``; pull gather:
``MRTTiledPull.py:403-429``).

On TPU these are static-shape roll ops that XLA lowers to cheap lane/sublane
shifts.  Out-of-domain gathers WRAP (``jnp.roll``) — and the wrap value is
**trajectory-visible** at the lid corners (the right-wall NEBB rewrite copies
g8 into g6 *before* the lid rewrites g8), so every backend must reproduce
the identical wrap semantics bit-for-bit (see the trajectory contract in
CLAUDE.md; do NOT "fix" this to a clamped shift).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import lattice


def _shift(a: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Shift plane ``a (X, Y)`` by (dx, dy) in *index* space; edge cells
    receive the WRAPPED value from the opposite edge (trajectory-visible at
    the lid corners — see the module docstring)."""
    if dx == 0 and dy == 0:
        return a
    return jnp.roll(a, shift=(dx, dy), axis=(0, 1))


def stream_push(fpost: jnp.ndarray) -> jnp.ndarray:
    """Push streaming: population k of the result at (x, y) came from
    (x - cx_k, y + cy_k).  Wrap-around edge values are mostly rewritten by
    the boundary pass; the few that survive (lid corners) are part of the
    pinned trajectory."""
    return gather_pull(fpost)


def gather_pull(f: jnp.ndarray) -> jnp.ndarray:
    """Pull gather: out[k](x, y) = f[k](x - cx_k, y + cy_k).

    Implemented as per-plane rolls; out-of-domain gathers (at walls) wrap
    around and are subsequently replaced by the boundary conditions, matching
    the self-fallback of the reference pull kernel
    (reference: MRTTiledPull.py:403-429).
    """
    planes = []
    for k in range(lattice.Q):
        dx = int(lattice.CX[k])
        dy = -int(lattice.CY[k])
        planes.append(_shift(f[k], dx, dy))
    return jnp.stack(planes)


# Pull and push move data identically when applied to a post-collision field;
# they differ only in where the boundary fix-up happens relative to collision.
stream_pull = gather_pull
