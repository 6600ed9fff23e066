"""Boundary conditions for the lid-driven cavity (layer L2).

Walls (index convention of ``lattice.py``):
  * ``x = 0``      left wall   (no slip)
  * ``x = nx-1``   right wall  (no slip)
  * ``y = ny-1``   bottom wall (no slip)
  * ``y = 0``      moving lid, velocity ``(u_lid, 0)``

Schemes
-------
``nebb``
    Wet-node non-equilibrium bounce-back (Zou-He family) on all four walls:
    incoming population ``k`` at the wall becomes
    ``feq_k - feq_kbar + f_kbar`` — the reference's in-kernel formulation
    (reference: ``MRTTiledPull.py:434-452``, ``MRT_GPU.py:664-699``).
    Branch order matches the kernels (x-walls first, then y-walls), so corner
    cells chain exactly as the sequential CUDA code does.

``nebb_west_eq``
    The reference NumPy engine's variant: the west wall is set to the pure
    equilibrium, other walls NEBB (reference: ``MRT.py:450-453``).

``bounce_back``
    Halfway link-based bounce-back on the three static walls with a Bouzidi
    moving-lid correction; requires the pre-streaming post-collision field
    (reference, commented experiment: ``MRT.py:433-441``).

``nebb_tangential``
    NEBB walls with the full Zou-He tangential-momentum closure on the lid
    and explicit corner treatment at the two lid corners (reference,
    commented experiment: ``MRT.py:461-482``).  The lid rewrite keeps the
    tangential non-equilibrium correction ``±0.5 (f1 - f3) ∓ 0.5 u_lid``
    that plain NEBB drops, and the corners are closed with the standard
    Zou-He corner rule at unit density.

All functions are pure and operate on planar ``(9, X, Y)`` fields using edge
slice updates (``.at[k, 0, :]`` etc.), which XLA turns into cheap fused
edge-region stores.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import lattice


def nebb(f: jnp.ndarray, feq: jnp.ndarray) -> jnp.ndarray:
    """Full NEBB on all four walls, kernel branch order."""
    nx = f.shape[1]
    ny = f.shape[2]
    # Left wall x = 0: rewrite incoming +x populations (1, 5, 8).
    f = f.at[1, 0, :].set(feq[1, 0, :] - feq[3, 0, :] + f[3, 0, :])
    f = f.at[5, 0, :].set(feq[5, 0, :] - feq[7, 0, :] + f[7, 0, :])
    f = f.at[8, 0, :].set(feq[8, 0, :] - feq[6, 0, :] + f[6, 0, :])
    # Right wall x = nx-1: incoming -x populations (3, 6, 7).
    f = f.at[3, nx - 1, :].set(feq[3, nx - 1, :] - feq[1, nx - 1, :] + f[1, nx - 1, :])
    f = f.at[6, nx - 1, :].set(feq[6, nx - 1, :] - feq[8, nx - 1, :] + f[8, nx - 1, :])
    f = f.at[7, nx - 1, :].set(feq[7, nx - 1, :] - feq[5, nx - 1, :] + f[5, nx - 1, :])
    # Bottom wall y = ny-1: incoming +y populations (2, 5, 6).
    f = f.at[2, :, ny - 1].set(feq[2, :, ny - 1] - feq[4, :, ny - 1] + f[4, :, ny - 1])
    f = f.at[5, :, ny - 1].set(feq[5, :, ny - 1] - feq[7, :, ny - 1] + f[7, :, ny - 1])
    f = f.at[6, :, ny - 1].set(feq[6, :, ny - 1] - feq[8, :, ny - 1] + f[8, :, ny - 1])
    # Moving lid y = 0: incoming -y populations (4, 7, 8).
    f = f.at[4, :, 0].set(feq[4, :, 0] - feq[2, :, 0] + f[2, :, 0])
    f = f.at[7, :, 0].set(feq[7, :, 0] - feq[5, :, 0] + f[5, :, 0])
    f = f.at[8, :, 0].set(feq[8, :, 0] - feq[6, :, 0] + f[6, :, 0])
    return f


def nebb_west_eq(f: jnp.ndarray, feq: jnp.ndarray) -> jnp.ndarray:
    """Reference NumPy engine variant: west wall = pure equilibrium
    (reference: MRT.py:450), remaining walls NEBB in the MRT.py order."""
    nx = f.shape[1]
    ny = f.shape[2]
    for k in (1, 5, 8):
        f = f.at[k, 0, :].set(feq[k, 0, :])
    kb = lattice.OPP
    # East wall (MRT.py:451).
    for k in (3, 6, 7):
        f = f.at[k, nx - 1, :].set(
            feq[k, nx - 1, :] - feq[kb[k], nx - 1, :] + f[kb[k], nx - 1, :]
        )
    # Bottom wall: incoming are the +y ("Top" stencil) populations (MRT.py:452).
    for k in (2, 5, 6):
        f = f.at[k, :, ny - 1].set(
            feq[k, :, ny - 1] - feq[kb[k], :, ny - 1] + f[kb[k], :, ny - 1]
        )
    # Lid (MRT.py:453).
    for k in (4, 7, 8):
        f = f.at[k, :, 0].set(feq[k, :, 0] - feq[kb[k], :, 0] + f[kb[k], :, 0])
    return f


def nebb_tangential(f: jnp.ndarray, feq: jnp.ndarray, u_lid: float) -> jnp.ndarray:
    """NEBB walls + Zou-He tangential lid closure + lid-corner treatment.

    Reference (commented experiment, ``MRT.py:461-482``): after the standard
    four-wall NEBB rewrite, the lid row is re-closed with the exact Zou-He
    moving-wall rule and the two lid corners get the explicit corner
    equations.  Derivation notes:

    * Lid (y = 0, velocity ``(u_lid, 0)``): unknowns are the into-fluid
      populations 4, 7, 8.  Imposing ``(jx, jy) = (rho u_lid, 0)`` over the
      post-streaming knowns gives ``f4 = f2``,
      ``f7 = f5 + (f1 - f3)/2 - u_lid/2``,
      ``f8 = f6 - (f1 - f3)/2 + u_lid/2`` — the reference's incompressible
      (rho ~= 1) form.  The reference writes the first right-hand sides with
      transposed indices (``fin[2,0,:]`` for ``fin[2,:,0]``); the equations
      above are the intended, dimensionally consistent rule.
    * Corners (x = 0 / nx-1, y = 0): both wall normals meet, so five
      populations are unknown; the Zou-He corner closure at unit density
      sets the axis populations by bounce-back with the (2/3) u momentum
      share, the in-plane diagonal with (1/6) u, the two "buried" diagonals
      to ±u/12, and recovers f0 from rho = 1 (``MRT.py:468-482``).
    """
    nx = f.shape[1]
    f = nebb(f, feq)  # side/bottom walls (and a lid pass the next lines redo)
    # Zou-He tangential lid closure over the full row (corners fixed below).
    tang = 0.5 * (f[1, :, 0] - f[3, :, 0]) - 0.5 * u_lid
    f = f.at[4, :, 0].set(f[2, :, 0])
    f = f.at[7, :, 0].set(f[5, :, 0] + tang)
    f = f.at[8, :, 0].set(f[6, :, 0] - tang)
    # Upper-left corner (0, 0).
    f = f.at[1, 0, 0].set(f[3, 0, 0] + (2.0 / 3.0) * u_lid)
    f = f.at[4, 0, 0].set(f[2, 0, 0])
    f = f.at[8, 0, 0].set(f[6, 0, 0] + (1.0 / 6.0) * u_lid)
    f = f.at[5, 0, 0].set(u_lid / 12.0)
    f = f.at[7, 0, 0].set(-u_lid / 12.0)
    f = f.at[0, 0, 0].set(1.0 - f[1:, 0, 0].sum(axis=0))
    # Upper-right corner (nx-1, 0).
    e = nx - 1
    f = f.at[3, e, 0].set(f[1, e, 0] - (2.0 / 3.0) * u_lid)
    f = f.at[4, e, 0].set(f[2, e, 0])
    f = f.at[7, e, 0].set(f[5, e, 0] - (1.0 / 6.0) * u_lid)
    f = f.at[6, e, 0].set(-u_lid / 12.0)
    f = f.at[8, e, 0].set(u_lid / 12.0)
    f = f.at[0, e, 0].set(1.0 - f[1:, e, 0].sum(axis=0))
    return f


def bounce_back(f: jnp.ndarray, fpost: jnp.ndarray, u_lid: float) -> jnp.ndarray:
    """Halfway bounce-back walls + Bouzidi moving lid.

    Incoming populations at a wall take the pre-streaming post-collision value
    of their opposite at the same node; the lid adds the momentum term
    -+ uLB/6 to the diagonal populations (reference: MRT.py:433-441).
    """
    nx = f.shape[1]
    ny = f.shape[2]
    kb = lattice.OPP
    for k in (1, 5, 8):  # left wall
        f = f.at[k, 0, :].set(fpost[kb[k], 0, :])
    for k in (3, 6, 7):  # right wall
        f = f.at[k, nx - 1, :].set(fpost[kb[k], nx - 1, :])
    for k in (2, 5, 6):  # bottom wall
        f = f.at[k, :, ny - 1].set(fpost[kb[k], :, ny - 1])
    # Bouzidi lid on interior columns (reference: MRT.py:438-441).
    sl = slice(1, nx - 1)
    f = f.at[4, sl, 0].set(fpost[2, sl, 0])
    f = f.at[7, sl, 0].set(fpost[5, sl, 0] - u_lid / 6.0)
    f = f.at[8, sl, 0].set(fpost[6, sl, 0] + u_lid / 6.0)
    # Lid-corner closure (deliberate fix over the reference, whose
    # interior-only Bouzidi slice leaves f4/f7 at (0,0) and f4/f8 at
    # (nx-1,0) holding the jnp.roll wrap value from the bottom row every
    # step).  The corner nodes sit where the moving lid meets a static
    # wall; close them with plain (static) halfway bounce-back.
    f = f.at[4, 0, 0].set(fpost[2, 0, 0])
    f = f.at[7, 0, 0].set(fpost[5, 0, 0])
    f = f.at[4, nx - 1, 0].set(fpost[2, nx - 1, 0])
    f = f.at[8, nx - 1, 0].set(fpost[6, nx - 1, 0])
    return f


def apply(
    f: jnp.ndarray,
    feq: jnp.ndarray,
    variant: str,
    u_lid: float,
    fpost: jnp.ndarray | None = None,
) -> jnp.ndarray:
    if variant == "nebb":
        return nebb(f, feq)
    if variant == "nebb_west_eq":
        return nebb_west_eq(f, feq)
    if variant == "nebb_tangential":
        return nebb_tangential(f, feq, u_lid)
    if variant == "bounce_back":
        if fpost is None:
            raise ValueError("bounce_back needs the pre-streaming field")
        return bounce_back(f, fpost, u_lid)
    raise ValueError(f"unknown boundary variant {variant!r}")


def override_wall_velocity(
    u: jnp.ndarray,
    rho: jnp.ndarray,
    f_bc: jnp.ndarray,
    u_lid: float,
    lid_corners: str = "wall",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Impose wall velocities on the macroscopic fields and the wet-node lid
    density before computing the equilibrium (reference: MRT.py:337-342;
    in-kernel: MRTTiledPull.py:459-469).

    Static walls (left/right/bottom) get u = 0; the lid row gets
    u = (u_lid, 0) and the Zou-He closure density over its known populations.

    ``lid_corners`` resolves who owns the two top corner nodes:
      * ``"wall"`` — they belong to the side walls (u = 0, plain density);
        the GPU kernels' branch order (reference: MRTTiledPull.py:461-469).
      * ``"lid"`` — they move with the lid and get the closure density too;
        the NumPy engine's behavior (reference: MRT.py:337-342).
    """
    nx = u.shape[1]
    ny = u.shape[2]
    # Static walls: u = 0.
    u = u.at[:, 0, :].set(0.0)
    u = u.at[:, nx - 1, :].set(0.0)
    u = u.at[:, :, ny - 1].set(0.0)
    sl = slice(1, nx - 1) if lid_corners == "wall" else slice(0, nx)
    u = u.at[0, sl, 0].set(u_lid)
    u = u.at[1, sl, 0].set(0.0)
    from .equilibrium import lid_row_density

    rho_lid = lid_row_density(f_bc[:, sl, 0])
    rho = rho.at[sl, 0].set(rho_lid)
    return u, rho
