"""Device mesh construction and lattice shardings.

The lattice ``f (9, X, Y)`` is domain-decomposed over a 2-D mesh with axes
``("mx", "my")``: X is split over ``mx`` and Y over ``my``; the population
axis is replicated (each shard owns all 9 planes of its subdomain — the
planar SoA layout the fastest reference kernel uses,
reference: ``MRTTiledPull.py:313-333``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("mx", "my")


def make_mesh(
    mesh_shape: Tuple[int, int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D device mesh for spatial decomposition.

    ``mesh_shape = (mx, my)`` requires ``mx * my`` devices.  With
    ``devices=None`` the first ``mx*my`` of ``jax.devices()`` are used so a
    ``(1, 1)`` mesh works on any machine.
    """
    mx, my = mesh_shape
    n = mx * my
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
        )
    import numpy as np

    dev_grid = np.asarray(devices[:n]).reshape(mx, my)
    return Mesh(dev_grid, MESH_AXES)


def lattice_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of the planar field ``(9, X, Y)``: populations replicated,
    space split over the mesh."""
    return NamedSharding(mesh, P(None, "mx", "my"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of an X-indexed row vector such as the lid density ``(X,)``."""
    return NamedSharding(mesh, P("mx"))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of a scalar field ``(X, Y)``."""
    return NamedSharding(mesh, P("mx", "my"))
