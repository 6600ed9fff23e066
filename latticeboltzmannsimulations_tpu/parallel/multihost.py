"""Multi-host scale-out over DCN.

The reference is single-node (SURVEY.md §2.7).  Here multi-host runs use
standard ``jax.distributed`` initialization plus a host-aware mesh layout:
shards are arranged so the one-cell halo traffic crosses ICI within a host
and only the mesh's outer splits cross DCN (the x axis by convention, since
per-step halo strips along it are the thinnest).

Usage (one process per host, e.g. under a TPU pod slice):

    from latticeboltzmannsimulations_tpu.parallel import multihost
    multihost.initialize()                       # jax.distributed handshake
    mesh = multihost.make_pod_mesh((8, 4))       # global (mx, my)
    # then exactly as single-host: shard_state / make_sharded_* with `mesh`

Single-chip and CPU-mesh tests never call ``initialize()``; everything here
degrades to the local device set.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from .mesh import MESH_AXES


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` passthrough (no-op when already
    initialized or when running single-process)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator env): nothing to do
        pass


def make_pod_mesh(mesh_shape: Tuple[int, int]) -> jax.sharding.Mesh:
    """Global 2-D mesh over all processes' devices, laid out host-major on
    the x axis so y-axis halo exchanges (full rows) stay on intra-host ICI
    and only x strips cross DCN."""
    mx, my = mesh_shape
    devs = jax.devices()  # global, process-major order
    if len(devs) < mx * my:
        raise ValueError(
            f"mesh {mesh_shape} needs {mx * my} devices, have {len(devs)}"
        )
    grid = np.asarray(devs[: mx * my]).reshape(mx, my)
    return jax.sharding.Mesh(grid, MESH_AXES)
