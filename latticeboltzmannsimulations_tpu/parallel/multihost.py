"""Multi-host scale-out over DCN.

The reference is single-node (SURVEY.md §2.7).  Here multi-host runs use
standard ``jax.distributed`` initialization plus the shared mesh builder:
``jax.devices()`` is process-major, so the x axis (the outer mesh dim) is
host-major — y-axis halo rows stay on intra-host ICI and only thin x strips
cross DCN.

Usage (one process per host, e.g. under a TPU pod slice):

    from latticeboltzmannsimulations_tpu.parallel import multihost
    multihost.initialize()                       # BEFORE any other JAX call
    mesh = multihost.make_pod_mesh((8, 4))       # global (mx, my)
    # then exactly as single-host: shard_state / make_sharded_* with `mesh`

Single-chip and CPU-mesh tests never call ``initialize()``; everything here
degrades to the local device set.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` passthrough.

    MUST run before any JAX call that initializes the XLA backend (even
    ``jax.devices()``/``jax.process_count()``).  A single-process run with
    no coordinator configuration (no arguments and no cluster environment)
    is detected *without* touching the backend and left alone; real
    misconfiguration errors propagate.
    """
    import os

    if jax.distributed.is_initialized():
        return  # already initialized
    cluster_env = any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    )
    if coordinator_address is None and num_processes is None and not cluster_env:
        return  # plain single-process run: nothing to set up
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(mesh_shape: Tuple[int, int]) -> jax.sharding.Mesh:
    """Global 2-D mesh over all processes' devices.  ``jax.devices()`` is
    process-major, so reshaping it onto (mx, my) makes x the host-major
    axis (see module docstring)."""
    return make_mesh(mesh_shape)
