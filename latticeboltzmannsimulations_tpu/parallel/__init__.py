"""Multi-chip spatial domain decomposition (absent from the reference —
SURVEY.md §2.7: largest reference run is 640² on one device,
``MRTTiledPush.py:52``).  This package makes the lattice shardable over a 2-D
TPU device mesh with explicit one-cell halo exchange over ICI."""

from .mesh import make_mesh, lattice_sharding
from . import multihost
from .halo import (
    exchange_halo,
    make_sharded_fused_step,
    make_sharded_scan_runner,
    sharded_observables,
    shard_state,
)

__all__ = [
    "make_mesh",
    "multihost",
    "lattice_sharding",
    "exchange_halo",
    "make_sharded_fused_step",
    "make_sharded_scan_runner",
    "sharded_observables",
    "shard_state",
]
