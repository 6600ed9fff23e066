"""latticeboltzmannsimulations_tpu — a TPU-native D2Q9 lattice-Boltzmann
framework (JAX/XLA/Pallas/shard_map).

A ground-up rebuild of the capabilities of the reference repo
``RaghuvirJonnagiri/LatticeBoltzmannSimulations`` (lid-driven cavity physics,
SRT/TRT/MRT collision, NEBB/bounce-back walls, Smagorinsky LES, Ghia
validation, VTK/plot I/O, dataset generation and CNN surrogate pipeline),
re-designed TPU-first: fused single-pass steps under ``jax.jit``, a Pallas
collide-and-stream kernel, ``lax.scan`` multi-step dispatch, and 2-D mesh
domain decomposition with ICI halo exchange.

Typical use::

    import latticeboltzmannsimulations_tpu as lbt

    cfg = lbt.SimConfig(nx=256, ny=256, reynolds=1000, collision="mrt")
    result = lbt.run_to_convergence(cfg)
    rho, u = lbt.observables(cfg, result.state)
"""

from .config import SimConfig  # noqa: F401
from .engine import (  # noqa: F401
    State,
    init_state,
    initial_fields,
    make_fused_step,
    make_fused_step_omega,
    make_push_oracle_step,
    make_pull_oracle_step,
    make_scan_runner,
    observables,
    run_to_convergence,
)
from .sim import SimOptions, SimSummary, simulate  # noqa: F401
from . import lattice, ops  # noqa: F401

# Subpackages (parallel, kernels, ml, io, validate, viz) import lazily via
# `from latticeboltzmannsimulations_tpu import parallel` etc.

__version__ = "0.1.0"
