"""Sharded engine == single-chip fused engine, bit-for-bit (f64 CPU mesh).

The reference has nothing distributed (SURVEY.md §2.7); the correctness
contract for the new halo-exchange backend is exact agreement with the
single-chip fused step on the same global grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.parallel import (
    make_mesh,
    make_sharded_fused_step,
    make_sharded_scan_runner,
    shard_state,
    sharded_observables,
)


def _cfg(**kw):
    base = dict(nx=64, ny=64, reynolds=400.0, max_steps=60)
    base.update(kw)
    return SimConfig(**base)


def _run_single(cfg, n):
    state = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        state = step(state)
    return state


@pytest.mark.parametrize(
    "mesh_shape,collision",
    [((1, 1), "srt"), ((2, 2), "srt"), ((4, 2), "mrt"), ((1, 8), "trt"), ((8, 1), "srt")],
)
def test_sharded_matches_single_chip(mesh_shape, collision):
    cfg = _cfg(collision=collision, mesh_shape=mesh_shape)
    n = 25
    ref = _run_single(cfg, n)

    mesh = make_mesh(mesh_shape)
    state = shard_state(engine.init_state(cfg), mesh)
    step = jax.jit(make_sharded_fused_step(cfg, mesh))
    for _ in range(n):
        state = step(state)

    np.testing.assert_array_equal(np.asarray(state.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(state.rho_lid), np.asarray(ref.rho_lid))


def test_sharded_scan_runner_matches_stepwise():
    cfg = _cfg(mesh_shape=(2, 4), collision="mrt")
    mesh = make_mesh(cfg.mesh_shape)
    n = 20

    state = shard_state(engine.init_state(cfg), mesh)
    runner = make_sharded_scan_runner(cfg, n, mesh)
    out = runner(state)

    ref = _run_single(cfg, n)
    np.testing.assert_allclose(np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-14)


def test_sharded_van_driest_matches_single_chip():
    # The per-shard Cs^2 block must reproduce the global Van Driest plane
    # (wall distances are global, not per-shard).
    cfg = _cfg(mesh_shape=(2, 4), reynolds=5000.0,
               turbulence="smagorinsky", van_driest=True)
    n = 20
    ref = _run_single(cfg, n)

    mesh = make_mesh(cfg.mesh_shape)
    state = shard_state(engine.init_state(cfg), mesh)
    runner = make_sharded_scan_runner(cfg, n, mesh)
    state = runner(state)

    np.testing.assert_allclose(
        np.asarray(state.f), np.asarray(ref.f), rtol=0, atol=1e-14
    )


def test_sharded_observables_match():
    cfg = _cfg(mesh_shape=(2, 2), turbulence="smagorinsky")
    mesh = make_mesh(cfg.mesh_shape)
    n = 15

    ref = _run_single(cfg, n)
    rho_ref, u_ref = jax.jit(
        lambda s: engine.observables(cfg, s)
    )(ref)

    state = shard_state(engine.init_state(cfg), mesh)
    runner = make_sharded_scan_runner(cfg, n, mesh)
    state = runner(state)
    rho, u = sharded_observables(cfg, mesh)(state)

    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-13)
