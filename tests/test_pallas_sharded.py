"""Sharded Pallas backend == single-chip fused engine, bit-for-bit
(interpret mode on the 8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.kernels.pallas_pull_sharded import (
    make_sharded_pallas_runner,
)
from latticeboltzmannsimulations_tpu.parallel import make_mesh, shard_state


@pytest.mark.parametrize(
    "mesh_shape,collision",
    [((1, 1), "mrt"), ((2, 2), "srt"), ((2, 4), "mrt")],
)
def test_sharded_pallas_matches_single_chip(mesh_shape, collision):
    mx, my = mesh_shape
    cfg = SimConfig(nx=64, ny=64, reynolds=400.0, collision=collision,
                    precision="float32", mesh_shape=mesh_shape)
    n = 12
    ref = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        ref = step(ref)

    mesh = make_mesh(mesh_shape)
    state = shard_state(engine.init_state(cfg), mesh)
    runner = make_sharded_pallas_runner(cfg, n, mesh, interpret=True)
    out = runner(state)

    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(out.rho_lid), np.asarray(ref.rho_lid))


def test_sharded_pallas_x_only_mesh_lane_fast_path():
    """my == 1 with ly % 128 == 0 takes the no-halo-lane layout (wrap
    semantics via lane roll, single-chip style) — still bit-identical."""
    cfg = SimConfig(nx=64, ny=128, reynolds=400.0, collision="mrt",
                    precision="float32", mesh_shape=(2, 1))
    n = 8
    ref = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        ref = step(ref)
    mesh = make_mesh(cfg.mesh_shape)
    out = make_sharded_pallas_runner(cfg, n, mesh, interpret=True)(
        shard_state(engine.init_state(cfg), mesh))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(out.rho_lid), np.asarray(ref.rho_lid))


def test_sharded_pallas_van_driest():
    """The per-shard Van Driest Cs^2 plane staged as a kernel input matches
    the single-chip engine's globally built field bit-for-bit."""
    cfg = SimConfig(nx=64, ny=64, reynolds=10000.0, collision="mrt",
                    turbulence="smagorinsky", van_driest=True,
                    precision="float32", mesh_shape=(2, 2))
    n = 6
    ref = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        ref = step(ref)
    mesh = make_mesh(cfg.mesh_shape)
    out = make_sharded_pallas_runner(cfg, n, mesh, interpret=True)(
        shard_state(engine.init_state(cfg), mesh))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))


def test_sharded_pallas_smagorinsky():
    cfg = SimConfig(nx=64, ny=64, reynolds=5000.0, collision="mrt",
                    turbulence="smagorinsky", precision="float32",
                    mesh_shape=(2, 2))
    n = 6
    ref = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        ref = step(ref)
    mesh = make_mesh(cfg.mesh_shape)
    out = make_sharded_pallas_runner(cfg, n, mesh, interpret=True)(
        shard_state(engine.init_state(cfg), mesh))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
