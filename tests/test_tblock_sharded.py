"""Sharded temporally-blocked backend == single-chip fused engine,
bit-for-bit (interpret mode on the CPU mesh)."""

import jax
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.kernels.pallas_pull_tblock_sharded import (
    make_sharded_tblock_runner,
)
from latticeboltzmannsimulations_tpu.parallel import make_mesh, shard_state


def _ref(cfg, n):
    s = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        s = step(s)
    return s


@pytest.mark.parametrize("mesh_shape,collision,n", [
    ((2, 1), "mrt", 16),   # exact multiple of K
    ((4, 1), "srt", 20),   # remainder steps via the per-step sharded kernel
    ((1, 1), "mrt", 8),    # degenerate mesh = pure wrap semantics, K only
])
def test_sharded_tblock_matches_single_chip(mesh_shape, collision, n):
    cfg = SimConfig(nx=128, ny=64, reynolds=400.0, collision=collision,
                    precision="float32", mesh_shape=mesh_shape)
    ref = _ref(cfg, n)
    mesh = make_mesh(mesh_shape)
    runner = make_sharded_tblock_runner(cfg, n, mesh, k_steps=8,
                                        interpret=True)
    out = runner(shard_state(engine.init_state(cfg), mesh))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(out.rho_lid), np.asarray(ref.rho_lid))


@pytest.mark.parametrize("mesh_shape,collision,n", [
    ((2, 2), "mrt", 16),   # 2-D pod decomposition, exact multiple of K
    ((2, 4), "srt", 20),   # remainder via the per-step sharded kernel
    ((4, 2), "trt", 16),
    ((1, 8), "mrt", 16),   # y-only: every halo image in play, ly == K'
])
def test_sharded_tblock_matches_single_chip_2d(mesh_shape, collision, n):
    """y-sharded meshes: content-keyed wall masks on the ring-wrapped halo
    lanes must reproduce the trajectory-visible y-wrap bit-for-bit."""
    cfg = SimConfig(nx=128, ny=64, reynolds=400.0, collision=collision,
                    precision="float32", mesh_shape=mesh_shape)
    ref = _ref(cfg, n)
    mesh = make_mesh(mesh_shape)
    runner = make_sharded_tblock_runner(cfg, n, mesh, k_steps=8,
                                        interpret=True)
    out = runner(shard_state(engine.init_state(cfg), mesh))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(out.rho_lid), np.asarray(ref.rho_lid))


@pytest.mark.parametrize("mesh_shape", [(1, 1)])
def test_sharded_tblock_forced_halo_layout(mesh_shape):
    """force_halo_layout on my == 1 meshes (the single-chip TPU check's
    compiled-path hook): self-exchange rings must reproduce the wrap."""
    cfg = SimConfig(nx=128, ny=64, reynolds=400.0, collision="mrt",
                    precision="float32", mesh_shape=mesh_shape)
    ref = _ref(cfg, 16)
    mesh = make_mesh(mesh_shape)
    runner = make_sharded_tblock_runner(cfg, 16, mesh, k_steps=8,
                                        interpret=True,
                                        force_halo_layout=True)
    out = runner(shard_state(engine.init_state(cfg), mesh))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(out.rho_lid), np.asarray(ref.rho_lid))


def test_sharded_tblock_rejects_thin_lane_shards():
    # ly < K' leaves no room for the halo-depth exchange
    cfg = SimConfig(nx=64, ny=32, reynolds=400.0, precision="float32",
                    mesh_shape=(1, 8))
    with pytest.raises(ValueError, match="narrower than the K'"):
        make_sharded_tblock_runner(cfg, 8, make_mesh((1, 8)), interpret=True)


def test_rdma_halo_1x1_matches_ppermute():
    """halo_impl='rdma' on a degenerate mesh (local-copy wrap) is
    bit-identical to the ppermute path — the validation available without
    multi-chip hardware (see kernels/halo_rdma.py STATUS)."""
    cfg = SimConfig(nx=128, ny=64, reynolds=400.0, collision="mrt",
                    precision="float32", mesh_shape=(1, 1))
    mesh = make_mesh((1, 1))
    base = make_sharded_tblock_runner(cfg, 8, mesh, k_steps=8,
                                      interpret=True)
    rdma = make_sharded_tblock_runner(cfg, 8, mesh, k_steps=8,
                                      interpret=True, halo_impl="rdma")
    s0 = shard_state(engine.init_state(cfg), mesh)
    a = base(s0)
    b = rdma(s0)
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))
    np.testing.assert_array_equal(np.asarray(a.rho_lid),
                                  np.asarray(b.rho_lid))


def test_rdma_halo_multichip_traces():
    """The mx > 1 remote-RDMA path abstract-evaluates (shapes/avals are
    consistent through shard_map + scan); Mosaic compilation and execution
    need real multi-chip hardware (documented in halo_rdma.py)."""
    cfg = SimConfig(nx=128, ny=128, reynolds=400.0, collision="mrt",
                    precision="float32", mesh_shape=(2, 1))
    mesh = make_mesh((2, 1))
    runner = make_sharded_tblock_runner(cfg, 8, mesh, k_steps=8,
                                        halo_impl="rdma")
    s0 = shard_state(engine.init_state(cfg), mesh)
    out = jax.eval_shape(runner, s0)
    assert out.f.shape == s0.f.shape
    assert out.rho_lid.shape == s0.rho_lid.shape


def test_rdma_halo_rejects_unknown_impl():
    cfg = SimConfig(nx=128, ny=64, precision="float32", mesh_shape=(1, 1))
    mesh = make_mesh((1, 1))
    with pytest.raises(ValueError, match="halo_impl"):
        make_sharded_tblock_runner(cfg, 8, mesh, halo_impl="nope")
