"""Backend auto-routing (sim._select_backend): the decision table that picks
jit / Pallas / temporal-block / sharded runners per config + platform."""

import jax
import pytest

from latticeboltzmannsimulations_tpu import sim
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.sim import SimOptions


def _route(cfg, monkeypatch, backend="auto", platform="tpu"):
    monkeypatch.setattr(jax, "default_backend", lambda: platform)
    *_, name = sim._select_backend(cfg.validate(), SimOptions(backend=backend))
    return name


def test_auto_tpu_small_field_routes_plain_pallas(monkeypatch):
    cfg = SimConfig(nx=1024, ny=1024, reynolds=1000.0, precision="float32")
    assert _route(cfg, monkeypatch) == "pallas"


def test_auto_tpu_large_field_routes_tblock(monkeypatch):
    cfg = SimConfig(nx=4096, ny=4096, reynolds=1000.0, precision="float32")
    assert _route(cfg, monkeypatch) == "pallas-tblock"


def test_explicit_pallas_push(monkeypatch):
    # E10-parity push kernel: explicit opt-in only, on either platform.
    cfg = SimConfig(nx=256, ny=256, reynolds=1000.0, precision="float32")
    assert _route(cfg, monkeypatch, backend="pallas-push") == "pallas-push"
    assert _route(cfg, monkeypatch, backend="pallas-push",
                  platform="cpu") == "pallas-push"


def test_auto_cpu_routes_jit(monkeypatch):
    cfg = SimConfig(nx=256, ny=256, reynolds=1000.0, precision="float32")
    assert _route(cfg, monkeypatch, platform="cpu") == "jit"


def test_auto_f64_routes_jit(monkeypatch):
    cfg = SimConfig(nx=256, ny=256, reynolds=1000.0, precision="float64")
    assert _route(cfg, monkeypatch) == "jit"


def test_auto_xonly_mesh_large_shards_routes_sharded_tblock(monkeypatch):
    cfg = SimConfig(nx=8192, ny=4096, reynolds=1000.0, precision="float32",
                    mesh_shape=(2, 1))
    assert _route(cfg, monkeypatch) == "sharded-tblock"


def test_auto_2d_mesh_routes_sharded_tblock(monkeypatch):
    # 2-D pod decompositions get temporal blocking too (halo-lane layout).
    cfg = SimConfig(nx=4096, ny=4096, reynolds=1000.0, precision="float32",
                    mesh_shape=(2, 2))
    assert _route(cfg, monkeypatch) == "sharded-tblock"


def test_auto_mesh_on_cpu_routes_jnp_sharded(monkeypatch):
    cfg = SimConfig(nx=256, ny=256, reynolds=1000.0, precision="float32",
                    mesh_shape=(2, 2))
    assert _route(cfg, monkeypatch, platform="cpu") == "sharded"


def test_auto_small_shards_stay_per_step_sharded(monkeypatch):
    # VMEM-resident per-shard fields: per-step sharded kernel, not tblock.
    cfg = SimConfig(nx=1024, ny=1024, reynolds=1000.0, precision="float32",
                    mesh_shape=(2, 1))
    assert _route(cfg, monkeypatch) == "sharded-pallas"


def test_explicit_backend_overrides(monkeypatch):
    cfg = SimConfig(nx=4096, ny=4096, reynolds=1000.0, precision="float32",
                    mesh_shape=(2, 1))
    assert _route(cfg, monkeypatch, backend="sharded-pallas") == \
        "sharded-pallas"
    assert _route(cfg, monkeypatch, backend="sharded") == "sharded"


def test_non_nebb_routes_push_oracle(monkeypatch):
    cfg = SimConfig(nx=256, ny=256, reynolds=1000.0, precision="float32",
                    boundary="bounce_back")
    assert _route(cfg, monkeypatch) == "push-oracle"


def test_nebb_tangential_routes_fused_jit(monkeypatch):
    # The tangential lid has a native fused pull form (r5); never Pallas
    # (whose kernel implements only the reduced NEBB) and never push-oracle.
    cfg = SimConfig(nx=512, ny=512, reynolds=1000.0, precision="float32",
                    boundary="nebb_tangential")
    assert _route(cfg, monkeypatch) == "jit"
    assert _route(cfg, monkeypatch, platform="cpu") == "jit"


def test_nebb_tangential_mesh_rejected(monkeypatch):
    cfg = SimConfig(nx=512, ny=512, reynolds=1000.0, precision="float32",
                    boundary="nebb_tangential", mesh_shape=(2, 1))
    with pytest.raises(ValueError, match="single-chip"):
        _route(cfg, monkeypatch)
