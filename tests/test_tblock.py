"""Temporally-blocked kernel == fused engine, bit-for-bit (interpret mode):
the K-step trapezoid, its rho_lid in-window recurrence, remainder handling,
and interior-tile garbage-creep bookkeeping."""

import jax
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.kernels import pallas_pull_tblock as tb


def _ref(cfg, n):
    s = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        s = step(s)
    return s


@pytest.mark.parametrize("collision,k,n", [("srt", 4, 19), ("mrt", 8, 16)])
def test_tblock_matches_engine(collision, k, n):
    cfg = SimConfig(nx=64, ny=64, reynolds=400.0, collision=collision,
                    precision="float32")
    ref = _ref(cfg, n)
    out = tb.make_scan_runner(cfg, n, k_steps=k, interpret=True)(
        engine.init_state(cfg))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(out.rho_lid), np.asarray(ref.rho_lid))


def test_tblock_interior_tiles(monkeypatch):
    """Several interior tiles: the trapezoid's creep bookkeeping."""
    monkeypatch.setattr(tb, "pick_block", lambda nx, ny, k=8: (32, 8))
    cfg = SimConfig(nx=256, ny=64, reynolds=400.0, collision="srt",
                    precision="float32")
    ref = _ref(cfg, 16)
    out = tb.make_scan_runner(cfg, 16, k_steps=8, interpret=True)(
        engine.init_state(cfg))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))


def test_tblock_smagorinsky():
    cfg = SimConfig(nx=64, ny=64, reynolds=5000.0, collision="mrt",
                    turbulence="smagorinsky", precision="float32")
    ref = _ref(cfg, 8)
    out = tb.make_scan_runner(cfg, 8, k_steps=4, interpret=True)(
        engine.init_state(cfg))
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
