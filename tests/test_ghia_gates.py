"""Integration gates: converged cavity physics vs the Ghia 1982 tables
(the reference's de-facto quality bar, SURVEY.md §4), plus the boundary- and
turbulence-variant paths through the high-level driver."""

import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate
from latticeboltzmannsimulations_tpu.validate import compare_to_ghia
from latticeboltzmannsimulations_tpu.validate.ghia_data import vortex_table
from latticeboltzmannsimulations_tpu.validate.vortex import find_vortex_centers


@pytest.fixture(scope="module")
def re100_run():
    cfg = SimConfig(nx=96, ny=96, reynolds=100.0, collision="srt",
                    max_steps=12000, report_interval=2000,
                    precision="float32")
    res = engine.run_to_convergence(cfg)
    rho, u = engine.observables(cfg, res.state)
    return cfg, np.asarray(u)


def test_ghia_gate_re100(re100_run):
    cfg, u = re100_run
    cmp_ = compare_to_ghia(u, cfg.u_lid, cfg.reynolds)
    assert cmp_.r2_ux > 0.99, cmp_.summary()
    assert cmp_.r2_uy > 0.99, cmp_.summary()
    assert cmp_.l2_combined < 0.05, cmp_.summary()


def test_primary_vortex_re100(re100_run):
    """One of the detected velocity minima is the primary vortex at Ghia's
    position (the finder also returns corner stagnation regions, which the
    reference pairs up the same way, CNN_predict.py:181-212)."""
    cfg, u = re100_run
    # a ~nx/10 exclusion radius separates the primary from the corner eddies
    centers = find_vortex_centers(u, n_vortices=3, bc_offset=cfg.nx // 10)
    gx, gy = vortex_table(100.0)["primary"]
    best = min(abs(px - gx) + abs(py - gy) for px, py in centers)
    assert best < 0.06, (centers, (gx, gy))


def test_mrt_ghia_gate_re100():
    """The MRT operator hits the same Ghia fidelity bar as SRT."""
    cfg = SimConfig(nx=96, ny=96, reynolds=100.0, collision="mrt",
                    max_steps=12000, report_interval=2000,
                    precision="float32")
    res = engine.run_to_convergence(cfg)
    _, u = engine.observables(cfg, res.state)
    cmp_ = compare_to_ghia(np.asarray(u), cfg.u_lid, cfg.reynolds)
    assert cmp_.r2_ux > 0.99 and cmp_.l2_combined < 0.05, cmp_.summary()


def test_mrt_ghia_gate_re400_default():
    """Default-suite mid-Re gate (VERDICT r2 weak #5): Re=100 alone cannot
    catch regressions that only show above it (the reference validated up to
    Re=10000, ``MRTtest.py:858-860``).  Re=400 at 96²/30k steps is the
    cheapest config that exercises the nonlinear advection balance hard:
    measured R²=0.9993 / L2=2.5% on this exact config; gated with margin.
    The strict 128²-256² high-Re gates stay opt-in (``-m slow``) / on-TPU
    (``scripts/slow_gates.py``)."""
    cfg = SimConfig(nx=96, ny=96, reynolds=400.0, collision="mrt",
                    max_steps=30_000, report_interval=5_000,
                    precision="float32")
    res = engine.run_to_convergence(cfg)
    _, u = engine.observables(cfg, res.state)
    cmp_ = compare_to_ghia(np.asarray(u), cfg.u_lid, cfg.reynolds)
    assert cmp_.r2_ux > 0.995, cmp_.summary()
    assert cmp_.r2_uy > 0.995, cmp_.summary()
    assert cmp_.l2_combined < 0.035, cmp_.summary()


def test_van_driest_runs_and_stays_finite():
    cfg = SimConfig(nx=64, ny=64, reynolds=5000.0, collision="srt",
                    turbulence="smagorinsky", van_driest=True,
                    max_steps=400, report_interval=200, precision="float32")
    res = engine.run_to_convergence(cfg)
    _, u = engine.observables(cfg, res.state)
    assert np.all(np.isfinite(np.asarray(u)))


def test_simulate_bounce_back_fallback(tmp_path):
    """Non-NEBB boundaries route to the push-oracle engine."""
    cfg = SimConfig(nx=48, ny=48, reynolds=100.0, boundary="bounce_back",
                    max_steps=200, report_interval=100, precision="float32")
    s = simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                                 metrics_jsonl=False))
    assert s.steps == 200 and np.isfinite(s.mlups)


def test_simulate_nebb_tangential_fallback(tmp_path):
    """The tangential-lid variant routes to the fused-jit engine (r5)."""
    cfg = SimConfig(nx=48, ny=48, reynolds=100.0, boundary="nebb_tangential",
                    max_steps=200, report_interval=100, precision="float32")
    s = simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                                 metrics_jsonl=False))
    assert s.steps == 200 and np.isfinite(s.mlups)
