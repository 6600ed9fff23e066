"""Physics-regression gates vs the Ghia et al. (1982) benchmark, and unit
tests of the validation utilities."""

import numpy as np
import pytest

import latticeboltzmannsimulations_tpu as lbt
from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.validate import (
    compare_to_ghia,
    find_vortex_centers,
    l2_error,
    r_squared,
)
from latticeboltzmannsimulations_tpu.validate import ghia_data


def test_ghia_tables_shapes():
    for re in ghia_data.RE_VALUES:
        ys, ux = ghia_data.ux_table(re)
        xs, uy = ghia_data.uy_table(re)
        assert len(ys) == 17 and len(xs) == 17
        assert np.all(np.diff(ys) > 0)
        # wall values are exact
        assert ux[-1] == 1.0 and ux[0] == 0.0
        assert uy[0] == 0.0 and uy[-1] == 0.0
    assert ghia_data.vortex_table(1000)["primary"] == (0.5313, 0.5625)
    with pytest.raises(KeyError):
        ghia_data.ux_table(123.0)


def test_r2_and_l2():
    y = np.array([1.0, 2.0, 3.0])
    assert r_squared(y, y) == 1.0
    assert l2_error(y, y) == 0.0
    assert r_squared(y, y[::-1]) < 0.0
    assert l2_error(np.array([3.0, 4.0]), np.array([3.0, 4.0 + 5.0])) == 1.0


def test_vortex_finder_synthetic():
    # Rigid-body-like vortex centred at (0.25, 0.75 from bottom) on a 64^2 grid
    nx = ny = 64
    x = np.arange(nx)[:, None] / (nx - 1)
    y_top = np.arange(ny)[None, :] / (ny - 1)   # 0 at lid
    ybot = 1.0 - y_top
    cx, cy = 0.25, 0.75
    zero = np.zeros((nx, ny))
    u = np.stack([zero - (ybot - cy), zero + (x - cx)])  # speed = distance from center
    centers = find_vortex_centers(u, n_vortices=1, bc_offset=2)
    assert len(centers) == 1
    got_x, got_y = centers[0]
    assert abs(got_x - cx) < 0.05 and abs(got_y - cy) < 0.05


@pytest.mark.parametrize("collision", ["srt", "mrt"])
def test_ghia_gate_re100(collision):
    """Integration gate: Re=100 cavity at 96^2 must reproduce the Ghia
    centerlines (R^2 > 0.995, combined L2 < 3%)."""
    cfg = lbt.SimConfig(
        nx=96, ny=96, reynolds=100.0, collision=collision,
        precision="float32", max_steps=15000,
    ).validate()
    runner = engine.make_scan_runner(cfg, cfg.max_steps)
    s = runner(engine.init_state(cfg))
    _, u = engine.observables(cfg, s)
    cmp = compare_to_ghia(np.asarray(u), cfg.u_lid, cfg.reynolds)
    assert cmp.r2_ux > 0.995 and cmp.r2_uy > 0.995, cmp.summary()
    assert cmp.l2_combined < 0.03, cmp.summary()


def test_ghia_gate_trt_smagorinsky_re100():
    """TRT + LES also passes the low-Re gate (eddy viscosity ~ 0 in laminar
    flow, so the model must not corrupt the solution)."""
    cfg = lbt.SimConfig(
        nx=96, ny=96, reynolds=100.0, collision="trt",
        turbulence="smagorinsky", precision="float32", max_steps=15000,
    ).validate()
    runner = engine.make_scan_runner(cfg, cfg.max_steps)
    s = runner(engine.init_state(cfg))
    _, u = engine.observables(cfg, s)
    cmp = compare_to_ghia(np.asarray(u), cfg.u_lid, cfg.reynolds)
    assert cmp.r2_ux > 0.99 and cmp.r2_uy > 0.99, cmp.summary()


def test_ghia_table_typo_corrections():
    """The reference CSV's two physically-impossible transcription typos are
    corrected (reference GhiaData.csv rows 16 and 9): |u| <= 1 everywhere and
    the Re=400 mid-row Uy profile is monotonically negative near x=1."""
    from latticeboltzmannsimulations_tpu.validate import ghia_data

    for re in ghia_data.RE_VALUES:
        _, ux = ghia_data.ux_table(re)
        _, uy = ghia_data.uy_table(re)
        assert abs(ux).max() <= 1.0 and abs(uy).max() <= 1.0
    xs, uy400 = ghia_data.uy_table(400.0)
    near_right = uy400[(xs > 0.9) & (xs < 1.0)]
    assert (near_right < 0).all()
    # third correction: every interior station is a node of Ghia's 129-point
    # grid (k/128) — in particular 0.2813, not the CSV's transposed 0.2831
    ys, _ = ghia_data.ux_table(1000.0)
    for y in ys:
        assert abs(y * 128 - round(y * 128)) < 0.13, y
    assert 0.2813 in ys and 0.2831 not in ys


def test_re10000_midline_station_suspect():
    """+0.03111 at (Re=10000, ux, y=0.5) breaks profile smoothness in both y
    and Re (likely sign typo); it must be excluded from the gates."""
    from latticeboltzmannsimulations_tpu.validate import ghia_data
    from latticeboltzmannsimulations_tpu.validate.ghia import compare_to_ghia

    assert ghia_data.is_suspect(10000.0, "ux", 0.5)
    u = np.zeros((2, 64, 64), np.float32)
    gated = compare_to_ghia(u, 0.08, 10000.0)
    assert 0.5 not in gated.y_stations


def test_suspect_station_excluded():
    from latticeboltzmannsimulations_tpu.validate.ghia import compare_to_ghia

    u = np.zeros((2, 64, 64), np.float32)
    full = compare_to_ghia(u, 0.08, 400.0, exclude_suspect=False)
    gated = compare_to_ghia(u, 0.08, 400.0)
    assert len(gated.x_stations) == len(full.x_stations) - 1
    assert 0.9063 not in gated.x_stations
