"""Engine-level tests: fused step certified against the literal pull oracle,
stability, and convergence driver behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import latticeboltzmannsimulations_tpu as lbt
from latticeboltzmannsimulations_tpu import engine


def small_cfg(**kw):
    base = dict(
        nx=24,
        ny=20,
        reynolds=100.0,
        u_lid=0.08,
        precision="float64",
        max_steps=200,
        report_interval=50,
    )
    base.update(kw)
    return lbt.SimConfig(**base).validate()


@pytest.mark.parametrize("collision", ["srt", "trt", "mrt"])
def test_fused_matches_pull_oracle(collision):
    """The algebraically-reduced fused step must reproduce the literal
    pull-kernel semantics (materialized feq state) to fp64 accuracy."""
    cfg = small_cfg(collision=collision)
    fused = jax.jit(engine.make_fused_step(cfg))
    oracle = jax.jit(engine.make_pull_oracle_step(cfg))

    s_f = engine.init_state(cfg)
    s_o = engine.init_pull_oracle_state(cfg)
    for it in range(60):
        s_f = fused(s_f)
        s_o = oracle(s_o)
    np.testing.assert_allclose(
        np.asarray(s_f.f), np.asarray(s_o.f), rtol=1e-10, atol=1e-13
    )


def test_fused_matches_pull_oracle_smagorinsky():
    cfg = small_cfg(collision="srt", turbulence="smagorinsky")
    fused = jax.jit(engine.make_fused_step(cfg))
    oracle = jax.jit(engine.make_pull_oracle_step(cfg))
    s_f = engine.init_state(cfg)
    s_o = engine.init_pull_oracle_state(cfg)
    for _ in range(40):
        s_f = fused(s_f)
        s_o = oracle(s_o)
    np.testing.assert_allclose(
        np.asarray(s_f.f), np.asarray(s_o.f), rtol=1e-10, atol=1e-13
    )


@pytest.mark.parametrize("collision", ["srt", "trt", "mrt"])
def test_steady_state_agreement_push_vs_pull(collision):
    """Push (MRT.py order) and pull (kernel order) schemes integrate the same
    physics: after many steps their velocity fields agree closely."""
    cfg = small_cfg(collision=collision, max_steps=4000)
    fused = engine.make_scan_runner(cfg, 2000)
    push = jax.jit(engine.make_push_oracle_step(cfg))

    s = fused(engine.init_state(cfg))
    _, u_pull = engine.observables(cfg, s)

    f = engine.init_state(cfg).f
    for _ in range(2000):
        f = push(f)
    from latticeboltzmannsimulations_tpu.ops import macroscopics, boundary

    rho, u_push = macroscopics(f)
    u_push, _ = boundary.override_wall_velocity(u_push, rho, f, cfg.u_lid, "wall")

    # interior comparison (wall handling conventions differ at edges)
    a = np.asarray(u_pull)[:, 1:-1, 1:-1]
    b = np.asarray(u_push)[:, 1:-1, 1:-1]
    assert np.max(np.abs(a - b)) / cfg.u_lid < 2e-3


def test_scan_runner_equals_repeated_steps():
    cfg = small_cfg()
    step = jax.jit(engine.make_fused_step(cfg))
    runner = engine.make_scan_runner(cfg, 17)
    s1 = engine.init_state(cfg)
    for _ in range(17):
        s1 = step(s1)
    s2 = runner(engine.init_state(cfg))
    np.testing.assert_allclose(np.asarray(s1.f), np.asarray(s2.f), rtol=1e-12)


def test_run_to_convergence_small():
    cfg = small_cfg(max_steps=20000, report_interval=200, convergence_tol=1e-7)
    res = engine.run_to_convergence(cfg)
    assert res.converged, f"did not converge in {res.steps} steps"
    rho, u = engine.observables(cfg, res.state)
    assert bool(jnp.all(jnp.isfinite(u)))
    # lid row moves, bottom row does not
    assert float(u[0, cfg.nx // 2, 0]) == pytest.approx(cfg.u_lid)
    assert abs(float(u[0, cfg.nx // 2, cfg.ny - 1])) < 1e-12


def test_divergence_raises():
    cfg = small_cfg(reynolds=1e9, max_steps=4000, report_interval=500)
    with pytest.raises((FloatingPointError, ValueError)):
        cfg.validate()
        engine.run_to_convergence(cfg)


def test_float32_runs_stable():
    cfg = small_cfg(precision="float32", collision="mrt")
    runner = engine.make_scan_runner(cfg, 500)
    s = runner(engine.init_state(cfg))
    assert s.f.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(s.f)))
