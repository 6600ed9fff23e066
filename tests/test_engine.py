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


# ---------------------------------------------------------------------------
# Tangential-lid fused pull variant (r5: flagship BC-closure control)
# ---------------------------------------------------------------------------

def test_fused_tangential_bc_matches_ops_boundary():
    """The fused tangential gather+BC must equal gather -> ops.boundary
    .nebb_tangential with a wall-consistent equilibrium: the static-wall
    NEBB term feq_k - feq_kbar vanishes *exactly* (opposite pairs share
    weights and u=0 there), and the lid/corner closures use no feq at all,
    so the reduction is exact — not just approximate."""
    from latticeboltzmannsimulations_tpu.ops import boundary as bc_ops
    from latticeboltzmannsimulations_tpu.ops.equilibrium import equilibrium as eq
    from latticeboltzmannsimulations_tpu.ops.streaming import gather_pull

    cfg = small_cfg(boundary="nebb_tangential")
    rng = np.random.default_rng(7)
    rho = jnp.asarray(1.0 + 0.05 * rng.standard_normal((cfg.nx, cfg.ny)))
    u = jnp.asarray(0.05 * rng.standard_normal((2, cfg.nx, cfg.ny)))
    # wall-consistent u: zero on the static walls (any lid value works —
    # the tangential closure overwrites the lid populations feq-free)
    u = u.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0).at[:, :, -1].set(0.0)
    f = eq(rho, u)

    got = engine._fused_gather_bc_tangential(cfg, f)
    want = bc_ops.nebb_tangential(gather_pull(f), eq(rho, u), cfg.u_lid)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tangential_steady_state_push_vs_fused():
    """Fused pull tangential engine and the push-oracle tangential engine
    integrate the same physics (pull/push duals of one closure).

    48x40 grid: the Zou-He corner rule at unit density is unstable on very
    coarse grids (~24 cells — BOTH engines blow up there, push first), so
    this runs at the smallest size where the closure is stable."""
    cfg = small_cfg(nx=48, ny=40, boundary="nebb_tangential", max_steps=4000)
    fused = engine.make_scan_runner(cfg, 2000)
    push = jax.jit(engine.make_push_oracle_step(cfg))

    s = fused(engine.init_state(cfg))
    _, u_pull = engine.observables(cfg, s)

    f = engine.init_state(cfg).f
    for _ in range(2000):
        f = push(f)
    from latticeboltzmannsimulations_tpu.ops import macroscopics, boundary

    rho, u_push = macroscopics(f)
    u_push, _ = boundary.override_wall_velocity(u_push, rho, f, cfg.u_lid,
                                                "wall")
    a = np.asarray(u_pull)[:, 1:-1, 1:-1]
    b = np.asarray(u_push)[:, 1:-1, 1:-1]
    assert np.max(np.abs(a - b)) / cfg.u_lid < 2e-3


def test_tangential_fused_mass_bounded():
    """The Zou-He corner rule pins corner density; total mass must stay
    bounded over thousands of fused tangential steps."""
    cfg = small_cfg(nx=48, ny=40, boundary="nebb_tangential", max_steps=3000)
    runner = engine.make_scan_runner(cfg, 3000)
    s = runner(engine.init_state(cfg))
    rho, _ = engine.observables(cfg, s)
    assert abs(float(np.asarray(rho).mean()) - 1.0) < 0.02
