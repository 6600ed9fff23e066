"""Pallas kernel == fused-jnp engine, exactly (interpret mode on CPU).

The kernel re-implements gather + NEBB with tile-local masks and a staged
x-halo window; macros/equilibrium/collision reuse the shared ops code, so
the trajectories must agree bit-for-bit in f32."""

import jax
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.kernels import pallas_pull


def _cfg(**kw):
    base = dict(nx=64, ny=64, reynolds=400.0, precision="float32")
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.parametrize("collision", ["srt", "trt", "mrt"])
def test_kernel_matches_fused_engine(collision):
    cfg = _cfg(collision=collision)
    ref_step = jax.jit(engine.make_fused_step(cfg))
    pk_step = pallas_pull.make_step(cfg, interpret=True)
    s_ref = s_pk = engine.init_state(cfg)
    for _ in range(10):
        s_ref = ref_step(s_ref)
        s_pk = pk_step(s_pk)
    np.testing.assert_array_equal(np.asarray(s_pk.f), np.asarray(s_ref.f))
    np.testing.assert_array_equal(
        np.asarray(s_pk.rho_lid), np.asarray(s_ref.rho_lid)
    )


def test_kernel_smagorinsky_matches():
    cfg = _cfg(collision="srt", turbulence="smagorinsky", reynolds=5000.0)
    ref_step = jax.jit(engine.make_fused_step(cfg))
    pk_step = pallas_pull.make_step(cfg, interpret=True)
    s_ref = s_pk = engine.init_state(cfg)
    for _ in range(6):
        s_ref = ref_step(s_ref)
        s_pk = pk_step(s_pk)
    np.testing.assert_array_equal(np.asarray(s_pk.f), np.asarray(s_ref.f))


def test_kernel_non_square_and_rect_tiles():
    cfg = _cfg(nx=96, ny=64)
    ref_step = jax.jit(engine.make_fused_step(cfg))
    pk_step = pallas_pull.make_step(cfg, interpret=True)
    s_ref = s_pk = engine.init_state(cfg)
    for _ in range(4):
        s_ref = ref_step(s_ref)
        s_pk = pk_step(s_pk)
    np.testing.assert_array_equal(np.asarray(s_pk.f), np.asarray(s_ref.f))


def test_scan_runner_matches_stepwise():
    cfg = _cfg(collision="mrt")
    runner = pallas_pull.make_scan_runner(cfg, 8, interpret=True)
    step = pallas_pull.make_step(cfg, interpret=True)
    s0 = engine.init_state(cfg)
    out = runner(s0)
    s = s0
    for _ in range(8):
        s = step(s)
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(s.f))


@pytest.mark.parametrize("collision", ["srt", "mrt"])
def test_plane_order_cy_matches_lattice_order(collision):
    """The cy-grouped plane-storage gather (r5 schedule experiment: slab
    rolls on the scratch window instead of per-plane roll/concat) is pure
    data movement — the permuted-layout scan runner must reproduce the
    lattice-order runner exactly."""
    cfg = _cfg(collision=collision)
    ref = pallas_pull.make_scan_runner(cfg, 8, interpret=True,
                                       plane_order=None)
    per = pallas_pull.make_scan_runner(
        cfg, 8, interpret=True, plane_order=pallas_pull.PLANE_ORDER_CY)
    s0 = engine.init_state(cfg)
    out_ref = ref(s0)
    out_per = per(s0)
    np.testing.assert_array_equal(np.asarray(out_per.f),
                                  np.asarray(out_ref.f))
    np.testing.assert_array_equal(np.asarray(out_per.rho_lid),
                                  np.asarray(out_ref.rho_lid))


def test_plane_order_env_flag(monkeypatch):
    """LBM_PLANE_ORDER=cy routes the scan runner through the permuted
    layout; the external state contract stays lattice-order."""
    monkeypatch.setenv("LBM_PLANE_ORDER", "cy")
    assert pallas_pull._env_plane_order() == pallas_pull.PLANE_ORDER_CY
    cfg = _cfg(collision="mrt")
    run = pallas_pull.make_scan_runner(cfg, 4, interpret=True)
    ref = pallas_pull.make_scan_runner(cfg, 4, interpret=True,
                                       plane_order=None)
    s0 = engine.init_state(cfg)
    np.testing.assert_array_equal(np.asarray(run(s0).f),
                                  np.asarray(ref(s0).f))
    monkeypatch.delenv("LBM_PLANE_ORDER")
    assert pallas_pull._env_plane_order() is None


def test_pick_tile_x_constraints():
    assert pallas_pull.pick_tile_x(1024, 1024) % 8 == 0
    assert 1024 % pallas_pull.pick_tile_x(1024, 1024) == 0
    assert pallas_pull.pick_tile_x(64, 64) == 32
    with pytest.raises(ValueError):
        pallas_pull.pick_tile_x(20, 64)


def test_kernel_double_buffered_path(monkeypatch):
    """Force the HBM-bound configuration (n_buf=2 window prefetch +
    raised vmem limit) and pin it to the fused engine bit-for-bit."""
    monkeypatch.setattr(pallas_pull, "_is_small_field", lambda nx, ny: False)
    cfg = _cfg(collision="mrt")
    ref_step = jax.jit(engine.make_fused_step(cfg))
    pk_step = pallas_pull.make_step(cfg, interpret=True)
    s_ref = s_pk = engine.init_state(cfg)
    for _ in range(8):
        s_ref = ref_step(s_ref)
        s_pk = pk_step(s_pk)
    np.testing.assert_array_equal(np.asarray(s_pk.f), np.asarray(s_ref.f))


def test_traced_omega_kernel_matches_engine():
    """make_step(traced_omega=True) == engine.make_fused_step_omega,
    bit-for-bit, across two different Reynolds numbers with ONE kernel."""
    import jax.numpy as jnp

    cfg = _cfg(collision="srt")
    step_ref = jax.jit(engine.make_fused_step_omega(cfg))
    step_pk = pallas_pull.make_step(cfg, interpret=True, traced_omega=True)
    for re in (150.0, 900.0):
        import dataclasses
        omega = jnp.asarray(
            dataclasses.replace(cfg, reynolds=re).omega, jnp.float32)
        s_ref = s_pk = engine.init_state(cfg)
        for _ in range(6):
            s_ref = step_ref(s_ref, omega)
            s_pk = step_pk(s_pk, omega)
        np.testing.assert_array_equal(np.asarray(s_pk.f), np.asarray(s_ref.f))


def test_van_driest_kernel_matches_engine():
    """The staged Cs^2(x, y) plane reproduces the jit engine's in-trace
    Van Driest field bit-for-bit (VERDICT r1 weak #6)."""
    cfg = _cfg(collision="mrt", turbulence="smagorinsky", van_driest=True,
               reynolds=10000.0)
    step_ref = jax.jit(engine.make_fused_step(cfg))
    step_pk = pallas_pull.make_step(cfg, interpret=True)
    s_ref = engine.init_state(cfg)
    s_pk = engine.init_state(cfg)
    for _ in range(8):
        s_ref = step_ref(s_ref)
        s_pk = step_pk(s_pk)
    np.testing.assert_array_equal(np.asarray(s_pk.f), np.asarray(s_ref.f))


def test_stacked_cavities_match_independent_runs():
    """n_cav=3 stacked-x batch == 3 independent traced-omega runs,
    bit-for-bit: the wall rewrite isolates every cavity in the stack."""
    import dataclasses

    import jax.numpy as jnp

    cfg = _cfg(collision="srt", turbulence="smagorinsky")
    n_cav, n = 3, 8
    res = (150.0, 900.0, 2500.0)
    omegas = jnp.asarray(
        [dataclasses.replace(cfg, reynolds=r).omega for r in res], jnp.float32
    )

    step_one = pallas_pull.make_step(cfg, interpret=True, traced_omega=True)
    singles = []
    for k in range(n_cav):
        s = engine.init_state(cfg)
        for _ in range(n):
            s = step_one(s, omegas[k])
        singles.append(s)

    s0 = engine.init_state(cfg)
    stacked = engine.State(
        f=jnp.concatenate([s0.f] * n_cav, axis=1),
        rho_lid=jnp.concatenate([s0.rho_lid] * n_cav),
    )
    runner = pallas_pull.make_sweep_runner(cfg, n_cav, n, interpret=True)
    out = runner(stacked, omegas)

    for k in range(n_cav):
        blk = np.asarray(out.f)[:, k * cfg.nx : (k + 1) * cfg.nx, :]
        np.testing.assert_array_equal(blk, np.asarray(singles[k].f))
        np.testing.assert_array_equal(
            np.asarray(out.rho_lid)[k * cfg.nx : (k + 1) * cfg.nx],
            np.asarray(singles[k].rho_lid),
        )


def test_grouped_rolls_match_per_plane_rolls():
    """The grouped gather schedule (one wide roll per distinct shift, the
    compiled-path default) must produce exactly the per-plane roll values:
    the roll axis never crosses the concatenated seams.  Pinned here
    directly because kernels in interpret mode always take the per-plane
    path (XLA:CPU FMA-contraction noise would break the engine pin)."""
    from latticeboltzmannsimulations_tpu import lattice
    from latticeboltzmannsimulations_tpu.kernels.pallas_pull import (
        _grouped_rolls,
    )

    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    planes = [jnp.asarray(rng.normal(size=(16, 128)), jnp.float32)
              for _ in range(lattice.Q)]
    for shifts in (
        [int(lattice.CX[k]) for k in range(lattice.Q)],        # x pattern
        [-int(lattice.CY[k]) for k in range(lattice.Q)],       # y pattern
    ):
        for axis in (0, 1):
            got = _grouped_rolls(planes, shifts, axis=axis, interpret=True)
            for p, s, g in zip(planes, shifts, got):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(jnp.roll(p, s, axis=axis))
                )
