"""Native C++ engine == JAX fused engine (f32 tolerance: independent
implementations, different op order)."""

import jax
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.native import (
    NativeEngine,
    is_available,
    native_run,
    num_threads,
)

pytestmark = pytest.mark.skipif(
    not is_available(), reason="no C++ toolchain for the native engine"
)


def _run_jax(cfg, n):
    state = engine.init_state(cfg)
    step = jax.jit(engine.make_fused_step(cfg))
    for _ in range(n):
        state = step(state)
    return np.asarray(state.f), np.asarray(state.rho_lid)


@pytest.mark.parametrize("collision", ["srt", "trt", "mrt"])
def test_native_matches_jax(collision):
    cfg = SimConfig(nx=48, ny=48, reynolds=400.0, collision=collision,
                    precision="float32")
    n = 20
    f_ref, lid_ref = _run_jax(cfg, n)
    st = engine.init_state(cfg)
    f, lid = native_run(cfg, np.asarray(st.f), np.asarray(st.rho_lid), n)
    np.testing.assert_allclose(f, f_ref, atol=2e-5)
    np.testing.assert_allclose(lid, lid_ref, atol=2e-5)


@pytest.mark.parametrize("collision", ["srt", "trt"])
def test_native_smagorinsky_matches(collision):
    # TRT+LES pins the omega^- = f(tau0, magic) closure: the magic parameter
    # must see the base tau, not the LES-modified effective tau.
    cfg = SimConfig(nx=48, ny=48, reynolds=5000.0, collision=collision,
                    turbulence="smagorinsky", precision="float32")
    f_ref, _ = _run_jax(cfg, 15)
    st = engine.init_state(cfg)
    f, _ = native_run(cfg, np.asarray(st.f), np.asarray(st.rho_lid), 15)
    np.testing.assert_allclose(f, f_ref, atol=2e-5)


def test_native_engine_wrapper():
    cfg = SimConfig(nx=48, ny=48, reynolds=100.0, precision="float32")
    eng = NativeEngine(cfg).run(100)
    rho, u = eng.observables()
    assert np.all(np.isfinite(rho)) and abs(rho.mean() - 1.0) < 1e-3
    assert num_threads() >= 1


def test_native_multistep_equals_stepwise():
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0, precision="float32")
    st = engine.init_state(cfg)
    f0, l0 = np.asarray(st.f), np.asarray(st.rho_lid)
    f_a, l_a = native_run(cfg, f0, l0, 7)
    f_b, l_b = f0, l0
    for _ in range(7):
        f_b, l_b = native_run(cfg, f_b, l_b, 1)
    np.testing.assert_array_equal(f_a, f_b)
    np.testing.assert_array_equal(l_a, l_b)
