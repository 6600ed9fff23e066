"""Pallas push kernel == push oracle (interpret mode on CPU).

The kernel re-implements the MRT.py-order step (collide -> stream -> NEBB)
with halo-recompute tiles; macros/equilibrium/collision reuse the shared ops
code.  Pinning convention: f64 trajectories agree to 1e-13 (the engine
oracle-pinning convention, ``test_engine.py``); in f32 the oracle's
row-sliced ``.at`` NEBB and the kernel's plane-wide ``where`` form fuse
differently in XLA (different FMA contraction), so f32 agreement is
ulp-level rather than bit-exact — asserted at 1e-6 over 10 steps."""

import jax
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.kernels import pallas_push


def _cfg(**kw):
    base = dict(nx=64, ny=64, reynolds=400.0, precision="float64")
    base.update(kw)
    return SimConfig(**base)


def _run_both(cfg, steps):
    ref_step = jax.jit(engine.make_push_oracle_step(cfg))
    pk_step = jax.jit(pallas_push.make_push_step(cfg, interpret=True))
    f_ref = f_pk = engine.init_state(cfg).f
    for _ in range(steps):
        f_ref = ref_step(f_ref)
        f_pk = pk_step(f_pk)
    return np.asarray(f_ref), np.asarray(f_pk)


@pytest.mark.parametrize("collision", ["srt", "trt", "mrt"])
def test_push_kernel_matches_oracle(collision):
    f_ref, f_pk = _run_both(_cfg(collision=collision), 10)
    np.testing.assert_allclose(f_pk, f_ref, rtol=1e-12, atol=1e-13)


def test_push_kernel_matches_oracle_f32():
    f_ref, f_pk = _run_both(_cfg(collision="mrt", precision="float32"), 10)
    np.testing.assert_allclose(f_pk, f_ref, rtol=0, atol=1e-6)


def test_push_kernel_smagorinsky_matches():
    cfg = _cfg(collision="srt", turbulence="smagorinsky", reynolds=5000.0)
    f_ref, f_pk = _run_both(cfg, 6)
    np.testing.assert_allclose(f_pk, f_ref, rtol=1e-12, atol=1e-13)


def test_push_kernel_non_square():
    f_ref, f_pk = _run_both(_cfg(nx=96, ny=64), 4)
    np.testing.assert_allclose(f_pk, f_ref, rtol=1e-12, atol=1e-13)


def test_push_scan_runner_matches_stepwise():
    cfg = _cfg(collision="mrt")
    step = pallas_push.make_push_step(cfg, interpret=True)
    runner = pallas_push.make_push_scan_runner(cfg, 7, interpret=True)
    f1 = f2 = engine.init_state(cfg).f
    for _ in range(7):
        f1 = step(f1)
    f2 = runner(f2)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_push_kernel_rejects_unsupported():
    with pytest.raises(ValueError, match="boundary"):
        pallas_push.make_push_step(_cfg(boundary="bounce_back"),
                                   interpret=True)
    with pytest.raises(ValueError, match="van-Driest"):
        pallas_push.make_push_step(
            _cfg(turbulence="smagorinsky", van_driest=True, reynolds=5000.0),
            interpret=True)
