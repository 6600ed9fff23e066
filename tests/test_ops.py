"""Unit tests for the physics operators against independent NumPy math."""

import jax.numpy as jnp
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import lattice
from latticeboltzmannsimulations_tpu.ops import (
    equilibrium,
    macroscopics,
    mrt_collide,
    srt_collide,
    trt_collide,
)
from latticeboltzmannsimulations_tpu.ops.collision import (
    mrt_from_moments,
    mrt_moment_equilibrium,
    mrt_moments,
    smagorinsky_tau,
)
from latticeboltzmannsimulations_tpu.ops.streaming import gather_pull

RNG = np.random.default_rng(0)


def random_field(nx=12, ny=10):
    rho = 1.0 + 0.05 * RNG.standard_normal((nx, ny))
    u = 0.05 * RNG.standard_normal((2, nx, ny))
    return jnp.asarray(rho), jnp.asarray(u)


def test_lattice_invariants():
    assert np.isclose(lattice.W.sum(), 1.0)
    assert np.all(lattice.C[lattice.OPP] == -lattice.C)
    assert np.allclose(lattice.M_GS @ lattice.M_GS_INV, np.eye(9), atol=1e-14)
    # weights are isotropic: sum w c c = cs^2 I
    for a in range(2):
        for b in range(2):
            s = (lattice.W * lattice.C[:, a] * lattice.C[:, b]).sum()
            assert np.isclose(s, (1.0 / 3.0) * (a == b))


def test_equilibrium_formula():
    rho, u = random_field()
    feq = np.asarray(equilibrium(rho, u))
    rho_n, u_n = np.asarray(rho), np.asarray(u)
    for k in range(9):
        cu = lattice.CX[k] * u_n[0] + lattice.CY[k] * u_n[1]
        usq = u_n[0] ** 2 + u_n[1] ** 2
        want = rho_n * lattice.W[k] * (1 + 3 * cu + 4.5 * cu**2 - 1.5 * usq)
        np.testing.assert_allclose(feq[k], want, rtol=1e-12)


def test_equilibrium_moments_roundtrip():
    rho, u = random_field()
    feq = equilibrium(rho, u)
    rho2, u2 = macroscopics(feq)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(rho), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-9, atol=1e-12)


def test_mrt_transforms_match_matrices():
    rho, u = random_field()
    f = equilibrium(rho, u) * (1.0 + 0.01 * RNG.standard_normal((9,) + rho.shape))
    m = np.asarray(mrt_moments(f))
    want = np.einsum("kl,lxy->kxy", lattice.M_GS, np.asarray(f))
    np.testing.assert_allclose(m, want, rtol=1e-12, atol=1e-14)
    back = np.asarray(mrt_from_moments(jnp.asarray(m)))
    np.testing.assert_allclose(back, np.asarray(f), rtol=1e-12, atol=1e-14)


def test_collisions_conserve_rho_and_momentum():
    rho, u = random_field()
    f = equilibrium(rho, u) * (1.0 + 0.02 * RNG.standard_normal((9,) + rho.shape))
    feq = equilibrium(*macroscopics(f))
    for f_post in (
        srt_collide(f, feq, 1.7),
        trt_collide(f, feq, 1.7, 1.1),
        mrt_collide(f, 1.7),
    ):
        r0, mom0 = np.asarray(jnp.sum(f, 0)), None
        r1 = np.asarray(jnp.sum(f_post, 0))
        np.testing.assert_allclose(r1, r0, rtol=1e-12)
        for c, name in ((lattice.CX, "jx"), (lattice.CY, "jy")):
            j0 = np.einsum("k,kxy->xy", c, np.asarray(f))
            j1 = np.einsum("k,kxy->xy", c, np.asarray(f_post))
            np.testing.assert_allclose(j1, j0, rtol=1e-10, atol=1e-13, err_msg=name)


def test_trt_reduces_to_srt_at_equal_rates():
    rho, u = random_field()
    f = equilibrium(rho, u) * (1.0 + 0.02 * RNG.standard_normal((9,) + rho.shape))
    feq = equilibrium(*macroscopics(f))
    np.testing.assert_allclose(
        np.asarray(trt_collide(f, feq, 1.6, 1.6)),
        np.asarray(srt_collide(f, feq, 1.6)),
        rtol=1e-12,
        atol=1e-15,
    )


def test_srt_at_omega_one_returns_equilibrium():
    rho, u = random_field()
    f = equilibrium(rho, u) * (1.0 + 0.02 * RNG.standard_normal((9,) + rho.shape))
    feq = equilibrium(*macroscopics(f))
    np.testing.assert_allclose(
        np.asarray(srt_collide(f, feq, 1.0)), np.asarray(feq), rtol=1e-12
    )


def test_gather_pull_matches_explicit_loop():
    nx, ny = 7, 6
    f = jnp.asarray(RNG.standard_normal((9, nx, ny)))
    g = np.asarray(gather_pull(f))
    fn = np.asarray(f)
    for k in range(9):
        cx, cy = int(lattice.CX[k]), int(lattice.CY[k])
        for x in range(nx):
            for y in range(ny):
                sx, sy = x - cx, y + cy
                if 0 <= sx < nx and 0 <= sy < ny:
                    assert g[k, x, y] == fn[k, sx, sy], (k, x, y)


def test_smagorinsky_tau_increases_and_bounds():
    rho, u = random_field()
    f = equilibrium(rho, u) * (1.0 + 0.05 * RNG.standard_normal((9,) + rho.shape))
    feq = equilibrium(*macroscopics(f))
    tau0 = 0.6
    tau = np.asarray(smagorinsky_tau(f, feq, rho, tau0))
    assert np.all(tau >= tau0 - 1e-12)
    # zero non-equilibrium => tau unchanged
    tau_eq = np.asarray(smagorinsky_tau(feq, feq, rho, tau0))
    np.testing.assert_allclose(tau_eq, tau0, rtol=1e-12)


def test_nebb_tangential_lid_moment_closure():
    """The Zou-He tangential lid closure imposes (jx, jy) = (u_lid, 0) on
    interior lid cells and rho = 1 with lid momentum at both corners
    (reference commented experiment: MRT.py:461-482)."""
    from latticeboltzmannsimulations_tpu.ops.boundary import nebb_tangential

    nx, ny, u_lid = 10, 8, 0.08
    f = jnp.asarray(1.0 / 9.0 + 0.01 * RNG.standard_normal((9, nx, ny)))
    rho0 = 1.0 + 0.02 * RNG.standard_normal((nx, ny))
    u0 = 0.03 * RNG.standard_normal((2, nx, ny))
    feq = equilibrium(jnp.asarray(rho0), jnp.asarray(u0))
    out = np.asarray(nebb_tangential(f, feq, u_lid))

    cx, cy = np.asarray(lattice.CX, float), np.asarray(lattice.CY, float)
    jx = np.tensordot(cx, out, axes=(0, 0))
    jy = np.tensordot(cy, out, axes=(0, 0))
    # Interior lid cells: exact momentum (incompressible rho ~= 1 form).
    np.testing.assert_allclose(jx[1:-1, 0], u_lid, atol=1e-12)
    np.testing.assert_allclose(jy[1:-1, 0], 0.0, atol=1e-12)
    # Corners: unit density, lid momentum, zero normal flux.
    rho = out.sum(axis=0)
    for x in (0, nx - 1):
        assert abs(rho[x, 0] - 1.0) < 1e-12
        assert abs(jx[x, 0] - u_lid) < 1e-12
        assert abs(jy[x, 0]) < 1e-12
