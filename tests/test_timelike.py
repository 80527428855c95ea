"""Massive-particle (time_like=True) geodesics.

The reference exposes ``time_like`` on its integrator
(curvedpy.GeodesicIntegratorSchwarzschild(mass, time_like=False),
/root/reference/raytracer/RelativisticRenderEngine.py:134); round 1 left it
a documented stub.  Oracles here are textbook Schwarzschild results:

* flat limit: timelike_init reduces to the special-relativistic 4-velocity;
* normalization: Hh = -1/2 (g u u = -1) conserved along the orbit;
* circular orbit at the exact Kepler-form frequency Omega^2 = M/r^3
  (exact in Schwarzschild for coordinate angular velocity) stays circular;
* perihelion precession of an eccentric orbit matches 6 pi M / p.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from blackhole_geodesic_calculator_tpu.ops import (
    GeodesicEnv, IntegratorConfig, hamiltonian, launch, states,
    timelike_init, trajectory,
)

M = 0.5


def _env(lam_max, r_escape=200.0):
    return GeodesicEnv(mass=jnp.float32(M), r_capture=jnp.float32(2 * M),
                       r_escape=jnp.float32(r_escape),
                       lam_max=jnp.float32(lam_max))


def test_timelike_init_flat_limit():
    """M -> 0: T = sqrt(1 + |v|^2), p = v (special relativity)."""
    v = jnp.asarray([[0.3, -0.1, 0.2]])
    x = jnp.asarray([[5.0, 1.0, -2.0]])
    p, E = timelike_init(x, v, 1e-12)
    np.testing.assert_allclose(np.asarray(p), np.asarray(v), atol=1e-6)
    np.testing.assert_allclose(
        float(E[0]), float(jnp.sqrt(1 + jnp.sum(v**2))), rtol=1e-6)


def test_timelike_normalization_conserved():
    """g u u = -1  <=>  Hh = -1/2, at init and all along the orbit."""
    r0 = 4.0
    omega = np.sqrt(M / r0**3)
    ut = 1.0 / np.sqrt(1.0 - 3.0 * M / r0)      # dt/dtau, circular orbit
    v = jnp.asarray([[0.0, r0 * omega * ut, 0.0]])
    x = jnp.asarray([[r0, 0.0, 0.0]])
    p, E = timelike_init(x, v, M)
    h0 = float(hamiltonian(x, p, E, M)[0])
    assert abs(h0 + 0.5) < 1e-6, h0

    cfg = IntegratorConfig(n_steps=2000, dt=0.05, dt_boost=1.0,
                           backend="scan")
    xs, ps, s = trajectory(_env(lam_max=100.0), x, v, cfg, time_like=True)
    hs = np.asarray(hamiltonian(xs, ps, s.E[None], M))
    assert np.abs(hs + 0.5).max() < 5e-4, np.abs(hs + 0.5).max()


def test_circular_orbit_stays_circular():
    """Circular timelike orbit at r = 8M: Omega = sqrt(M/r^3) exactly
    (Schwarzschild coordinate angular velocity), dphi/dtau = Omega * u^t
    with u^t = 1/sqrt(1 - 3M/r).  One full orbit keeps r constant."""
    r0 = 8.0 * M
    omega = np.sqrt(M / r0**3)
    ut = 1.0 / np.sqrt(1.0 - 3.0 * M / r0)
    v = jnp.asarray([[0.0, r0 * omega * ut, 0.0]])
    x = jnp.asarray([[r0, 0.0, 0.0]])

    # proper-time period: tau_orbit = 2 pi / (omega u^t)
    tau = 2 * np.pi / (omega * ut)
    cfg = IntegratorConfig(n_steps=4000, dt=float(tau / 3800), dt_boost=1.0,
                           backend="scan")
    xs, _, s = trajectory(_env(lam_max=float(tau * 0.99)), x, v, cfg,
                          time_like=True)
    r = np.linalg.norm(np.asarray(xs), axis=-1)[:, 0]
    assert abs(r.max() - r0) < 2e-3 * r0
    assert abs(r.min() - r0) < 2e-3 * r0
    # and it actually went around: polar angle sweeps ~2 pi
    xy = np.asarray(xs)[:, 0, :2]
    phi = np.unwrap(np.arctan2(xy[:, 1], xy[:, 0]))
    assert abs((phi[-1] - phi[0]) - 2 * np.pi * 0.99) < 0.05


def test_perihelion_precession():
    """Eccentric orbit (p~ = 20 M, e = 0.2): perihelion advance per orbit
    vs the EXACT Schwarzschild result by direct quadrature of
    dphi = 2 int (L/r^2) dr / sqrt(E^2 - (1-2M/r)(1+L^2/r^2)) over one
    radial period (the leading-order Mercury formula 6 pi M / p is ~30%
    low at this p~ -- the series converges slowly -- so the quadrature is
    the oracle and 6 pi M / p is only sanity-checked as a lower bound)."""
    from scipy.integrate import quad

    p_dimless = 20.0
    e = 0.2
    p_phys = p_dimless * M
    r_peri = p_phys / (1 + e)
    # exact bound-orbit Killing charges (geometrized, Cutler et al):
    # E^2 = (p~-2-2e)(p~-2+2e) / (p~ (p~-3-e^2)),  L = M p~/sqrt(p~-3-e^2)
    E2 = ((p_dimless - 2 - 2 * e) * (p_dimless - 2 + 2 * e)
          / (p_dimless * (p_dimless - 3 - e * e)))
    L = M * p_dimless / np.sqrt(p_dimless - 3 - e * e)
    v_tan = L / r_peri          # dphi/dtau * r at perihelion
    x = jnp.asarray([[r_peri, 0.0, 0.0]])
    v = jnp.asarray([[0.0, v_tan, 0.0]])

    def integrand(chi):         # r = p/(1 + e cos chi) kills the endpoints
        r = p_phys / (1 + e * np.cos(chi))
        drdchi = p_phys * e * np.sin(chi) / (1 + e * np.cos(chi)) ** 2
        R = E2 - (1 - 2 * M / r) * (1 + L * L / (r * r))
        return (L / (r * r)) * drdchi / np.sqrt(max(R, 1e-30))

    exact = 2 * quad(integrand, 1e-8, np.pi - 1e-8, limit=200)[0] - 2 * np.pi

    cfg = IntegratorConfig(n_steps=9000, dt=0.12, dt_boost=1.0,
                           backend="scan")
    xs, _, s = trajectory(_env(lam_max=1000.0, r_escape=400.0), x, v, cfg,
                          time_like=True)
    pos = np.asarray(xs)[:, 0, :]
    r = np.linalg.norm(pos, axis=-1)
    phi = np.unwrap(np.arctan2(pos[:, 1], pos[:, 0]))
    # successive perihelia = local minima of r
    mins = np.where((r[1:-1] < r[:-2]) & (r[1:-1] < r[2:]))[0] + 1
    assert len(mins) >= 2, f"need two perihelion passages, got {len(mins)}"
    precession = phi[mins[1]] - phi[mins[0]] - 2 * np.pi
    assert precession == pytest.approx(exact, rel=0.02), (precession, exact)
    assert precession > 6 * np.pi * M / p_phys  # GR beats the Mercury LO


def test_compat_time_like_api():
    """GeodesicIntegratorSchwarzschild(time_like=True).calc_trajectory
    integrates a massive orbit (round-1 stub removed)."""
    from blackhole_geodesic_calculator_tpu.compat import (
        GeodesicIntegratorSchwarzschild,
    )

    gi = GeodesicIntegratorSchwarzschild(mass=M, time_like=True)
    r0 = 8.0 * M
    omega = np.sqrt(M / r0**3)
    ut = 1.0 / np.sqrt(1.0 - 3.0 * M / r0)
    k, xtraj, res = gi.calc_trajectory(
        [0.0, r0 * omega * ut, 0.0], [r0, 0.0, 0.0],
        max_step=0.05, curve_end=40.0, r_escape=50.0)
    assert not res["start_inside_hole"]
    assert not res["hit_blackhole"]
    r = np.linalg.norm(xtraj, axis=0)
    assert abs(r.max() - r0) < 2e-2 and abs(r.min() - r0) < 2e-2

    with pytest.raises(ValueError, match="null"):
        GeodesicIntegratorSchwarzschild(mass=M, time_like=True,
                                        backend="native")
