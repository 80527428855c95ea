"""Integrator tests: the physics oracles the reference collected visually
("V Collect some characteristics of photon trajectories for testing",
reference README.md:232, Figs 5-6 behavior at README.md:68-76) made exact:

* flat metric -> straight lines (README.md:233 'flat metric to compare')
* conservation laws (null condition, L_z) along Schwarzschild geodesics
* weak-field deflection alpha ~= 4M/b
* photon-sphere critical impact parameter b_c = 3*sqrt(3)*M
* capture / escape / budget / inside-horizon taxonomy
* disk-crossing and sphere-hit events
* cross-formulation consistency: Hamiltonian (KS chart) vs Christoffel (AD)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_geodesic_calculator_tpu.models import (
    schwarzschild_cartesian_metric,
)
from blackhole_geodesic_calculator_tpu.ops import (
    GeodesicEnv,
    DiskGeom,
    SphereGeom,
    IntegratorConfig,
    launch,
    trajectory,
    final_direction,
    integrate_adaptive,
    null_init,
    hamiltonian,
    states,
)
from blackhole_geodesic_calculator_tpu.ops.states import init_state

M = 0.5
RS = 2 * M


def make_env(**kw):
    base = dict(mass=M, r_capture=RS, r_escape=100.0, lam_max=500.0)
    base.update(kw)
    return GeodesicEnv(**{k: jnp.asarray(v) if isinstance(v, float) else v
                          for k, v in base.items()})


def unit(v):
    v = jnp.asarray(v, jnp.float32)
    return v / jnp.linalg.norm(v)


CFG = IntegratorConfig(n_steps=4000, dt=0.02, dt_boost=16.0)


def test_flat_rays_are_straight():
    env = make_env(mass=0.0, r_capture=-1.0)
    x0 = jnp.asarray([[-50.0, 3.0, 2.0]])
    d0 = unit([1.0, 0.0, 0.0])[None]
    s = launch(env, x0, d0, CFG)
    assert int(s.status[0]) == states.ESCAPED
    # exits along +x at unchanged (y, z)
    d_end = final_direction(env, s)
    np.testing.assert_allclose(np.asarray(d_end[0]), [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.x[0, 1:]), [3.0, 2.0], atol=1e-3)


def test_conservation_along_orbit():
    """Null condition Hh ~ 0 and angular momentum L_z = x p_y - y p_x conserved."""
    env = make_env(r_escape=1e9, lam_max=200.0)
    x0 = jnp.asarray([[10.0, 0.0, 0.0]])
    d0 = unit([0.0, 1.0, 0.0])[None]  # tangential launch in the z=0 plane
    cfg = dataclasses.replace(CFG, n_steps=2000, dt=0.05, dt_boost=1.0)
    xs, ps, s = trajectory(env, x0, d0, cfg)
    p0, E0 = null_init(x0, d0, M, None)
    lz0 = x0[0, 0] * p0[0, 1] - x0[0, 1] * p0[0, 0]
    lz = xs[:, 0, 0] * ps[:, 0, 1] - xs[:, 0, 1] * ps[:, 0, 0]
    np.testing.assert_allclose(np.asarray(lz), float(lz0), rtol=1e-4)
    h = hamiltonian(s.x, s.p, s.E, M, None)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-4)


def test_weak_field_deflection():
    """Deflection vs impact parameter (Fig 5 behavior, README.md:68-71).

    Oracle: the PPN bending series alpha(u) = 4u + (15pi/4) u^2 + (128/3) u^3
    + (3465pi/64) u^4, u = M/b (Keeton & Petters 2005) -- accurate to ~0.1%
    for b >= 20 M.  The integrator reproduces it to well under 1%.
    """
    for b in (10.0, 20.0, 40.0):
        env = make_env(r_escape=4000.0, lam_max=10000.0)
        x0 = jnp.asarray([[-2000.0, b, 0.0]])
        d0 = jnp.asarray([[1.0, 0.0, 0.0]])
        cfg = IntegratorConfig(n_steps=20000, dt=0.02, dt_boost=512.0,
                               mode="while")
        s = launch(env, x0, d0, cfg)
        assert int(s.status[0]) == states.ESCAPED, int(s.status[0])
        d_end = np.asarray(final_direction(env, s)[0])
        alpha = np.arctan2(-d_end[1], d_end[0])
        u = M / b
        expect = (4 * u + 15 * np.pi / 4 * u**2 + 128 / 3 * u**3
                  + 3465 * np.pi / 64 * u**4)
        np.testing.assert_allclose(alpha, expect, rtol=0.01)


def test_photon_sphere_capture_boundary():
    """Critical impact parameter b_c = 3 sqrt(3) M ~= 2.598 (M=0.5):
    b < b_c captured, b > b_c escapes (Fig 6 turnaround/capture regimes)."""
    b_c = 3 * np.sqrt(3) * M
    env = make_env(r_escape=200.0, lam_max=2000.0)
    bs = jnp.asarray([0.5 * b_c, 0.93 * b_c, 1.07 * b_c, 2.0 * b_c])
    x0 = jnp.stack([jnp.full_like(bs, -100.0), bs, jnp.zeros_like(bs)], -1)
    d0 = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    cfg = IntegratorConfig(n_steps=40000, dt=0.01, dt_boost=64.0, mode="while")
    s = launch(env, x0, d0, cfg)
    st = np.asarray(s.status)
    assert st[0] == states.CAPTURED
    assert st[1] == states.CAPTURED
    assert st[2] == states.ESCAPED
    assert st[3] == states.ESCAPED


def test_capture_and_inside_horizon():
    env = make_env()
    x0 = jnp.asarray([[10.0, 0.0, 0.0], [0.3, 0.0, 0.0]])
    d0 = jnp.asarray([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    s = launch(env, x0, d0, CFG)
    assert int(s.status[0]) == states.CAPTURED
    assert int(s.status[1]) == states.INSIDE_HORIZON


def test_budget_termination():
    env = make_env(lam_max=5.0, r_escape=1e9)
    x0 = jnp.asarray([[10.0, 0.0, 0.0]])
    d0 = unit([0.0, 1.0, 0.0])[None]
    s = launch(env, x0, d0, dataclasses.replace(CFG, dt_boost=1.0))
    assert int(s.status[0]) == states.BUDGET
    np.testing.assert_allclose(float(s.lam[0]), 5.0, atol=0.2)


def test_disk_event_flat():
    """Straight ray through the z=0 annulus: analytic crossing point.
    Geometry of reference checkHitDisk (LimitedRelativisticRenderEngine.py:416-424)."""
    env = make_env(mass=0.0, r_capture=-1.0,
                   disk=DiskGeom(r_in=jnp.asarray(2.0), r_out=jnp.asarray(6.0)))
    # from above, heading down, crossing z=0 at (3, 1): R = sqrt(10) in annulus
    x0 = jnp.asarray([[3.0, 1.0, 5.0], [20.0, 20.0, 5.0]])
    d0 = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    s = launch(env, x0, d0, dataclasses.replace(CFG, dt_boost=1.0, dt=0.05))
    assert int(s.status[0]) == states.DISK
    np.testing.assert_allclose(np.asarray(s.x[0]), [3.0, 1.0, 0.0],
                               atol=1e-4)
    # second ray crosses at R = 28.3 -> outside annulus, never hits
    assert int(s.status[1]) != states.DISK


def test_sphere_event_flat():
    env = make_env(
        mass=0.0, r_capture=-1.0,
        spheres=SphereGeom(center=jnp.asarray([[10.0, 0.0, 0.0],
                                               [0.0, 30.0, 0.0]]),
                           radius=jnp.asarray([2.0, 1.0])),
    )
    x0 = jnp.asarray([[-5.0, 0.0, 0.0], [0.0, -5.0, 0.0]])
    d0 = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    s = launch(env, x0, d0, dataclasses.replace(CFG, dt_boost=1.0, dt=0.05))
    st = np.asarray(s.status)
    assert st[0] == states.OBJECT and st[1] == states.OBJECT
    np.testing.assert_allclose(np.asarray(s.x[0]), [8.0, 0.0, 0.0],
                               atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(s.hit_normal(env.spheres.center)[0]), [-1.0, 0.0, 0.0],
        atol=1e-4)
    assert int(s.hit_obj[0]) == 0 and int(s.hit_obj[1]) == 1
    np.testing.assert_allclose(np.asarray(s.x[1]), [0.0, 29.0, 0.0],
                               atol=1e-3)


def test_hamiltonian_vs_christoffel_formulations():
    """The KS Hamiltonian path must match 4D Christoffel integration in the
    reference's own chart (AD Christoffels) -- same spatial trajectory."""
    metric = schwarzschild_cartesian_metric(M)
    x0 = jnp.asarray([-20.0, 4.0, 1.0])
    d0 = unit([1.0, 0.05, -0.02])

    # 4D Christoffel RK4 (the reference's 8-ODE formulation, README.md:198-209)
    x4 = jnp.concatenate([jnp.zeros(1), x0])
    k_t = metric.null_k_t(x4, d0)
    k4 = jnp.concatenate([k_t[None], d0])

    def rhs(state):
        x4, k4 = state
        return jnp.stack(metric.geodesic_rhs(x4, k4))

    def rk4(state, dt):
        k1 = rhs(state)
        k2 = rhs(state + 0.5 * dt * k1)
        k3 = rhs(state + 0.5 * dt * k2)
        k4_ = rhs(state + dt * k3)
        return state + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4_)

    n, dt = 3000, 0.01

    def body(s, _):
        s = rk4(s, dt)
        return s, s[0, 1:]

    _, xs_chr = jax.lax.scan(body, jnp.stack([x4, k4]), None, length=n)

    env = make_env(r_escape=1e9, lam_max=1e9)
    cfg = IntegratorConfig(n_steps=n, dt=dt, dt_boost=1.0)
    xs_ham, _, _ = trajectory(env, x0[None], d0[None], cfg)

    np.testing.assert_allclose(
        np.asarray(xs_ham[-1, 0]), np.asarray(xs_chr[-1]), atol=5e-3
    )


def test_adaptive_matches_fixed_deflection():
    b = 6.0
    env = make_env(r_escape=500.0, lam_max=5000.0)
    x0 = jnp.asarray([[-200.0, b, 0.0]])
    d0 = jnp.asarray([[1.0, 0.0, 0.0]])
    s_fix = launch(env, x0, d0,
                   IntegratorConfig(n_steps=40000, dt=0.01, dt_boost=64.0,
                                    mode="while"))
    p0, E0 = null_init(x0, d0, M, None)
    s0 = init_state(x0, p0, E0)
    cfg_a = IntegratorConfig(n_steps=6000, dt=0.05, method="dopri",
                             rtol=1e-6, atol=1e-9, max_step=20.0)
    s_ad, nacc = integrate_adaptive(env, s0, cfg_a)
    assert int(s_ad.status[0]) == states.ESCAPED
    d_f = np.asarray(final_direction(env, s_fix)[0])
    d_a = np.asarray(final_direction(env, s_ad)[0])
    np.testing.assert_allclose(d_a, d_f, atol=2e-3)
    # adaptive should be dramatically cheaper than the fixed grid
    assert int(nacc[0]) < 4000


def test_adaptive_scan_matches_while_loop():
    """The differentiable scan form of Dormand-Prince must reproduce the
    while-loop path's discrete trajectory exactly: same controller, same
    accept/reject decisions, same final states and statuses."""
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        integrate_adaptive, integrate_adaptive_scan,
    )

    n = 13
    b = np.linspace(1.8, 8.0, n)
    x0 = jnp.asarray(np.stack([b, np.zeros(n), np.full(n, 20.0)], -1),
                     jnp.float32)
    d0 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    env = GeodesicEnv(mass=jnp.float32(0.5), r_capture=jnp.float32(1.0),
                      r_escape=jnp.float32(45.0), lam_max=jnp.float32(80.0))
    cfg = IntegratorConfig(n_steps=400, dt=0.1, method="dopri",
                           rtol=1e-5, atol=1e-8, max_step=2.0)
    p0, E0 = null_init(x0, d0, env.mass)
    s0 = states.init_state(x0, p0, E0)

    s_while, nacc = integrate_adaptive(env, s0, cfg)
    s_scan = integrate_adaptive_scan(env, s0, cfg)
    assert int(nacc.max()) < cfg.n_steps  # budget was not the terminator
    np.testing.assert_array_equal(np.asarray(s_while.status),
                                  np.asarray(s_scan.status))
    np.testing.assert_allclose(np.asarray(s_while.x), np.asarray(s_scan.x),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_while.p), np.asarray(s_scan.p),
                               rtol=0, atol=1e-6)


def test_adaptive_scan_gradient_matches_fd():
    """jax.grad through the adaptive integrator (exact discrete adjoint of
    the accept/reject scheme) vs central finite differences on the mass."""
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        integrate_adaptive_scan,
    )

    n = 5
    b = np.linspace(3.2, 6.0, n)  # escapers, away from the critical band
    x0 = jnp.asarray(np.stack([b, np.zeros(n), np.full(n, 15.0)], -1),
                     jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    d0 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    cfg = IntegratorConfig(n_steps=300, dt=0.1, method="dopri",
                           rtol=1e-6, atol=1e-9, max_step=1.0)

    def loss(m):
        env = GeodesicEnv(mass=m, r_capture=jnp.float32(1.0),
                          r_escape=jnp.float32(35.0),
                          lam_max=jnp.float32(80.0))
        p0, E0 = null_init(x0, d0, m)
        s0 = states.init_state(x0, p0, E0)
        s = integrate_adaptive_scan(env, s0, cfg)
        return jnp.sum(s.p ** 2)

    g = float(jax.grad(loss)(jnp.float32(0.5)))
    eps = 1e-3
    fd = float((loss(jnp.float32(0.5 + eps)) - loss(jnp.float32(0.5 - eps)))
               / (2 * eps))
    # Loose-ish bound: the FD stencil crosses accept/reject controller
    # decisions (the adaptive scheme's output is only piecewise-smooth in
    # m; at rtol=1e-6 the kinks are tiny but visible) and f32 FD itself
    # carries a few-percent noise floor at this eps.
    assert abs(g - fd) < 8e-2 * max(1.0, abs(fd)), (g, fd)
