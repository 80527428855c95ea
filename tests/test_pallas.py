"""Pallas-kernel parity and adjoint tests (interpret mode on CPU).

The fused Pallas integrator (ops/pallas_kernel.py) must agree with the XLA
scan path (ops/integrate.py) -- forward states bitwise-close and gradients
matching the scan path's autodiff, since the scan path is the reference
implementation whose own gradients are FD-validated in test_grad.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_geodesic_calculator_tpu.ops import (
    DiskGeom,
    GeodesicEnv,
    IntegratorConfig,
    SphereGeom,
    launch,
    states,
)
from blackhole_geodesic_calculator_tpu.ops.geodesic import null_init
from blackhole_geodesic_calculator_tpu.ops.integrate import integrate_fixed
from blackhole_geodesic_calculator_tpu.ops.pallas_kernel import integrate_pallas

CFG = IntegratorConfig(n_steps=64, dt=0.1)


def rays(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    x0 = np.stack([rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
                   np.full(n, 25.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
                  np.full(n, -1.0)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(x0), jnp.asarray(d, jnp.float32)


def make_env(mass, center=(2.0, 0.0, 10.0), radius=3.0):
    return GeodesicEnv(
        mass=mass, r_capture=2.0 * mass,
        r_escape=jnp.asarray(60.0), lam_max=jnp.asarray(50.0),
        disk=DiskGeom(r_in=jnp.asarray(2.0), r_out=jnp.asarray(6.0)),
        spheres=SphereGeom(center=jnp.asarray([center]),
                           radius=jnp.asarray([radius])),
    )


def pallas_launch(env, x0, d0, cfg):
    p0, E0 = null_init(x0, d0, env.mass, None)
    s0 = states.init_state(x0, p0, E0)
    return integrate_pallas(env, s0, cfg, interpret=True)


def test_forward_parity():
    """Statuses identical, states f32-close, padding handled (N=1500)."""
    env = make_env(jnp.asarray(0.5))
    x0, d0 = rays()
    s_ref = launch(env, x0, d0, CFG)
    s_pal = pallas_launch(env, x0, d0, CFG)
    np.testing.assert_array_equal(np.asarray(s_ref.status),
                                  np.asarray(s_pal.status))
    np.testing.assert_array_equal(np.asarray(s_ref.hit_obj),
                                  np.asarray(s_pal.hit_obj))
    np.testing.assert_allclose(np.asarray(s_ref.x), np.asarray(s_pal.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_ref.p), np.asarray(s_pal.p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_ref.lam), np.asarray(s_pal.lam),
                               atol=1e-4)


def test_adjoint_matches_scan_autodiff():
    """The checkpointed-adjoint backward kernel reproduces the scan path's
    gradients w.r.t. mass, sphere center, ray origins and directions."""
    x0, d0 = rays(1024, seed=1)
    rng = np.random.default_rng(2)
    wx = jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32)

    def loss(mass, cz, x0_, d0_, *, pallas):
        env = make_env(mass, center=(2.0, 0.0, cz))
        p0, E0 = null_init(x0_, d0_, env.mass, None)
        s0 = states.init_state(x0_, p0, E0)
        if pallas:
            s = integrate_pallas(env, s0, CFG, interpret=True)
        else:
            s = integrate_fixed(env, s0, CFG)
        ok = ((s.status != states.CAPTURED)
              & (s.status != states.ERROR))[..., None]
        return jnp.sum(jnp.where(ok, wx * s.x, 0.0))

    args = (jnp.asarray(0.5), jnp.asarray(10.0), x0, d0)
    g_ref = jax.grad(lambda *a: loss(*a, pallas=False), argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(lambda *a: loss(*a, pallas=True), argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=1e-4,
                                   atol=1e-5 * max(np.abs(a).max(), 1.0))


def test_no_nan_gradients_with_all_event_types():
    """Rays spanning capture/escape/disk/sphere/budget must yield finite
    gradients (regression for the 0*inf NaN-jacobian traps)."""
    x0, d0 = rays(512, seed=3)

    def loss(mass):
        env = make_env(mass)
        p0, E0 = null_init(x0, d0, mass, None)
        s0 = states.init_state(x0, p0, E0)
        s = integrate_fixed(env, s0, CFG)
        ok = ((s.status != states.CAPTURED)
              & (s.status != states.ERROR))[..., None]
        return jnp.sum(jnp.where(ok, s.x**2, 0.0))

    g = jax.grad(loss)(jnp.asarray(0.5))
    assert np.isfinite(float(g))


def test_kerr_forward_parity_and_adjoint():
    """Kerr (a != 0) goes through the same kernels with the hand-derived
    analytic Kerr-Schild RHS (pallas_kernel._rhs_kerr_soa, the SoA twin of
    native/src/geodesic.cpp); forward states and (mass, spin) gradients
    must match the XLA path.  Regression for two found bugs: the backward tape
    recompute silently using the Schwarzschild RHS, and kernels rounding the
    trip count up to a segment multiple (over-integrating)."""
    from blackhole_geodesic_calculator_tpu.models.kerr import horizon_radius

    x0, d0 = rays(1024, seed=5)
    rng = np.random.default_rng(6)
    wx = jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32)
    m, a = jnp.asarray(0.5), jnp.asarray(0.45)
    cfg = dataclasses.replace(CFG, n_steps=50)  # NOT a segment multiple

    def loss(mm, aa, pallas):
        env = GeodesicEnv(
            mass=mm, spin=aa, r_capture=horizon_radius(mm, aa),
            r_escape=jnp.asarray(60.0), lam_max=jnp.asarray(50.0),
            disk=DiskGeom(r_in=jnp.asarray(2.0), r_out=jnp.asarray(6.0)))
        p0, E0 = null_init(x0, d0, mm, aa)
        s0 = states.init_state(x0, p0, E0)
        s = (integrate_pallas(env, s0, cfg, interpret=True) if pallas
             else integrate_fixed(env, s0, cfg))
        ok = ((s.status != states.CAPTURED)
              & (s.status != states.ERROR))[..., None]
        return jnp.sum(jnp.where(ok, wx * s.x, 0.0))

    g_ref = jax.grad(lambda *a_: loss(*a_, pallas=False), argnums=(0, 1))(m, a)
    g_pal = jax.grad(lambda *a_: loss(*a_, pallas=True), argnums=(0, 1))(m, a)
    for r, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), rtol=2e-4)


def test_dopri_kernel_parity():
    """The in-kernel adaptive Dormand-Prince forward (integrate_pallas_dopri)
    must reproduce the XLA while-loop adaptive path trip for trip: same
    tableau, same 0.2-power controller, same event handling -- statuses
    identical and final states f32-close, for the event-free Schwarzschild
    config, the full event machinery (disk + sphere), and Kerr."""
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        integrate_adaptive,
    )
    from blackhole_geodesic_calculator_tpu.ops.pallas_kernel import (
        integrate_pallas_dopri,
    )

    cfg = IntegratorConfig(n_steps=400, dt=0.05, method="dopri",
                           mode="while", rtol=1e-5, atol=1e-8, max_step=4.0)
    x0, d0 = rays(900, seed=11)

    for name, env in (
        ("schw", GeodesicEnv(mass=jnp.asarray(0.5), r_capture=1.0,
                             r_escape=jnp.asarray(60.0),
                             lam_max=jnp.asarray(70.0))),
        ("events", make_env(jnp.asarray(0.5))),
        ("kerr", GeodesicEnv(mass=jnp.asarray(0.5), r_capture=0.95,
                             r_escape=jnp.asarray(60.0),
                             lam_max=jnp.asarray(70.0),
                             spin=jnp.asarray(0.45))),
    ):
        p0, E0 = null_init(x0, d0, env.mass, env.spin)
        s0 = states.init_state(x0, p0, E0)
        ref, _ = integrate_adaptive(env, s0, cfg)
        out = integrate_pallas_dopri(env, s0, cfg, interpret=True)
        st_r = np.asarray(ref.status)
        st_p = np.asarray(out.status)
        agree = (st_r == st_p).mean()
        assert agree >= 0.998, f"{name}: status agreement {agree:.4f}"
        m = st_r == st_p
        # An f32 rounding flip of ONE accept/reject near a termination
        # boundary moves the stored endpoint by up to one step along the
        # SAME trajectory (h <= max_step) -- so the trip-for-trip
        # invariants are: affine length within one step, and the final
        # unit DIRECTION (what shading consumes) tightly matched.
        from blackhole_geodesic_calculator_tpu.ops.integrate import (
            final_direction,
        )

        dlam = np.abs(np.asarray(ref.lam) - np.asarray(out.lam))[m].max()
        assert dlam <= cfg.max_step + 1e-3, f"{name}: max|dlam| {dlam:.3e}"
        dr = np.asarray(final_direction(env, ref))
        dp = np.asarray(final_direction(env, out))
        ang = np.arccos(np.clip((dr * dp).sum(-1), -1.0, 1.0))[m].max()
        assert ang < 2e-3, f"{name}: max dir err {ang:.3e} rad"
        if name == "events":
            assert (st_p == states.DISK).any()
            assert (st_p == states.OBJECT).any()
            # event rays freeze AT the interpolated event point: DISK rays
            # must sit on z = 0 inside the annulus in BOTH paths
            dd = st_p == states.DISK
            zd = np.abs(np.asarray(out.x)[dd, 2])
            rd = np.linalg.norm(np.asarray(out.x)[dd, :2], axis=-1)
            assert zd.max() < 1e-3
            assert (rd > 1.9).all() and (rd < 6.1).all()


def test_dopri_grad_kernel_adjoint():
    """The differentiable in-kernel adaptive path (integrate_pallas_dopri
    grad=True: checkpointed discrete adjoint THROUGH the per-ray step
    controller) must match jax.grad of integrate_adaptive_scan -- the XLA
    reference whose own gradients are the discretize-then-optimize adjoint
    of the same scheme.

    The fan stays in the weak field (b in [6.5, 12]) so accept/reject
    decisions agree; the loss reads boundary-insensitive observables
    (escape DIRECTIONS, frozen event points) because the stored endpoint of
    an escaped ray may differ by one accepted step at the escape boundary
    between two correct implementations.  Residual tolerance covers
    controller-chain f32 divergence (h sequences drift a few ulps per
    trip), not structure: a missing h-chain or controller term shows up at
    O(1)."""
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        final_direction, integrate_adaptive_scan,
    )
    from blackhole_geodesic_calculator_tpu.ops.pallas_kernel import (
        integrate_pallas_dopri,
    )

    cfg = IntegratorConfig(n_steps=96, dt=0.05, method="dopri",
                           mode="scan", rtol=1e-5, atol=1e-8, max_step=4.0)
    n = 640
    rng = np.random.default_rng(3)
    b = rng.uniform(6.5, 12.0, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    x0 = jnp.asarray(np.stack([b * np.cos(ang), b * np.sin(ang),
                               np.full(n, 25.0)], -1), jnp.float32)
    d0 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    wx = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    def loss(m, x0_, pallas):
        env = GeodesicEnv(
            mass=m, r_capture=1.0, r_escape=jnp.asarray(60.0),
            lam_max=jnp.asarray(70.0),
            disk=DiskGeom(r_in=jnp.asarray(5.0), r_out=jnp.asarray(9.0)),
            spheres=SphereGeom(center=jnp.asarray([[6.5, 0.0, 10.0]]),
                               radius=jnp.asarray([1.5])))
        p0, E0 = null_init(x0_, d0, m, None)
        s0 = states.init_state(x0_, p0, E0)
        s = (integrate_pallas_dopri(env, s0, cfg, interpret=True,
                                    grad=True)
             if pallas else integrate_adaptive_scan(env, s0, cfg))
        d1 = final_direction(env, s)
        esc = (s.status == states.ESCAPED)[..., None]
        ev = ((s.status == states.DISK)
              | (s.status == states.OBJECT))[..., None]
        return (jnp.sum(jnp.where(esc, wx * d1, 0.0)
                        + jnp.where(ev, wx * s.x, 0.0)), s.status)

    m = jnp.asarray(0.5)
    (v_r, st_r), g_r = jax.value_and_grad(
        lambda m_, x_: loss(m_, x_, False), argnums=(0, 1),
        has_aux=True)(m, x0)
    (v_p, st_p), g_p = jax.value_and_grad(
        lambda m_, x_: loss(m_, x_, True), argnums=(0, 1),
        has_aux=True)(m, x0)
    st_r, st_p = np.asarray(st_r), np.asarray(st_p)
    assert (st_r == st_p).mean() >= 0.998
    # both event types actually exercised
    assert (st_p == states.DISK).any() and (st_p == states.OBJECT).any()
    assert abs(float(v_p - v_r)) / max(abs(float(v_r)), 1e-9) < 1e-3
    rel_m = abs(float(g_p[0] - g_r[0])) / max(abs(float(g_r[0])), 1e-12)
    assert rel_m < 5e-2, f"mass grad rel err {rel_m:.3e}"
    gx_r, gx_p = np.asarray(g_r[1]), np.asarray(g_p[1])
    rel_x = np.abs(gx_p - gx_r).max() / max(np.abs(gx_r).max(), 1e-12)
    assert rel_x < 5e-2, f"x0 grad max rel err {rel_x:.3e}"


def test_dopri_grad_primal_matches_forward():
    """integrate_pallas_dopri(grad=True)'s primal (the custom_vjp fast
    forward) is the SAME kernel as grad=False -- outputs bitwise equal
    (tile width differs, which must not change per-ray arithmetic)."""
    from blackhole_geodesic_calculator_tpu.ops.pallas_kernel import (
        integrate_pallas_dopri,
    )

    cfg = IntegratorConfig(n_steps=120, dt=0.05, method="dopri",
                           mode="while", rtol=1e-5, atol=1e-8, max_step=4.0)
    x0, d0 = rays(700, seed=13)
    env = make_env(jnp.asarray(0.5))
    p0, E0 = null_init(x0, d0, env.mass, None)
    s0 = states.init_state(x0, p0, E0)
    a = integrate_pallas_dopri(env, s0, cfg, interpret=True)
    bb = integrate_pallas_dopri(env, s0, cfg, interpret=True, grad=True)
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(bb.status))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(bb.x))
    np.testing.assert_array_equal(np.asarray(a.lam), np.asarray(bb.lam))


def test_dopri_grad_kernel_adjoint_kerr():
    """The dopri kernel adjoint's Kerr path: (mass, spin) gradients through
    the in-kernel adaptive controller match jax.grad of
    integrate_adaptive_scan with the same Kerr env (weak-field fan,
    direction observables -- see test_dopri_grad_kernel_adjoint)."""
    from blackhole_geodesic_calculator_tpu.models.kerr import horizon_radius
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        final_direction, integrate_adaptive_scan,
    )
    from blackhole_geodesic_calculator_tpu.ops.pallas_kernel import (
        integrate_pallas_dopri,
    )

    cfg = IntegratorConfig(n_steps=80, dt=0.05, method="dopri",
                           mode="scan", rtol=1e-5, atol=1e-8, max_step=4.0)
    n = 512
    rng = np.random.default_rng(7)
    b = rng.uniform(6.5, 12.0, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    x0 = jnp.asarray(np.stack([b * np.cos(ang), b * np.sin(ang),
                               np.full(n, 25.0)], -1), jnp.float32)
    d0 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    wx = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    def loss(m, a, pallas):
        env = GeodesicEnv(mass=m, spin=a, r_capture=horizon_radius(m, a),
                          r_escape=jnp.asarray(60.0),
                          lam_max=jnp.asarray(70.0))
        p0, E0 = null_init(x0, d0, m, a)
        s0 = states.init_state(x0, p0, E0)
        s = (integrate_pallas_dopri(env, s0, cfg, interpret=True,
                                    grad=True)
             if pallas else integrate_adaptive_scan(env, s0, cfg))
        d1 = final_direction(env, s)
        esc = (s.status == states.ESCAPED)[..., None]
        return jnp.sum(jnp.where(esc, wx * d1, 0.0))

    m, a = jnp.asarray(0.5), jnp.asarray(0.45)
    g_r = jax.grad(lambda *z: loss(*z, pallas=False), argnums=(0, 1))(m, a)
    g_p = jax.grad(lambda *z: loss(*z, pallas=True), argnums=(0, 1))(m, a)
    for name, r, p in zip(("mass", "spin"), g_r, g_p):
        rel = abs(float(p - r)) / max(abs(float(r)), 1e-12)
        assert rel < 5e-2, f"{name} grad rel err {rel:.3e}"


def test_forward_parity_guard_stress():
    """Sphere-guard stress: spheres placed where the conservative
    radius-shell test is tightest -- deep in the strong field (photon-
    sphere radii, where step segments are short) and far out (where the
    r^1.5 schedule makes L large) -- plus a Kerr case exercising the
    |a|-widened band.  Statuses/hit ids must match the XLA path exactly
    (a mis-culled sphere test would flip OBJECT statuses)."""
    x0, d0 = rays(n=1200, seed=7)
    for spin, centers, radii in (
            (None, [[0.0, 2.6, 0.0], [0.0, 0.0, 30.0]], [0.7, 2.0]),
            (0.45, [[2.0, 0.0, 0.3], [-6.0, 6.0, 0.0]], [0.8, 1.0]),
    ):
        env = GeodesicEnv(
            mass=jnp.asarray(0.5), r_capture=jnp.asarray(1.0),
            r_escape=jnp.asarray(60.0), lam_max=jnp.asarray(60.0),
            spin=None if spin is None else jnp.asarray(spin),
            spheres=SphereGeom(center=jnp.asarray(centers),
                               radius=jnp.asarray(radii)))
        cfg = dataclasses.replace(CFG, dt_boost=64.0, dt_power=1.5,
                                  dt_boost_r_ref=1.7)
        s_ref = launch(env, x0, d0, cfg)
        p0, E0 = null_init(x0, d0, env.mass, env.spin)
        s0 = states.init_state(x0, p0, E0)
        s_pal = integrate_pallas(env, s0, cfg, interpret=True)
        np.testing.assert_array_equal(np.asarray(s_ref.status),
                                      np.asarray(s_pal.status))
        np.testing.assert_array_equal(np.asarray(s_ref.hit_obj),
                                      np.asarray(s_pal.hit_obj))
        assert int(np.sum(np.asarray(s_ref.status) == states.OBJECT)) >= 2
