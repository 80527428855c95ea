"""Hot-path RHS unit tests: Hamiltonian formulation vs autodiff vs null physics."""

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_geodesic_calculator_tpu.ops import (
    null_init,
    xdot,
    schwarzschild_rhs,
    ks_rhs,
    hamiltonian,
)

M = 0.5


def _rays(n=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32)
    # keep everything well outside the horizon
    x = x + jnp.sign(x) * 2.0
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    return x, d


def test_null_init_reproduces_direction():
    """dx/dlambda at lambda=0 must equal the unit camera direction -- the
    reference's initial-condition convention (RelativisticRenderEngine.py:287)."""
    x, d = _rays()
    for a in (None, 0.6):
        p, E = null_init(x, d, M, a)
        v = xdot(x, p, E, M, a)
        np.testing.assert_allclose(np.asarray(v), np.asarray(d), atol=2e-6)


def test_null_condition_holds_at_init():
    x, d = _rays()
    for a in (None, 0.6):
        p, E = null_init(x, d, M, a)
        h = hamiltonian(x, p, E, M, a)
        np.testing.assert_allclose(np.asarray(h), 0.0, atol=2e-6)


def test_hand_derived_rhs_matches_autodiff():
    """schwarzschild_rhs (hand-derived, fused) == ks_rhs (autodiff oracle)."""
    x, d = _rays()
    p, E = null_init(x, d, M, None)
    dx_h, dp_h = schwarzschild_rhs(x, p, E, M)
    dx_a, dp_a = ks_rhs(x, p, E, M, None)
    np.testing.assert_allclose(np.asarray(dx_h), np.asarray(dx_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_h), np.asarray(dp_a), atol=1e-5)


def test_kerr_rhs_reduces_to_schwarzschild():
    x, d = _rays()
    p, E = null_init(x, d, M, 0.0)
    dx_k, dp_k = ks_rhs(x, p, E, M, 0.0)
    dx_s, dp_s = schwarzschild_rhs(x, p, E, M)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dp_s), atol=1e-5)


def test_flat_limit_is_straight():
    x, d = _rays()
    p, E = null_init(x, d, 0.0, None)
    np.testing.assert_allclose(np.asarray(p), np.asarray(d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(E), 1.0, atol=1e-6)
    dx, dp = schwarzschild_rhs(x, p, E, 0.0)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp), 0.0, atol=1e-6)


def test_rhs_is_jit_and_grad_safe():
    x, d = _rays(4)
    p, E = null_init(x, d, M, None)

    def loss(mass):
        dx, dp = schwarzschild_rhs(x, p, E, mass)
        return jnp.sum(dp * dp)

    g = jax.jit(jax.grad(loss))(M)
    assert np.isfinite(float(g))
    # finite-difference check of d(loss)/d(mass)
    eps = 1e-3
    fd = (loss(M + eps) - loss(M - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


def test_ergosphere_forces_corotation():
    """THE frame-dragging statement: inside the Kerr ergosphere (r_+ < r <
    2M on the equator) every future-directed null ray must co-rotate with
    the hole -- d(phi_BL)/dt > 0 -- and some coordinate directions admit no
    null ray at all (null_init's guard returns E = 0 for them); outside
    the static limit both restrictions vanish.

    The KS azimuth is converted to Boyer-Lindquist via the chart twist
    phi_BL = phi_KS - int a/Delta dr (so the check is chart-independent);
    dt/dlambda = (1+q) E + q l.p from the inverse metric row g^{t mu}.
    """
    import jax

    from blackhole_geodesic_calculator_tpu.models.kerr import ks_radius
    from blackhole_geodesic_calculator_tpu.ops.geodesic import (
        ks_fields, null_init, xdot,
    )

    M, a = 0.5, 0.45
    n = 2048

    def dphi_dt(r_bl):
        rho = np.sqrt(r_bl**2 + a**2)
        ang = jax.random.uniform(jax.random.PRNGKey(0), (n,),
                                 minval=0.0, maxval=2.0 * np.pi)
        x = jnp.stack([rho * jnp.cos(ang), rho * jnp.sin(ang),
                       jnp.zeros(n)], -1)
        d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        p, E = null_init(x, d, M, a)
        q, l3, _ = ks_fields(x, M, a)
        v = xdot(x, p, E, M, a)
        dt = (1.0 + q) * E + q * jnp.sum(l3 * p, -1)
        r = ks_radius(x, a)
        dr = (x[:, 0] * v[:, 0] + x[:, 1] * v[:, 1]) / r
        delta = r * r - 2.0 * M * r + a * a
        dphi_bl = ((x[:, 0] * v[:, 1] - x[:, 1] * v[:, 0]) / (rho * rho)
                   - a / delta * dr)
        future = (np.asarray(E) > 1e-6) & (np.asarray(dt) > 1e-6)
        return np.asarray(dphi_bl / dt)[future], future.mean()

    # deep in the ergosphere: strict co-rotation AND forbidden directions
    for r_bl in (0.80, 0.95):
        rate, frac = dphi_dt(r_bl)
        assert rate.min() > 0.0, (r_bl, rate.min())
        assert frac < 0.95, (r_bl, frac)   # some directions unphysical
    # outside the static limit (r > 2M = 1): counter-rotation is allowed
    # and every direction is a valid null direction
    for r_bl in (1.05, 1.5):
        rate, frac = dphi_dt(r_bl)
        assert rate.min() < 0.0, (r_bl, rate.min())
        assert frac == 1.0, (r_bl, frac)
