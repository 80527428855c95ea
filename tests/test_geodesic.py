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
