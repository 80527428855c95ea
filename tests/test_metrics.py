"""Metric-layer unit tests.

The reference's test oracle for this layer was sympy symbolic derivation
(curvedpy SW.g / SW.gam_y, reference README.md:174-186).  Here the oracles are
exact tensor identities that any correct (metric, Christoffel) pair satisfies:
metric compatibility nabla g = 0, symmetry, inverse consistency, and the known
closed-form Schwarzschild components on the x-axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_geodesic_calculator_tpu.models import (
    flat_metric,
    schwarzschild_cartesian_metric,
    schwarzschild_ks_metric,
    kerr_ks_metric,
    ks_radius,
    horizon_radius,
)

M = 0.5  # reference default mass => r_s = 1 (RelativisticRenderEngine.py:506)
X4 = jnp.asarray([0.0, 3.1, -2.2, 1.7])


def metrics():
    return [
        ("flat", flat_metric()),
        ("schwarzschild", schwarzschild_cartesian_metric(M)),
        ("schwarzschild_ks", schwarzschild_ks_metric(M)),
        ("kerr_ks", kerr_ks_metric(M, 0.45)),
    ]


@pytest.mark.parametrize("name,metric", metrics())
def test_metric_symmetric_and_inverse(name, metric):
    g = metric.g(X4)
    np.testing.assert_allclose(g, g.T, atol=1e-6)
    np.testing.assert_allclose(g @ metric.g_inv(X4), jnp.eye(4), atol=1e-5)


@pytest.mark.parametrize("name,metric", metrics())
def test_christoffel_symmetry_and_compatibility(name, metric):
    """Gamma^s_mn = Gamma^s_nm and d_r g_mn = Gamma^s_mr g_sn + Gamma^s_nr g_ms."""
    gamma = metric.christoffel(X4)
    np.testing.assert_allclose(gamma, jnp.swapaxes(gamma, 1, 2), atol=1e-5)

    dg = jax.jacfwd(metric.g)(X4)  # dg[m, n, r] = d_r g_mn
    g = metric.g(X4)
    recon = jnp.einsum("smr,sn->mnr", gamma, g) + jnp.einsum(
        "snr,ms->mnr", gamma, g
    )
    np.testing.assert_allclose(dg, recon, atol=2e-5)


def test_flat_christoffels_vanish():
    gamma = flat_metric().christoffel(X4)
    np.testing.assert_allclose(gamma, jnp.zeros((4, 4, 4)), atol=1e-7)


def test_schwarzschild_on_axis_components():
    """On the +x axis the Cartesian chart must reduce to the README.md:160-172
    spherical line element: g_tt = -f, g_xx = 1/f (radial), g_yy = g_zz = 1."""
    r = 4.0
    x4 = jnp.asarray([0.0, r, 0.0, 0.0])
    f = 1.0 - 2.0 * M / r
    g = schwarzschild_cartesian_metric(M).g(x4)
    np.testing.assert_allclose(g[0, 0], -f, rtol=1e-6)
    np.testing.assert_allclose(g[1, 1], 1.0 / f, rtol=1e-6)
    np.testing.assert_allclose(g[2, 2], 1.0, rtol=1e-6)
    np.testing.assert_allclose(g[3, 3], 1.0, rtol=1e-6)
    np.testing.assert_allclose(g[0, 1:], jnp.zeros(3), atol=1e-7)


def test_kerr_reduces_to_schwarzschild_at_zero_spin():
    g_kerr = kerr_ks_metric(M, 0.0).g(X4)
    g_sw = schwarzschild_ks_metric(M).g(X4)
    np.testing.assert_allclose(g_kerr, g_sw, atol=1e-6)


def test_ks_radius():
    x3 = X4[1:]
    np.testing.assert_allclose(ks_radius(x3, 0.0), jnp.linalg.norm(x3), rtol=1e-6)
    # Known identity: on the spin axis (x=y=0), r = |z| for any a.
    np.testing.assert_allclose(
        ks_radius(jnp.asarray([0.0, 0.0, 2.5]), 0.7), 2.5, rtol=1e-6
    )


def test_horizon_radius():
    np.testing.assert_allclose(horizon_radius(M, 0.0), 2 * M, rtol=1e-6)
    np.testing.assert_allclose(horizon_radius(1.0, 1.0), 1.0, rtol=1e-6)
