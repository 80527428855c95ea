"""General-metric polarization transport (parallel-transport ODE).

Cross-checks the two implementations against each other and against
physics invariants:

* Schwarzschild: the ODE transport must reproduce the closed form
  (no gravitational Faraday rotation) -- a strong mutual check, since the
  two share no code (AD Christoffels vs plane-symmetry argument);
* conservation: f.k = 0 and g(f, f) along the whole path;
* Kerr: frame dragging produces a NONZERO rotation relative to the
  Schwarzschild plane basis for off-equatorial rays -- the physical effect
  the closed form cannot capture -- while a -> 0 reduces to Schwarzschild.
"""

import numpy as np

import jax.numpy as jnp

from blackhole_geodesic_calculator_tpu.models import (
    kerr_ks_metric, schwarzschild_ks_metric,
)
from blackhole_geodesic_calculator_tpu.ops.polarization import (
    plane_normal, transport_polarization, transport_polarization_ode,
)

M = 0.5


def _launch():
    """A photon-sphere-adjacent fan with mixed in/out-of-plane pol."""
    b = np.asarray([3.2, 4.0, 6.0, 9.0])
    n = len(b)
    x3 = jnp.asarray(np.stack([b, np.zeros(n), np.full(n, 25.0)], -1),
                     jnp.float32)
    d3 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    f3 = jnp.asarray(np.tile([0.6, 0.8, 0.0], (n, 1)), jnp.float32)
    f3 = f3 - jnp.sum(f3 * d3, -1, keepdims=True) * d3
    f3 = f3 / jnp.linalg.norm(f3, axis=-1, keepdims=True)
    return x3, d3, f3


def test_ode_matches_schwarzschild_closed_form():
    x3, d3, f3 = _launch()
    metric = schwarzschild_ks_metric(M)
    f_ode, d_out, _, diag = transport_polarization_ode(
        metric, x3, d3, f3, n_steps=900, dt=0.05, r_stop=70.0)
    assert not np.asarray(diag["unfinished"]).any()
    assert np.asarray(diag["fk_drift"]).max() < 1e-4
    assert np.asarray(diag["norm_drift"]).max() < 1e-3
    f_cf = transport_polarization(x3, d3, f3, d_out)
    # same observable up to overall sign (f and -f are the same pol state)
    dots = np.abs(np.sum(np.asarray(f_ode) * np.asarray(f_cf), -1))
    assert dots.min() > 1.0 - 2e-3, dots


def test_flat_metric_identity():
    x3, d3, f3 = _launch()
    metric = schwarzschild_ks_metric(1e-12)
    f_ode, d_out, _, _ = transport_polarization_ode(
        metric, x3, d3, f3, n_steps=300, dt=0.2, r_stop=70.0)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_ode), np.asarray(f3), atol=1e-4)


def test_kerr_faraday_rotation():
    """An off-equatorial Kerr ray picks up polarization rotation relative
    to the orbital-plane basis (gravitational Faraday rotation); a -> 0
    kills it.  Measured as the out-of-plane component drift the
    Schwarzschild argument forbids."""
    x3 = jnp.asarray([[3.0, 0.5, 25.0]], jnp.float32)
    d3 = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    f3 = jnp.asarray([[0.6, 0.8, 0.0]], jnp.float32)
    f3 = f3 / jnp.linalg.norm(f3, axis=-1, keepdims=True)

    def out_of_plane_drift(spin):
        metric = (kerr_ks_metric(M, spin) if spin else
                  schwarzschild_ks_metric(M))
        f_ode, d_out, _, diag = transport_polarization_ode(
            metric, x3, d3, f3, n_steps=1200, dt=0.04, r_stop=70.0)
        assert np.asarray(diag["fk_drift"]).max() < 1e-4
        n = plane_normal(x3, d3)
        a0 = float(jnp.sum(f3 * n, -1)[0])
        a1 = float(jnp.sum(f_ode * n, -1)[0])
        return abs(a1 - a0)

    drift_schw = out_of_plane_drift(0.0)
    drift_kerr = out_of_plane_drift(0.45)
    assert drift_schw < 2e-3, drift_schw          # forbidden by symmetry
    assert drift_kerr > 10 * max(drift_schw, 1e-4), (drift_kerr, drift_schw)
