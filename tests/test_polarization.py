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


# =============================================================================
# Map-level: sharding parity, size guard, golden regression.
# =============================================================================
def _map_scene_cam():
    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

    return (Scene(bh=BlackHole.make(mass=0.5)),
            Camera.make(position=(0.0, 0.0, 20.0), fov=(0.7, 0.7)))


def test_polarization_map_sharded_matches_single():
    """The ray-sharded map is pixel-exact vs the single-device map
    (deterministic pixel-center rays), NaN mask included -- for both the
    Schwarzschild closed form and the Kerr transport-ODE path."""
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.parallel import (
        make_mesh, polarization_map_sharded,
    )
    from blackhole_geodesic_calculator_tpu.render import (
        RenderConfig, polarization_map,
    )
    from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

    scene, cam = _map_scene_cam()
    cfg = RenderConfig(width=24, height=16,
                       integrator=IntegratorConfig(n_steps=200, dt=0.1,
                                                   backend="scan"),
                       lam_max=80.0)
    m1 = np.asarray(polarization_map(scene, cam, cfg))
    m2 = np.asarray(polarization_map_sharded(scene, cam, cfg, make_mesh()))
    np.testing.assert_array_equal(np.isnan(m1), np.isnan(m2))
    np.testing.assert_allclose(np.nan_to_num(m1), np.nan_to_num(m2),
                               atol=1e-5)

    kerr = Scene(bh=scene.bh.__class__.make(mass=0.5, spin=0.3))
    cfg_k = RenderConfig(width=8, height=8,
                         integrator=IntegratorConfig(
                             n_steps=300, dt=0.1, dt_boost=16.0,
                             dt_boost_r_ref=1.6, backend="scan"),
                         lam_max=80.0, r_escape=70.0)
    k1 = np.asarray(polarization_map(kerr, cam, cfg_k))
    k2 = np.asarray(polarization_map_sharded(kerr, cam, cfg_k, make_mesh()))
    np.testing.assert_array_equal(np.isnan(k1), np.isnan(k2))
    np.testing.assert_allclose(np.nan_to_num(k1), np.nan_to_num(k2),
                               atol=1e-5)


def test_polarization_kerr_size_guard(monkeypatch):
    """A large unsharded Kerr map warns and points at the sharded entry."""
    import warnings

    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import (
        RenderConfig, polarization_map,
    )
    from blackhole_geodesic_calculator_tpu.render import renderer
    from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

    from blackhole_geodesic_calculator_tpu.camera import Camera

    monkeypatch.setattr(renderer, "_KERR_POLARIZATION_WARN_PIXELS", 32)
    kerr = Scene(bh=BlackHole.make(mass=0.5, spin=0.3))
    cam = Camera.make(position=(0.0, 0.0, 20.0), fov=(0.7, 0.7))
    cfg = RenderConfig(width=8, height=8,
                       integrator=IntegratorConfig(n_steps=60, dt=0.2,
                                                   backend="scan"),
                       lam_max=60.0, r_escape=70.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        polarization_map(kerr, cam, cfg)
    assert any("polarization_map_sharded" in str(x.message) for x in w)
    # Schwarzschild path never warns (closed form, render-path cost)
    schw = Scene(bh=BlackHole.make(mass=0.5))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        polarization_map(schw, cam, cfg)
    assert not any("polarization" in str(x.message) for x in w)


def test_polarization_map_golden():
    """Golden regression for the Schwarzschild polarization map (f16 npz,
    NaN-aware): pins the closed-form map of a 48x32 camera."""
    import os

    import pytest

    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import (
        RenderConfig, polarization_map,
    )

    scene, cam = _map_scene_cam()
    cfg = RenderConfig(width=48, height=32,
                       integrator=IntegratorConfig(n_steps=300, dt=0.1,
                                                   dt_boost=16.0,
                                                   dt_boost_r_ref=1.6,
                                                   dt_power=1.5,
                                                   backend="scan"),
                       lam_max=80.0)
    m = np.asarray(polarization_map(scene, cam, cfg)).astype(np.float16)
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    path = os.path.join(golden_dir, "polarization_schw_48x32.npz")
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(path):
        os.makedirs(golden_dir, exist_ok=True)
        np.savez_compressed(path, m=m)
        pytest.skip(f"golden regenerated: {path}")
    with np.load(path) as z:
        ref = z["m"].astype(np.float32)
    cur = m.astype(np.float32)
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(cur))
    diff = np.abs(np.nan_to_num(cur) - np.nan_to_num(ref))
    assert diff.mean() < 2e-3, diff.mean()
    assert (diff > 0.05).mean() < 0.01
