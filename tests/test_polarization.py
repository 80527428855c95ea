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


# =============================================================================
# Polarized (Stokes) rendering.
# =============================================================================
def _stokes_scene(pol_frac=0.5):
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.scene import (
        BlackHole, Disk, Scene,
    )

    disk_tex = jnp.broadcast_to(
        jnp.asarray([1.0, 0.6, 0.2], jnp.float32), (8, 32, 3))
    return Scene(bh=BlackHole.make(mass=0.5),
                 disk=Disk.make(r_in=2.0, r_out=6.0, texture=disk_tex,
                                pol_frac=pol_frac))


def _stokes_cfg(w=40, h=32):
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import RenderConfig

    return RenderConfig(width=w, height=h,
                        integrator=IntegratorConfig(
                            n_steps=250, dt=0.12, dt_boost=16.0,
                            dt_boost_r_ref=1.6, dt_power=1.5,
                            backend="scan"),
                        lam_max=80.0)


def test_stokes_bounds_and_masks():
    """Q, U live only on disk pixels, with degree <= pol_frac and the
    polarized intensity bounded by pol_frac * luminance."""
    import dataclasses

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.render import render_stokes

    scene = _stokes_scene(0.5)
    cam = Camera.make(position=(0.0, 10.0, 17.0), euler=(-0.53, 0.0, 0.0),
                      fov=(0.8, 0.8))
    cfg = _stokes_cfg()
    rgb, Q, U = [np.asarray(a) for a in render_stokes(scene, cam, cfg)]
    assert np.isfinite(rgb).all() and np.isfinite(Q).all()
    ip = np.sqrt(Q * Q + U * U)
    lum = rgb.mean(-1)
    assert (ip > 1e-6).any(), "no polarized disk pixels rendered"
    assert (ip <= 0.5 * lum + 1e-5).all()

    # unpolarized disk (pol_frac None) -> Q = U = 0 identically, same rgb
    scene0 = dataclasses.replace(
        scene, disk=dataclasses.replace(scene.disk, pol_frac=None))
    rgb0, Q0, U0 = [np.asarray(a) for a in render_stokes(scene0, cam, cfg)]
    assert np.array_equal(rgb0, rgb)
    assert not Q0.any() and not U0.any()


def test_stokes_roll_covariance():
    """Rotating the camera about its view axis by psi rotates the measured
    EVPA by -psi in image axes: (Q + iU) -> e^{-2 i psi} (Q + iU).  This
    pins the whole transport + projection chain (a sign or basis error
    breaks the factor of 2 or the direction)."""
    import dataclasses

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.render import render_stokes

    scene = _stokes_scene(0.4)
    # camera on +z looking down -z: euler roll = rotation about the view
    # axis exactly (face-on disk has p_eff ~ 0, so tilt the DISK instead by
    # keeping the camera off-axis on +y)
    cam = Camera.make(position=(0.0, 12.0, 15.0), euler=(-0.675, 0.0, 0.0),
                      fov=(0.8, 0.8))
    cfg = _stokes_cfg(36, 36)
    rgb1, Q1, U1 = [np.asarray(a) for a in render_stokes(scene, cam, cfg)]

    psi = 0.37
    # Blender XYZ euler: R' = R @ Rz(psi) rolls about the camera's LOCAL z
    # (the view axis).  Compose by rotating the euler triple's matrix.
    from blackhole_geodesic_calculator_tpu.camera.pinhole import euler_matrix
    import jax.numpy as jnp

    r0 = np.asarray(euler_matrix(cam.euler))
    rz = np.asarray([[np.cos(psi), -np.sin(psi), 0.0],
                     [np.sin(psi), np.cos(psi), 0.0],
                     [0.0, 0.0, 1.0]], np.float32)
    r1 = r0 @ rz
    # recover an XYZ euler triple for r1
    sy = -r1[2, 0]
    cy = np.sqrt(max(0.0, 1.0 - sy * sy))
    ex = np.arctan2(r1[2, 1], r1[2, 2])
    ey = np.arctan2(-r1[2, 0], cy)
    ez = np.arctan2(r1[1, 0], r1[0, 0])
    cam2 = dataclasses.replace(
        cam, euler=jnp.asarray([ex, ey, ez], jnp.float32))
    np.testing.assert_allclose(np.asarray(euler_matrix(cam2.euler)), r1,
                               atol=1e-5)

    rgb2, Q2, U2 = [np.asarray(a) for a in render_stokes(scene, cam2, cfg)]
    # compare per-pixel on pixels polarized in BOTH frames away from the
    # frame edge (the roll moves pixel content; test the central disk body)
    c = np.s_[10:26, 10:26]
    p1 = np.sqrt(Q1 * Q1 + U1 * U1)[c]
    p2 = np.sqrt(Q2 * Q2 + U2 * U2)[c]
    m = (p1 > 1e-4) & (p2 > 1e-4)
    assert m.sum() > 20
    # the roll remaps pixels too; compare ANGLES via the polarized-flux-
    # weighted mean EVPA doubled-angle, which is rotation-equivariant
    a1 = np.angle((Q1[c] + 1j * U1[c])[m].sum())
    a2 = np.angle((Q2[c] + 1j * U2[c])[m].sum())
    d = (a2 - a1 + 2.0 * psi + np.pi) % (2.0 * np.pi) - np.pi
    assert abs(d) < 0.12, f"EVPA rotated by {(a2 - a1)/2:.3f}, want {-psi}"


def test_stokes_angle_matches_ode_transport():
    """For a single disk-crossing ray, the closed-form transported EVPA in
    render_stokes must match integrating the parallel-transport ODE with
    AD Christoffels (shared-code-free cross-check) to sub-degree."""
    import dataclasses

    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.camera.pinhole import (
        euler_matrix, generate_rays, pixel_grid,
    )
    from blackhole_geodesic_calculator_tpu.models import (
        schwarzschild_ks_metric,
    )
    from blackhole_geodesic_calculator_tpu.ops import states
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        final_direction, launch,
    )
    from blackhole_geodesic_calculator_tpu.render import render_stokes
    from blackhole_geodesic_calculator_tpu.render.renderer import scene_env

    scene = _stokes_scene(1.0)
    cam = Camera.make(position=(0.0, 10.0, 17.0), euler=(-0.53, 0.0, 0.0),
                      fov=(0.8, 0.8))
    cfg = _stokes_cfg(24, 20)
    rgb, Q, U = [np.asarray(a) for a in render_stokes(scene, cam, cfg)]
    ip = np.sqrt(Q * Q + U * U)
    iy, ix = np.unravel_index(np.argmax(ip), ip.shape)
    chi_cf = 0.5 * np.arctan2(U[iy, ix], Q[iy, ix])

    # re-run that single ray and transport the emitted E-vector with the
    # general-metric ODE, DISK -> CAMERA (reverse path, same transport)
    env = scene_env(scene, cfg, cam)
    ys, xs = pixel_grid(cfg.width, cfg.height)
    o, d = generate_rays(cam, cfg.width, cfg.height, ys, xs, None)
    o1 = o[iy, ix][None]
    d1 = d[iy, ix][None]
    s = launch(env, o1, d1, cfg.integrator)
    assert int(s.status[0]) == states.DISK
    k_d = np.asarray(final_direction(env, s))[0]
    x_d = np.asarray(s.x)[0]
    f_raw = np.asarray([0.0, 0.0, 1.0]) - k_d * k_d[2]
    f_emit = f_raw / np.linalg.norm(f_raw)

    from blackhole_geodesic_calculator_tpu.ops.polarization import (
        transport_polarization_ode,
    )

    metric = schwarzschild_ks_metric(0.5)
    f_out, d_out, x_out, diag = transport_polarization_ode(
        metric, jnp.asarray(x_d)[None], jnp.asarray(-k_d)[None],
        jnp.asarray(f_emit)[None],
        n_steps=4000, dt=0.01, r_stop=float(np.linalg.norm(o1[0])),
        dt_boost=8.0, r_ref=1.6)
    f_out = np.asarray(f_out)[0]
    d_out = np.asarray(d_out)[0]

    # compare in the TRANSPORT-INVARIANT basis (n = conserved plane normal,
    # e = k x n): the closed form claims the (f.n, f.e) decomposition is
    # carried unchanged along the geodesic; the ODE transport must agree.
    # (Comparing camera-frame EVPAs instead would fold in the ~1e-2 rad
    # endpoint-direction error of RETRACING the f32 geodesic -- the camera
    # projection itself is pinned by test_stokes_roll_covariance.)
    def inv_angle(f, k, n):
        n = n / np.linalg.norm(n)
        e = np.cross(k, n)
        e = e / np.linalg.norm(e)
        return np.arctan2(f @ n, f @ e)

    n_pl = np.cross(x_d, -k_d)
    psi_emit = inv_angle(f_emit, -k_d, n_pl)
    psi_ode = inv_angle(f_out, d_out, n_pl)
    d = (psi_ode - psi_emit + np.pi / 2) % np.pi - np.pi / 2
    # The residual is the EMISSION-FRAME choice, not transport error: the
    # closed form decomposes the emitted E-vector with EUCLIDEAN geometry
    # at the disk point, where the spatial metric differs from Euclidean
    # by 2M/r_em (~0.25 at r_em ~ 4) -- the covariant ODE sees that as an
    # O(M/r_em) angle offset (~0.03 rad here), which does NOT shrink with
    # the ODE step (verified: identical at 4x finer dt).  Both weak-field
    # ends are exact and the camera projection is pinned exactly by
    # test_stokes_roll_covariance; the bound below is M/r_em scaled.
    r_em = np.linalg.norm(x_d)
    assert abs(d) < 1.5 * 0.5 / r_em + 0.01, (psi_emit, psi_ode, r_em)

    # and the closed-form camera EVPA is self-consistent with the same
    # invariant decomposition evaluated at the camera ray
    rot = np.asarray(euler_matrix(cam.euler))
    n_cf = np.cross(np.asarray(o1[0]), np.asarray(d1[0]))
    n_cf = n_cf / np.linalg.norm(n_cf)
    e_c = np.cross(np.asarray(d1[0]), n_cf)
    e_c /= np.linalg.norm(e_c)
    a = f_emit @ (n_pl / np.linalg.norm(n_pl))
    b = f_emit @ (np.cross(-k_d, n_pl) / np.linalg.norm(np.cross(-k_d, n_pl)))
    # sign conventions: renderer uses n(x0, d), emission frame n(x_d, -k_d)
    # = same plane; angles are headless (mod pi)
    f_cam = a * (n_pl / np.linalg.norm(n_pl)) + b * e_c
    chi_self = np.arctan2(f_cam @ rot[:, 1], f_cam @ rot[:, 0])
    dd = (chi_self - chi_cf + np.pi / 2) % np.pi - np.pi / 2
    assert abs(dd) < 0.03, (chi_cf, chi_self)


def test_ks_directional_christoffel_matches_ad():
    """The analytic Kerr-Schild contraction (no (4,4,4) Christoffel ever
    built -- the ~3x transport fast path) equals the AD-derived
    Metric.christoffel contraction for both Gamma.k.k and Gamma.k.f,
    across spins including a = 0 and a < 0."""
    from blackhole_geodesic_calculator_tpu.models import kerr_ks_metric
    from blackhole_geodesic_calculator_tpu.ops.polarization import (
        ks_directional_christoffel,
    )

    rng = np.random.default_rng(3)
    for mass, a in ((0.5, 0.45), (0.5, 0.0), (1.0, 0.9), (0.5, -0.3)):
        m = kerr_ks_metric(mass, a)
        con = ks_directional_christoffel(mass, a)
        for _ in range(10):
            x4 = jnp.asarray(np.r_[0.0, rng.uniform(-10, 10, 3)],
                             jnp.float32)
            k4 = jnp.asarray(rng.normal(size=4), jnp.float32)
            f4 = jnp.asarray(rng.normal(size=4), jnp.float32)
            gam = m.christoffel(x4)
            for v4 in (k4, f4):
                want = np.asarray(jnp.einsum("smn,m,n->s", gam, k4, v4))
                got = np.asarray(con(x4, k4, v4))
                np.testing.assert_allclose(
                    got, want, rtol=2e-5,
                    atol=2e-5 * max(np.abs(want).max(), 1e-3))


def test_transport_fast_path_matches_generic():
    """transport_polarization_ode dispatches KS metrics to the analytic
    contraction; the observable polarization must match the generic
    AD-Christoffel path to f32 noise."""
    import dataclasses

    from blackhole_geodesic_calculator_tpu.models import kerr_ks_metric
    from blackhole_geodesic_calculator_tpu.ops.polarization import (
        transport_polarization_ode,
    )

    m = kerr_ks_metric(0.5, 0.45)
    rng = np.random.default_rng(5)
    n = 32
    x3 = jnp.asarray(np.c_[rng.uniform(4, 9, n), rng.uniform(4, 9, n),
                           rng.uniform(-2, 2, n)], jnp.float32)
    d3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d3 = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
    f3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    f3 = f3 - jnp.sum(f3 * d3, -1, keepdims=True) * d3
    f3 = f3 / jnp.linalg.norm(f3, axis=-1, keepdims=True)

    kw = dict(n_steps=200, dt=0.1)
    fast = transport_polarization_ode(m, x3, d3, f3, **kw)
    generic = transport_polarization_ode(
        dataclasses.replace(m, name="generic_kerr"), x3, d3, f3, **kw)
    np.testing.assert_allclose(np.asarray(fast[0]),
                               np.asarray(generic[0]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(fast[1]),
                               np.asarray(generic[1]), atol=5e-5)
