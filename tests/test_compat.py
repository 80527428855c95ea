"""curvedpy-compat API tests: each class is exercised exactly the way the
reference render engines call it (SURVEY.md §2.3 call-site reconstruction)."""

import numpy as np
import pytest

from blackhole_geodesic_calculator_tpu.compat import (
    ApproxSchwarzschildGeodesic,
    Conversions,
    GeodesicIntegratorSchwarzschild,
    RelativisticCamera,
    SchwarzschildGeodesic,
)


def test_conversions_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 3)) * 10
    k = rng.normal(size=(32, 3))
    c = Conversions()
    sph, ksph = c.convert_xyz_to_sph(x, k)
    x2, k2 = c.convert_sph_to_xyz(sph, ksph)
    np.testing.assert_allclose(x2, x, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(k2, k, rtol=1e-8, atol=1e-10)


def test_calc_trajectory_reference_contract():
    """The exact call pattern of RelativisticRenderEngine.spacetime_ray_cast
    (:293-308): single ray, unpack (k, x, result), read flags + end state."""
    gi = GeodesicIntegratorSchwarzschild(mass=0.5, time_like=False)
    k, x, res = gi.calc_trajectory(
        k0_xyz=[0.0, 0.0, -1.0], x0_xyz=[8.0, 0.0, 25.0],
        max_step=0.1, curve_end=80.0, nr_points_curve=10000)
    assert x.shape[0] == 3 and k.shape[0] == 3  # (3, T) per ray
    assert not res["start_inside_hole"]
    assert not res["hit_blackhole"]
    assert res["end_loc"].shape == (3,)
    np.testing.assert_allclose(np.linalg.norm(res["end_dir"]), 1.0, atol=1e-5)
    # ray started at x=8 off-axis going -z: must be deflected toward axis
    assert res["end_dir"][0] < -1e-3

    # radial infall -> capture
    _, _, res2 = gi.calc_trajectory([-1.0, 0.0, 0.0], [10.0, 0.0, 0.0],
                                    0.05, 50.0)
    assert res2["hit_blackhole"]
    # camera inside horizon
    _, _, res3 = gi.calc_trajectory([1.0, 0.0, 0.0], [0.3, 0.0, 0.0],
                                    0.05, 10.0)
    assert res3["start_inside_hole"]


def test_sphere_of_influence_ray_trace():
    """Gen-1 call pattern (LimitedRelativisticRenderEngine.py:273-278)."""
    sw = SchwarzschildGeodesic(metric="schwarzschild")
    R = 20.0
    # entry on the sphere, aimed with impact parameter 5 (strong deflection)
    loc = [-np.sqrt(R**2 - 25.0), 5.0, 0.0]
    x, y, z, end_loc, end_dir, mes = sw.ray_trace(
        direction=[1.0, 0.0, 0.0], loc_hit=loc,
        exit_tolerance=0.1, ratio_obj_to_blackhole=R,
        curve_end=sw.approximateCurveEnd(R), max_step=0.1)
    assert mes["exited"] and not mes["hit_blackhole"]
    assert np.linalg.norm(end_loc) >= R * 0.99
    # deflection bends the ray toward -y (BH at origin, b>0 along +y)
    assert end_dir[1] < -0.01
    np.testing.assert_allclose(np.linalg.norm(end_dir), 1.0, atol=1e-4)

    # small impact parameter -> capture
    *_, mes2 = sw.ray_trace([1.0, 0.0, 0.0],
                            [-np.sqrt(R**2 - 1.0), 1.0, 0.0],
                            0.1, R, sw.approximateCurveEnd(R), 0.05)
    assert mes2["hit_blackhole"]


def test_flat_metric_straight_lines():
    """The reference's validation backend: metric='flat' must give straight
    rays (README.md:233)."""
    sw = SchwarzschildGeodesic(metric="flat")
    R = 20.0
    loc = [-np.sqrt(R**2 - 25.0), 5.0, 0.0]
    *_, end_loc, end_dir, mes = sw.ray_trace(
        [1.0, 0.0, 0.0], loc, 0.1, R, 60.0, 0.1)
    np.testing.assert_allclose(end_dir, [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(end_loc[1], 5.0, atol=1e-3)


def test_approx_surrogate_matches_ode():
    """ApproxSchwarzschildGeodesic (the reference's approx mode) must agree
    with the real solver away from the capture boundary."""
    R = 20.0
    a = ApproxSchwarzschildGeodesic(ratio_obj_to_blackhole=R,
                                    exit_tolerance=0.1, n_table=256)
    sw = SchwarzschildGeodesic()
    rng = np.random.default_rng(4)
    for b in [4.0, 7.0, 12.0]:
        # random orientation of the same scattering geometry
        loc = np.asarray([-np.sqrt(R**2 - b**2), b, 0.0])
        d = np.asarray([1.0, 0.0, 0.0])
        el_a, ed_a, mes_a = a.generatedRayTracer(loc, d)
        *_, el_r, ed_r, mes_r = sw.ray_trace(d, loc, 0.1, R,
                                             sw.approximateCurveEnd(R), 0.05)
        assert bool(mes_a["hit_blackhole"]) == bool(mes_r["hit_blackhole"])
        assert np.dot(ed_a, ed_r) > 0.999
    # deep capture
    loc = np.asarray([-R + 0.01, 0.5, 0.0])
    _, _, mes = a.generatedRayTracer(loc, np.asarray([1.0, 0.0, 0.0]))
    assert mes["hit_blackhole"]


def test_relativistic_camera_run_save_load(tmp_path):
    """Gen-3 call pattern (RelativisticRenderEngineCamEdition.py:206-229):
    run, read ray_blackhole_hit / ray_end, persist, reload."""
    cam = RelativisticCamera(resolution=(24, 24), field_of_view=(0.5, 0.5),
                             a=0.0, camera_location=(0.0, 0.0, 20.0),
                             max_step=0.2, curve_end=80.0)
    cam.run(verbose=False)
    assert cam.ray_blackhole_hit.shape == (24, 24)
    assert cam.ray_end.shape == (24, 24, 6)
    # center pixel looks straight at the hole
    assert cam.ray_blackhole_hit[12, 12] == 1
    # corner escapes
    assert cam.ray_blackhole_hit[0, 0] == 0
    dirs = cam.ray_end[..., 3:6]
    norms = np.linalg.norm(dirs[cam.ray_blackhole_hit == 0], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    p = str(tmp_path / "cam.npz")
    cam.save(p)
    cam2 = RelativisticCamera().load(p)
    np.testing.assert_array_equal(cam2.ray_blackhole_hit,
                                  cam.ray_blackhole_hit)
    np.testing.assert_allclose(cam2.ray_end, cam.ray_end)
    assert cam2.resolution == (24, 24) and cam2.a == 0.0


def test_relativistic_camera_kerr():
    """Kerr spin a=0.9 (the reference's a_0.9 precomputed cameras,
    RelativisticRenderEngineCamEdition.py:216-221): frame dragging makes
    the shadow asymmetric in x for a spin-z hole viewed along z... with the
    camera on the z axis the shadow stays round; verify instead that spin
    changes the capture set and runs NaN-free."""
    cam0 = RelativisticCamera(resolution=(16, 16), field_of_view=(0.6, 0.6),
                              a=0.0, camera_location=(20.0, 0.0, 0.0),
                              camera_rotation_euler=(0.0, np.pi / 2, 0.0),
                              max_step=0.2, curve_end=80.0).run()
    cam9 = RelativisticCamera(resolution=(16, 16), field_of_view=(0.6, 0.6),
                              a=0.45, camera_location=(20.0, 0.0, 0.0),
                              camera_rotation_euler=(0.0, np.pi / 2, 0.0),
                              max_step=0.2, curve_end=80.0).run()
    assert np.isfinite(cam9.ray_end).all()
    assert cam0.ray_blackhole_hit.sum() > 0
    assert (cam0.ray_blackhole_hit != cam9.ray_blackhole_hit).any()


def test_metric_objects_on_compat_classes():
    """curvedpy's sympy SW.g / SW.gam_y equivalents: numeric metric tensor
    and Christoffels (reference README.md:174-186)."""
    import jax.numpy as jnp
    from blackhole_geodesic_calculator_tpu.compat import (
        GeodesicIntegratorSchwarzschild, SchwarzschildGeodesic,
    )

    gi = GeodesicIntegratorSchwarzschild(mass=0.5)
    x4 = jnp.asarray([0.0, 5.0, 1.0, -2.0])
    g = np.asarray(gi.g(x4))
    assert g.shape == (4, 4)
    np.testing.assert_allclose(g, g.T, atol=1e-6)  # symmetric
    gam = np.asarray(gi.gam_y(x4))
    assert gam.shape == (4, 4, 4)
    np.testing.assert_allclose(gam, np.swapaxes(gam, 1, 2), atol=1e-5)

    # flat metric: Minkowski everywhere, zero Christoffels
    sw = SchwarzschildGeodesic(metric="flat")
    gf = np.asarray(sw.g(x4))
    np.testing.assert_allclose(gf, np.diag([-1.0, 1, 1, 1]), atol=1e-6)
    assert np.abs(np.asarray(sw.gam_y(x4))).max() < 1e-6
    # Kerr spins the metric object too
    gk = GeodesicIntegratorSchwarzschild(mass=0.5, spin=0.6)
    assert np.isfinite(np.asarray(gk.gam_y(x4))).all()


def test_relativistic_camera_render():
    """Gen-3 shading pass: black shadow where captured, equirect background
    elsewhere, red for a missing texture, test_output gradient
    (RelativisticRenderEngineCamEdition.py:224-229,424-443)."""
    from blackhole_geodesic_calculator_tpu.compat import RelativisticCamera

    cam = RelativisticCamera(resolution=(24, 24), field_of_view=(0.8, 0.8),
                             mass=0.5, camera_location=(0.0, 0.0, 15.0),
                             max_step=0.2, curve_end=80.0)
    cam.run()
    assert cam.ray_blackhole_hit.sum() > 4  # central shadow exists

    v, u = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    sky = np.stack([u / 16.0, v / 8.0, np.ones_like(u, float)], -1)
    img = cam.render(background=sky)
    assert img.shape == (24, 24, 4)
    hit = cam.ray_blackhole_hit.astype(bool)
    assert np.abs(img[hit][:, :3]).max() == 0.0           # shadow black
    assert (img[~hit][:, :3].max(-1) > 0.0).all()         # sky shaded

    red = cam.render(background=None)
    expect = np.broadcast_to(np.asarray([1.0, 0.0, 0.0], np.float32),
                             red[~hit][:, :3].shape)
    np.testing.assert_allclose(red[~hit][:, :3], expect, atol=0)
    dbg = cam.render(test_output=True)
    assert np.isfinite(dbg).all() and dbg[..., :3].max() <= 1.0


def test_texture_registry():
    from blackhole_geodesic_calculator_tpu.scene import (
        TEXTURES, load_all, load_texture,
    )

    assert {"background", "moon", "test", "disk_clouds"} <= set(TEXTURES)
    tex = load_texture("background", size=(64, 128))
    assert tex.shape == (64, 128, 3) and tex.dtype == np.float32
    assert 0.0 <= tex.min() and tex.max() <= 1.0
    # idempotent cache: same object back
    assert load_texture("background", size=(64, 128)) is tex
    # distinct kinds differ
    moon = load_texture("moon", size=(64, 128))
    assert not np.array_equal(moon, tex)
    allt = load_all()
    assert set(allt) == set(TEXTURES)
    with pytest.raises(KeyError):
        load_texture("nope")


def test_debug_rays_crop():
    """debug_rays matches the reference's marked-pixel debug_string dump
    (LimitedRelativisticRenderEngine.py:123-141,304-305)."""
    import dataclasses
    import jax.numpy as jnp
    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import (
        RenderConfig, debug_rays, format_debug_string,
    )
    from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

    v, u = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    sky = jnp.asarray(np.stack([u / 16.0, v / 8.0, 0 * u + 1.0], -1),
                      jnp.float32)
    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky)
    cam = Camera.make(position=(0.0, 0.0, 15.0), fov=(0.7, 0.7))
    cfg = RenderConfig(width=32, height=32,
                       integrator=IntegratorConfig(n_steps=64, dt=0.2),
                       lam_max=60.0,
                       mark_x_min=14, mark_x_max=17,
                       mark_y_min=15, mark_y_max=16)
    rec = debug_rays(scene, cam, cfg)
    assert len(rec["ys"]) == 4 * 2
    assert rec["xs"].min() == 14 and rec["xs"].max() == 17
    # central rays point at the hole and get captured
    from blackhole_geodesic_calculator_tpu.ops import states as st
    assert (rec["status"] == st.CAPTURED).any()
    s = format_debug_string(rec)
    assert "end_loc=" in s and s.count("\n") == 7
