"""Texture, camera and shading unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_geodesic_calculator_tpu.scene import (
    sample_bpy,
    sample_equirect,
    Scene,
    BlackHole,
    Disk,
    shade_disk,
)
from blackhole_geodesic_calculator_tpu.camera import (
    Camera,
    euler_matrix,
    generate_rays,
    pixel_grid,
)


def test_sample_constant_texture():
    tex = jnp.full((8, 16, 3), 0.25)
    x = jnp.linspace(-1, 1, 13)
    y = jnp.linspace(-1, 1, 13)
    out = sample_bpy(tex, x, y)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)


def test_sample_bilinear_and_wrap():
    # 1x2 texture: left pixel 0, right pixel 1 -> sampling wraps in x
    tex = jnp.asarray([[[0.0], [1.0]]])
    # pixel centers: x=-0.5 -> texel 0, x=0.5 -> texel 1
    v = sample_bpy(tex, jnp.asarray([-0.5, 0.5, 0.0]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(v[:, 0]), [0.0, 1.0, 0.5], atol=1e-6)
    # wrap: x=1.0 is halfway between texel 1 and texel 0 again
    v = sample_bpy(tex, jnp.asarray([1.0]), jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(v[0, 0]), 0.5, atol=1e-6)


def test_equirect_poles_and_equator():
    """North pole (+z) must read the top image row; -x direction the
    wrap seam; mapping per RelativisticRenderEngine.py:373-375."""
    h, w = 8, 16
    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None, None],
                            (h, w, 1))
    tex = rows / (h - 1)  # 0 at top row, 1 at bottom row
    up = sample_equirect(tex, jnp.asarray([0.0, 0.0, 1.0]))
    down = sample_equirect(tex, jnp.asarray([0.0, 0.0, -1.0]))
    assert float(up[0]) < 0.1 and float(down[0]) > 0.9
    mid = sample_equirect(tex, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(float(mid[0]), 0.5, atol=0.1)


def test_euler_matrix_is_blender_xyz():
    # Rx(90deg) carries -z to +y (camera pitched up to the horizon)
    r = euler_matrix(jnp.asarray([jnp.pi / 2, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(r @ jnp.asarray([0.0, 0.0, -1.0])),
                               [0.0, 1.0, 0.0], atol=1e-6)
    # composition order: R = Rz @ Ry @ Rx
    e = jnp.asarray([0.3, -0.2, 0.9])
    rx = euler_matrix(jnp.asarray([e[0], 0, 0]))
    ry = euler_matrix(jnp.asarray([0, e[1], 0]))
    rz = euler_matrix(jnp.asarray([0, 0, e[2]]))
    np.testing.assert_allclose(np.asarray(euler_matrix(e)),
                               np.asarray(rz @ ry @ rx), atol=1e-6)


def test_generate_rays_reference_model():
    """Center pixel looks down -z; offsets scale with fov/W like the
    reference NDC (RelativisticRenderEngine.py:224-225)."""
    cam = Camera.make(position=(1.0, 2.0, 3.0), fov=(1.0, 1.0))
    w = h = 64
    ys, xs = pixel_grid(w, h)
    o, d = generate_rays(cam, w, h, ys, xs, key=None)
    assert d.shape == (h, w, 3)
    np.testing.assert_allclose(np.asarray(o[0, 0]), [1.0, 2.0, 3.0], atol=1e-6)
    # center pixel: x = W//2 -> x_render = 0
    np.testing.assert_allclose(np.asarray(d[h // 2, w // 2]), [0, 0, -1],
                               atol=1e-6)
    # one pixel right of center: angle ~ fov/W
    dc = np.asarray(d[h // 2, w // 2 + 1])
    np.testing.assert_allclose(dc[0], 1.0 / w, atol=1e-3)
    # unit norm everywhere
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               atol=1e-6)


def test_jitter_stays_in_pixel_and_is_seeded():
    cam = Camera.make(position=(0.0, 0.0, 0.0), fov=(1.0, 1.0))
    w = h = 16
    ys, xs = pixel_grid(w, h)
    k = jax.random.PRNGKey(42)
    _, d1 = generate_rays(cam, w, h, ys, xs, key=k)
    _, d2 = generate_rays(cam, w, h, ys, xs, key=k)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))  # deterministic
    _, d0 = generate_rays(cam, w, h, ys, xs, key=None)
    # jitter moves directions by at most ~ a pixel
    assert float(jnp.abs(d1 - d0).max()) < 2.0 / w
    assert float(jnp.abs(d1 - d0).max()) > 0.0


def test_disk_shader_formula():
    """Gaussian radial profile exactly as checkHitDisk
    (LimitedRelativisticRenderEngine.py:427-434)."""
    tex = jnp.ones((4, 8, 3))
    scene = Scene(
        bh=BlackHole.make(),
        disk=Disk.make(r_in=2.0, r_out=6.0, texture=tex, phase=0.3,
                       mean=0.5, stddev=0.2, intensity=2.0),
    )
    pt = jnp.asarray([[3.0, 1.0, 0.0]])
    rgb = np.asarray(shade_disk(scene, pt))[0]
    rr = np.sqrt(10.0)
    s = (rr - 2.0) / 4.0
    expect = 2.0 * np.exp(-((s - 0.5) ** 2) / (2 * 0.2**2)) / np.sqrt(
        2 * np.pi * 0.2)
    np.testing.assert_allclose(rgb, expect, rtol=1e-5)


class TestDiskRedshift:
    """Relativistic beaming of the Keplerian disk (beyond the reference:
    its 'Add redshift' milestone is unchecked, README.md:217-220)."""

    def test_face_on_matches_textbook(self):
        """A photon integrated in the x-z plane has L_z = 0 at the disk
        crossing, so g must equal the face-on result sqrt(1 - 3M/r)."""
        import jax.numpy as jnp
        from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
        from blackhole_geodesic_calculator_tpu.ops import states
        from blackhole_geodesic_calculator_tpu.ops.integrate import (
            DiskGeom, GeodesicEnv, launch,
        )
        from blackhole_geodesic_calculator_tpu.scene import disk_redshift

        M = 0.5
        env = GeodesicEnv(
            mass=jnp.float32(M), r_capture=jnp.float32(2 * M),
            r_escape=jnp.float32(80.0), lam_max=jnp.float32(200.0),
            disk=DiskGeom(r_in=jnp.float32(2.0), r_out=jnp.float32(8.0)))
        x0 = jnp.asarray([[4.0, 0.0, 30.0], [6.0, 0.0, 30.0]], jnp.float32)
        d0 = jnp.asarray([[0.0, 0.0, -1.0]] * 2, jnp.float32)
        cfg = IntegratorConfig(n_steps=2048, dt=0.05, dt_boost=4.0,
                               backend="scan")
        s = launch(env, x0, d0, cfg)
        assert (np.asarray(s.status) == states.DISK).all()
        g = np.asarray(disk_redshift(s.x, s.p, s.E, M))
        r_hit = np.hypot(np.asarray(s.x)[:, 0], np.asarray(s.x)[:, 1])
        expect = np.sqrt(1.0 - 3.0 * M / r_hit)
        np.testing.assert_allclose(g, expect, rtol=2e-3)

    def test_doppler_asymmetry(self):
        """Photons leaving toward the approaching side are blueshifted
        (g > face-on), the receding side redshifted (g < face-on)."""
        import jax.numpy as jnp
        from blackhole_geodesic_calculator_tpu.scene import disk_redshift

        M, r = 0.5, 5.0
        x = jnp.asarray([[r, 0.0, 0.0]] * 2, jnp.float32)
        # prograde matter at (r,0,0) moves toward +y; a photon headed -y
        # moves against it (redshift), +y with it (blueshift)
        p = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        E = jnp.ones(2, jnp.float32)
        g = np.asarray(disk_redshift(x, p, E, M))
        face_on = np.sqrt(1.0 - 3.0 * M / r)
        assert g[0] < face_on < g[1]

    def test_no_orbit_inside_photon_sphere(self):
        import jax.numpy as jnp
        from blackhole_geodesic_calculator_tpu.scene import disk_redshift

        M = 0.5
        x = jnp.asarray([[1.2, 0.0, 0.0]], jnp.float32)  # r < 3M = 1.5
        p = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        g = np.asarray(disk_redshift(x, p, jnp.ones(1), M))
        assert g[0] == 0.0

    def test_beaming_render_differentiable(self):
        """Beamed disk renders finite and its brightness gradient wrt mass
        is finite (gradients flow through the kinematics)."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        from blackhole_geodesic_calculator_tpu.camera import Camera
        from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
        from blackhole_geodesic_calculator_tpu.render import (
            RenderConfig, render_image,
        )
        from blackhole_geodesic_calculator_tpu.scene import (
            BlackHole, Disk, Scene,
        )

        disk_tex = jnp.ones((4, 8, 3), jnp.float32)
        cam = Camera.make(position=(0.0, -18.0, 4.0),
                          euler=(1.35, 0.0, 0.0), fov=(0.9, 0.9))
        cfg = RenderConfig(width=48, height=32,
                           integrator=IntegratorConfig(n_steps=96, dt=0.15),
                           lam_max=80.0)

        def lum(mass, beaming):
            scene = Scene(
                bh=BlackHole.make(mass=0.0),
                disk=Disk.make(r_in=2.0, r_out=6.0, texture=disk_tex,
                               beaming=beaming),
            )
            scene = dataclasses.replace(
                scene, bh=dataclasses.replace(scene.bh, mass=mass))
            img = render_image(scene, cam, cfg)
            return img

        img = np.asarray(lum(jnp.float32(0.5), 4.0))
        assert np.isfinite(img).all()
        # edge-on: approaching (one half) must outshine receding half
        left = img[:, :24, :3].sum()
        right = img[:, 24:, :3].sum()
        ratio = max(left, right) / max(min(left, right), 1e-9)
        assert ratio > 1.5, f"no Doppler asymmetry: {left} vs {right}"
        # without beaming the halves are symmetric
        # without beaming the halves are near-symmetric (the pixel grid is
        # not exactly mirror-symmetric about the axis, hence the slack)
        img0 = np.asarray(lum(jnp.float32(0.5), None))
        l0, r0 = img0[:, :24, :3].sum(), img0[:, 24:, :3].sum()
        assert abs(l0 - r0) / max(l0, r0) < 0.15
        dmass = jax.grad(
            lambda m: jnp.mean(lum(m, 4.0)[..., :3]))(jnp.float32(0.5))
        assert np.isfinite(float(dmass))


class TestPolarization:
    """Schwarzschild polarization transport (reference open milestone)."""

    def test_flat_limit_no_rotation(self):
        from blackhole_geodesic_calculator_tpu.ops.polarization import (
            polarization_rotation, transport_polarization,
        )

        x0 = jnp.asarray([[3.0, 1.0, 20.0]])
        d0 = jnp.asarray([[0.0, 0.0, -1.0]])
        f0 = jnp.asarray([[1.0, 0.0, 0.0]])
        f1 = transport_polarization(x0, d0, f0, d0)  # undeflected
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-6)
        assert abs(float(polarization_rotation(x0, d0, d0)[0])) < 1e-6

    def test_transport_invariants(self):
        """Unit norm, orthogonality to the final ray, out-of-plane
        component preserved -- checked on an actually-integrated
        strong-deflection geodesic."""
        from blackhole_geodesic_calculator_tpu.ops import (
            GeodesicEnv, IntegratorConfig, launch,
        )
        from blackhole_geodesic_calculator_tpu.ops.integrate import (
            final_direction,
        )
        from blackhole_geodesic_calculator_tpu.ops.polarization import (
            plane_normal, transport_polarization,
        )

        x0 = jnp.asarray([[2.8, 0.0, 25.0]])     # photon-sphere grazer
        d0 = jnp.asarray([[0.0, 0.0, -1.0]])
        env = GeodesicEnv(mass=jnp.float32(0.5), r_capture=jnp.float32(1.0),
                          r_escape=jnp.float32(70.0),
                          lam_max=jnp.float32(200.0))
        cfg = IntegratorConfig(n_steps=400, dt=0.1, dt_boost=16.0,
                               dt_boost_r_ref=1.6, dt_power=1.5,
                               backend="scan")
        s = launch(env, x0, d0, cfg)
        d1 = final_direction(env, s)
        # mixed in/out-of-plane polarization
        f0 = jnp.asarray([[0.6, 0.8, 0.0]])
        f0 = f0 - jnp.sum(f0 * d0, -1, keepdims=True) * d0
        f0 = f0 / jnp.linalg.norm(f0, axis=-1, keepdims=True)
        f1 = transport_polarization(x0, d0, f0, d1)
        assert abs(float(jnp.linalg.norm(f1, axis=-1)[0]) - 1.0) < 1e-5
        assert abs(float(jnp.sum(f1 * d1, -1)[0])) < 1e-5
        n = plane_normal(x0, d0)
        a0 = float(jnp.sum(f0 * n, -1)[0])
        a1 = float(jnp.sum(f1 * n, -1)[0])
        assert abs(a0 - a1) < 1e-5     # no gravitational Faraday rotation

    def test_rotation_matches_weak_field_deflection(self):
        """In-plane basis rotation equals the deflection ~ 4M/b for a
        weak-field ray (signed toward the hole)."""
        from blackhole_geodesic_calculator_tpu.ops import (
            GeodesicEnv, IntegratorConfig, launch,
        )
        from blackhole_geodesic_calculator_tpu.ops.integrate import (
            final_direction,
        )
        from blackhole_geodesic_calculator_tpu.ops.polarization import (
            polarization_rotation,
        )

        b = 10.0
        x0 = jnp.asarray([[b, 0.0, 60.0]])
        d0 = jnp.asarray([[0.0, 0.0, -1.0]])
        env = GeodesicEnv(mass=jnp.float32(0.5), r_capture=jnp.float32(1.0),
                          r_escape=jnp.float32(150.0),
                          lam_max=jnp.float32(400.0))
        cfg = IntegratorConfig(n_steps=900, dt=0.1, dt_boost=16.0,
                               dt_boost_r_ref=1.6, dt_power=1.5,
                               backend="scan")
        s = launch(env, x0, d0, cfg)
        d1 = final_direction(env, s)
        ang = float(polarization_rotation(x0, d0, d1)[0])
        # 2nd-order PPN deflection: 4M/b + 15 pi M^2 / (4 b^2)
        M = 0.5
        expected = 4.0 * M / b + 15.0 * np.pi * M * M / (4.0 * b * b)
        assert abs(abs(ang) - expected) < 0.05 * expected, (ang, expected)

    def test_polarization_map_renders(self):
        from blackhole_geodesic_calculator_tpu.camera import Camera
        from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
        from blackhole_geodesic_calculator_tpu.render.renderer import (
            RenderConfig, polarization_map,
        )
        from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

        scene = Scene(bh=BlackHole.make(mass=0.5))
        cam = Camera.make(position=(0.0, 0.0, 20.0), fov=(0.7, 0.7))
        cfg = RenderConfig(width=24, height=24,
                           integrator=IntegratorConfig(n_steps=200, dt=0.1,
                                                       backend="scan"),
                           lam_max=80.0)
        m = np.asarray(polarization_map(scene, cam, cfg))
        assert m.shape == (24, 24)
        assert np.isnan(m[12, 12])          # shadow center: captured
        edge = m[0, :]
        assert np.isfinite(edge).all() and (np.abs(edge) > 1e-3).any()

        # Kerr goes through the transport-ODE path: finite angles where
        # rays escape, and near the equatorial pole axis the Faraday
        # contribution is small so values stay bounded
        kerr = Scene(bh=BlackHole.make(mass=0.5, spin=0.3))
        cfg_k = RenderConfig(width=8, height=8,
                             integrator=IntegratorConfig(
                                 n_steps=300, dt=0.1, dt_boost=16.0,
                                 dt_boost_r_ref=1.6, backend="scan"),
                             lam_max=80.0, r_escape=70.0)
        mk = np.asarray(polarization_map(kerr, cam, cfg_k))
        assert mk.shape == (8, 8)
        assert np.isfinite(mk[0, 0]) and abs(mk[0, 0]) < np.pi
