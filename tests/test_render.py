"""End-to-end render tests: shadow geometry, event shading, multisampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_geodesic_calculator_tpu.camera import Camera
from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig, states
from blackhole_geodesic_calculator_tpu.render import (
    RenderConfig,
    render_image,
    render_progressive,
)
from blackhole_geodesic_calculator_tpu.scene import (
    BlackHole,
    Disk,
    Lights,
    Scene,
    Spheres,
)

M = 0.5


def gradient_sky(h=32, w=64):
    v = jnp.linspace(0.0, 1.0, h)[:, None, None]
    u = jnp.linspace(0.0, 1.0, w)[None, :, None]
    return jnp.concatenate(
        [jnp.broadcast_to(u, (h, w, 1)), jnp.broadcast_to(v, (h, w, 1)),
         jnp.full((h, w, 1), 0.5)], axis=-1)


def base_cfg(n=48, **kw):
    icfg = IntegratorConfig(n_steps=700, dt=0.1, dt_boost=8.0)
    d = dict(width=n, height=n, samples=1, integrator=icfg, lam_max=100.0)
    d.update(kw)
    return RenderConfig(**d)


def test_shadow_size_matches_photon_sphere():
    """The rendered shadow disk must subtend arcsin(b_c/D) with
    b_c = 3 sqrt(3) M -- the 'black shadow region' of reference Fig 7
    (README.md:78-82), made quantitative."""
    D, fov, n = 30.0, 0.4, 64
    scene = Scene(bh=BlackHole.make(mass=M), background=gradient_sky())
    cam = Camera.make(position=(0.0, 0.0, D), euler=(0.0, 0.0, 0.0),
                      fov=(fov, fov))  # looking down -z at the hole
    img = render_image(scene, cam, base_cfg(n))
    rgb = np.asarray(img[..., :3])
    black = (rgb.sum(-1) < 1e-3)
    n_black = black.sum()
    theta_sh = np.arcsin(3 * np.sqrt(3) * M / D)
    pix_per_rad = n / fov
    expect = np.pi * (theta_sh * pix_per_rad) ** 2
    assert abs(n_black - expect) / expect < 0.2, (n_black, expect)
    # shadow is centered
    cy, cx = np.argwhere(black).mean(axis=0)
    assert abs(cy - n / 2) < 2 and abs(cx - n / 2) < 2


def test_background_matches_far_field():
    """Far from the hole rays are straight: corner pixels must equal a direct
    equirect lookup of the unlensed camera direction."""
    from blackhole_geodesic_calculator_tpu.camera import generate_rays, pixel_grid
    from blackhole_geodesic_calculator_tpu.scene import sample_equirect

    sky = gradient_sky()
    scene = Scene(bh=BlackHole.make(mass=0.001), background=sky)
    cam = Camera.make(position=(0.0, 0.0, 30.0), fov=(1.0, 1.0))
    n = 32
    img = np.asarray(render_image(scene, cam, base_cfg(n)))
    ys, xs = pixel_grid(n, n)
    _, d = generate_rays(cam, n, n, ys, xs)
    direct = np.asarray(sample_equirect(sky, d))
    # corners see nearly-unlensed sky (tiny mass, large impact parameter)
    for iy, ix in [(0, 0), (0, n - 1), (n - 1, 0), (n - 1, n - 1)]:
        np.testing.assert_allclose(img[iy, ix, :3], direct[iy, ix], atol=0.02)


def test_render_with_disk_and_sphere_and_lights():
    tex_disk = jnp.ones((8, 16, 3)) * jnp.asarray([1.0, 0.6, 0.2])
    tex_moon = jnp.ones((1, 8, 16, 3)) * jnp.asarray([0.2, 0.4, 1.0])
    scene = Scene(
        bh=BlackHole.make(mass=M),
        background=gradient_sky(),
        disk=Disk.make(r_in=2.0, r_out=6.0, texture=tex_disk, intensity=1.0),
        spheres=Spheres.make(center=[[8.0, 0.0, 3.0]], radius=[1.5],
                             texture=tex_moon),
        lights=Lights.make(position=[[0.0, 20.0, 20.0]]),
    )
    cam = Camera.make(position=(0.0, -25.0, 8.0),
                      euler=(np.pi / 2 - np.arctan2(8.0, 25.0), 0.0, 0.0),
                      fov=(0.8, 0.8))
    img = np.asarray(render_image(scene, cam, base_cfg(48)))
    assert img.shape == (48, 48, 4)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img[..., 3], 1.0)
    # the disk tint must appear somewhere (orange channel ordering r > b)
    rgb = img[..., :3]
    assert ((rgb[..., 0] > 0.3) & (rgb[..., 0] > 2 * rgb[..., 2])).any()
    # the moon tint must appear somewhere (blue dominated)
    assert ((rgb[..., 2] > 0.3) & (rgb[..., 2] > 2 * rgb[..., 0])).any()


def test_crop_marks():
    scene = Scene(bh=BlackHole.make(mass=M), background=gradient_sky())
    cam = Camera.make(position=(0.0, 0.0, 30.0), fov=(0.4, 0.4))
    cfg = base_cfg(32, mark_x_min=8, mark_x_max=15, mark_y_min=4,
                   mark_y_max=11)
    img = np.asarray(render_image(scene, cam, cfg))
    # outside the marks: untouched white buffer (reference ones-init :154)
    np.testing.assert_allclose(img[0, 0], [1, 1, 1, 1])
    np.testing.assert_allclose(img[20, 20], [1, 1, 1, 1])
    # inside: actual render (the hole shadow center is black here)
    assert img[8, 12, :3].sum() < 3.0


def test_multisample_reduces_variance_and_progressive_matches():
    scene = Scene(bh=BlackHole.make(mass=M), background=gradient_sky())
    cam = Camera.make(position=(0.0, 0.0, 30.0), fov=(0.4, 0.4))
    cfg1 = base_cfg(24, samples=1)
    cfg4 = base_cfg(24, samples=4)
    img4 = np.asarray(render_image(scene, cam, cfg4))
    assert np.isfinite(img4).all()
    # progressive final frame == batch render (same key schedule)
    frames = list(render_progressive(scene, cam, cfg4))
    assert len(frames) == 4
    np.testing.assert_allclose(np.asarray(frames[-1][1]), img4, atol=1e-5)


def test_camera_at_x0_no_crash():
    """The reference crashes with the camera at x = 0 ('probably the phi',
    author TODO at RelativisticRenderEngine.py:31-32).  Here polar/axis
    degeneracies are guarded (safe_arccos/safe_arctan2): the exact x = 0
    camera with a dead-center pixel renders finite."""
    import dataclasses
    import jax.numpy as jnp
    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import (
        RenderConfig, render_image,
    )
    from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

    v, u = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    sky = jnp.asarray(np.stack([u / 16.0, v / 8.0, 0 * u + 1.0], -1),
                      jnp.float32)
    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky)
    cfg = RenderConfig(width=17, height=17,  # odd: a pixel exactly on-axis
                       integrator=IntegratorConfig(n_steps=64, dt=0.2),
                       lam_max=60.0)
    for pos in [(0.0, 0.0, 15.0), (0.0, 12.0, 0.0), (0.0, 0.0, -15.0)]:
        cam = Camera.make(position=pos, euler=(0.7, 0.0, 0.3), fov=(0.8, 0.8))
        img = np.asarray(render_image(scene, cam, cfg))
        assert np.isfinite(img).all(), f"non-finite pixels for camera {pos}"
