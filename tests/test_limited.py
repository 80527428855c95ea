"""Gen-1 'Limited' hybrid renderer tests -- reference behaviors from
LimitedRelativisticRenderEngine.py (see render/limited.py docstring)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blackhole_geodesic_calculator_tpu.camera import Camera
from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
from blackhole_geodesic_calculator_tpu.render import (
    LimitedConfig,
    RenderConfig,
    render_image,
    render_limited,
)
from blackhole_geodesic_calculator_tpu.scene import (
    BlackHole, Disk, Lights, Scene, Spheres,
)


def sky():
    h, w = 16, 32
    v = jnp.linspace(0.0, 1.0, h)[:, None]
    u = jnp.linspace(0.0, 1.0, w, endpoint=False)[None, :]
    return jnp.stack([jnp.broadcast_to(0.5 + 0.5 * jnp.sin(
        2 * jnp.pi * u) * jnp.sin(jnp.pi * v), (h, w)),
        jnp.broadcast_to(v, (h, w)), 0.5 * jnp.ones((h, w))], -1)


CFG = RenderConfig(width=32, height=32, samples=1,
                   integrator=IntegratorConfig(n_steps=400, dt=0.1),
                   lam_max=200.0)
LCFG = LimitedConfig(r_influence=10.0)
CAM = Camera.make(position=(0.0, 0.0, 40.0), fov=(0.6, 0.6))


def test_limited_basic_shadow_and_background():
    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky())
    img = np.asarray(render_limited(scene, CAM, CFG, LCFG))
    assert np.isfinite(img).all()
    # center: shadow black
    assert img[16, 16, :3].max() < 1e-3
    # corner ray never enters the influence sphere -> pure background
    assert img[0, 0, :3].sum() > 0.05
    # no rogue-ray debug pixels in a healthy config
    red = (img[..., 0] > 0.99) & (img[..., 1] < 0.01) & (img[..., 2] < 0.01)
    assert red.sum() == 0


def test_limited_vs_whole_scene_truncation_error():
    """The hybrid treats space outside the influence sphere as flat; the
    whole-scene render keeps the weak-field deflection ~2 r_s / b out there
    (0.1-0.13 rad at b = 10-15 for r_s = 1).  The difference between the
    two engines on border rays is exactly that truncation error -- bounded
    and small, but nonzero by design (this is Gen-1's architectural
    approximation, reference README.md:66 vs :224)."""
    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky())
    img_l = np.asarray(render_limited(scene, CAM, CFG, LCFG))
    img_w = np.asarray(render_image(scene, CAM, dataclasses.replace(
        CFG, lam_max=300.0)))
    border = np.ones((32, 32), bool)
    border[6:26, 6:26] = False
    diff = np.abs(img_l[..., :3] - img_w[..., :3])[border]
    assert diff.max() < 0.2  # bounded by the weak-field deflection
    # both agree the shadow is black
    assert img_w[16, 16, :3].max() < 1e-3
    assert img_l[16, 16, :3].max() < 1e-3


def test_limited_disk_and_debug_colors():
    disk_tex = jnp.broadcast_to(jnp.asarray([1.0, 0.6, 0.2]), (8, 32, 3))
    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky(),
                  disk=Disk.make(r_in=2.0, r_out=6.0, texture=disk_tex))
    cam = Camera.make(position=(0.0, 12.0, 38.0), euler=(-0.3, 0.0, 0.0),
                      fov=(0.6, 0.6))
    img = np.asarray(render_limited(scene, cam, CFG, LCFG))
    assert np.isfinite(img).all()
    orange = (img[..., 0] > 0.3) & (img[..., 2] < 0.25) & (img[..., 1] > 0.1)
    assert orange.sum() > 10  # lensed disk visible

    # 'Outside' taxonomy: starve the affine budget -> RED debug pixels
    cfg_starved = dataclasses.replace(
        CFG, lam_max=3.0,
        integrator=IntegratorConfig(n_steps=30, dt=0.1))
    img2 = np.asarray(render_limited(scene, cam, cfg_starved, LCFG))
    red = (img2[..., 0] > 0.99) & (img2[..., 1] < 0.01) & (img2[..., 2] < 0.01)
    assert red.sum() > 10
    # debug colors off -> those pixels render black instead
    img3 = np.asarray(render_limited(
        scene, cam, cfg_starved,
        dataclasses.replace(LCFG, debug_colors=False)))
    assert ((img3[..., :3] == 0).all(-1) & red).sum() == red.sum()


def test_limited_moon_einstein_ring_and_lambert():
    moon_tex = jnp.broadcast_to(jnp.asarray([0.2, 1.0, 0.2]), (1, 8, 8, 3))
    scene = Scene(
        bh=BlackHole.make(mass=0.5), background=sky(),
        spheres=Spheres.make(center=[[0.0, 0.0, -20.0]], radius=[1.5],
                             texture=moon_tex),
    )
    img = np.asarray(render_limited(scene, CAM, CFG, LCFG))
    green = (img[..., 1] > 0.8) & (img[..., 0] < 0.4)
    ys, xs = np.nonzero(green)
    assert len(ys) > 4
    r = np.sqrt((ys - 16) ** 2 + (xs - 16) ** 2)
    assert r.min() > 1.5  # ring, not a central dot

    # Lambert branch: non-emissive sphere lit by a lamp, visible directly
    scene2 = Scene(
        bh=BlackHole.make(mass=0.5), background=None,
        spheres=Spheres.make(center=[[5.0, 0.0, 20.0]], radius=[3.0],
                             texture=moon_tex, emission=[0.0],
                             albedo=[[1.0, 0.0, 0.0]]),
        lights=Lights.make(position=[[30.0, 0.0, 40.0]], intensity=10.0),
    )
    img2 = np.asarray(render_limited(scene2, CAM, CFG, LCFG))
    lit = img2[..., 0] > 0.01
    assert lit.sum() > 3  # lamp-lit red sphere visible


def test_limited_test_output_background():
    scene = Scene(bh=BlackHole.make(mass=0.5))
    img = np.asarray(render_limited(
        scene, CAM, CFG, dataclasses.replace(LCFG, test_output=True)))
    # direction gradient: red channel everywhere 0
    assert (img[..., 0] < 1e-6).all()
    assert img[..., 1:3].max() > 0.01


def test_limited_approx_surrogate_mode():
    """The reference's approx mode: surrogate table instead of the ODE;
    shadow and lensing must closely match the exact render (disk off --
    approx forces it, LimitedRelativisticRenderEngine.py:499)."""
    from blackhole_geodesic_calculator_tpu.render import SurrogateTable

    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky())
    exact = np.asarray(render_limited(scene, CAM, CFG, LCFG))
    approx = np.asarray(render_limited(
        scene, CAM, CFG, dataclasses.replace(LCFG, approx=True)))
    assert np.isfinite(approx).all()
    # shadows agree
    assert approx[16, 16, :3].max() < 1e-3
    sh_e = (exact[..., :3].max(-1) < 1e-3)
    sh_a = (approx[..., :3].max(-1) < 1e-3)
    assert (sh_e != sh_a).mean() < 0.02
    # lensed background close (interpolation error only)
    diff = np.abs(exact[..., :3] - approx[..., :3])
    assert np.median(diff) < 0.02


def test_render_stats():
    from blackhole_geodesic_calculator_tpu.render import render_stats

    scene = Scene(bh=BlackHole.make(mass=0.5), background=sky())
    st = render_stats(scene, CAM, CFG)
    assert st["rays_total"] == 32 * 32
    assert st["status"]["captured"] > 0 and st["status"]["escaped"] > 0
    assert st["rogue_fraction"] == 0.0
    assert st["settings"]["mass"] == 0.5


def test_limited_kerr_capture_radius_matches_whole_scene():
    """The hybrid engine must capture at the Kerr outer horizon
    r_+ = M + sqrt(M^2 - a^2), not at the Schwarzschild 2M: for an
    EQUATORIAL observer at a/M = 0.9 the prograde shadow-edge photons pass
    near the prograde photon orbit (~1.56 M = 0.78), inside a 2M = 1.0
    capture sphere -- a 2M capture measurably inflates the shadow (464 vs
    457 black pixels in this config).  Gate: the hybrid's shadow pixel
    count matches the whole-scene Kerr render's (which uses
    horizon_radius) almost exactly."""
    cam = Camera.make(position=(0.0, -40.0, 0.0),
                      euler=(np.pi / 2, 0.0, 0.0), fov=(0.25, 0.25))
    cfg = RenderConfig(width=48, height=48, samples=1,
                       integrator=IntegratorConfig(n_steps=600, dt=0.05),
                       lam_max=300.0)
    scene = Scene(bh=BlackHole.make(mass=0.5, spin=0.45), background=sky())
    img_l = np.asarray(render_limited(scene, cam, cfg, LCFG))
    img_w = np.asarray(render_image(scene, cam, cfg))
    black_l = int((img_l[..., :3].max(-1) < 1e-3).sum())
    black_w = int((img_w[..., :3].max(-1) < 1e-3).sum())
    assert black_w > 100
    assert abs(black_l - black_w) <= 4, (black_l, black_w)
