"""Differentiable-rendering tests: pixel gradients vs finite differences.

The reference has no gradients at all; this is the framework's headline
capability (BASELINE.md: "pixel gradients match finite differences").
Discrete events (capture boundary, disk edge) make the image piecewise
smooth, so FD checks run at configurations away from event boundaries.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_geodesic_calculator_tpu.camera import Camera
from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
from blackhole_geodesic_calculator_tpu.render import RenderConfig, render_image
from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene


def sky():
    """Smooth test sky that is continuous AS A FUNCTION ON THE SPHERE:
    periodic in u (the equirect azimuth wraps at phi=+-pi) and constant along
    u at the poles (v=0,1), like any real HDRI.  Without this, FD-vs-AD
    comparisons fail at pixels whose lensed exit direction crosses the seam or
    a pole -- the azimuth jumps by pi there and a texture that varies with u at
    the pole row jumps color, a discontinuity of the *test texture*, not of the
    renderer."""
    h, w = 16, 32
    v = jnp.linspace(0.0, 1.0, h)[:, None]
    u = jnp.linspace(0.0, 1.0, w, endpoint=False)[None, :]
    uc = 0.5 + 0.5 * jnp.sin(2.0 * jnp.pi * u) * jnp.sin(jnp.pi * v)
    return jnp.stack([jnp.broadcast_to(uc, (h, w)),
                      jnp.broadcast_to(v, (h, w)),
                      0.5 * jnp.ones((h, w))], axis=-1)


CFG = RenderConfig(
    width=16, height=16, samples=1,
    integrator=IntegratorConfig(n_steps=400, dt=0.1, dt_boost=8.0),
    lam_max=100.0,
)


def _smooth_mask(n=16, hole_px=5.0):
    """Static pixel mask excluding the shadow neighborhood: the capture
    boundary is a true discontinuity (AD sees zero there, FD sees the jump),
    so the FD comparison is run on the smooth lensed-background region."""
    yy, xx = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    r2 = (yy - n // 2) ** 2 + (xx - n // 2) ** 2
    return (r2 > hole_px**2).astype(jnp.float32)[..., None]


def loss_fn(mass, cam_z, tex):
    scene = Scene(bh=BlackHole.make(mass=mass), background=tex)
    cam = Camera.make(position=(0.0, 0.0, cam_z), fov=(0.5, 0.5))
    cam = dataclasses.replace(
        cam, position=jnp.stack([jnp.zeros(()), jnp.zeros(()), cam_z]))
    img = render_image(scene, cam, CFG)
    return jnp.mean(_smooth_mask() * img[..., :3] ** 2)


def test_mass_gradient_matches_fd():
    f = jax.jit(lambda m: loss_fn(m, jnp.asarray(25.0), sky()))
    g = jax.jit(jax.grad(lambda m: loss_fn(m, jnp.asarray(25.0), sky())))
    m0 = jnp.asarray(0.5)
    gm = float(g(m0))
    eps = 1e-2
    fd = (float(f(m0 + eps)) - float(f(m0 - eps))) / (2 * eps)
    assert np.isfinite(gm) and abs(gm) > 1e-6
    np.testing.assert_allclose(gm, fd, rtol=0.1)


def test_camera_gradient_matches_fd():
    f = jax.jit(lambda z: loss_fn(jnp.asarray(0.5), z, sky()))
    g = jax.jit(jax.grad(lambda z: loss_fn(jnp.asarray(0.5), z, sky())))
    z0 = jnp.asarray(25.0)
    gz = float(g(z0))
    eps = 1e-1
    fd = (float(f(z0 + eps)) - float(f(z0 - eps))) / (2 * eps)
    assert np.isfinite(gz) and abs(gz) > 1e-8
    np.testing.assert_allclose(gz, fd, rtol=0.15)


def test_texture_gradient_flows():
    g = jax.jit(jax.grad(
        lambda t: loss_fn(jnp.asarray(0.5), jnp.asarray(25.0), t)))(sky())
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()
