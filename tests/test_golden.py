"""Golden-image regression tests -- miniaturized BASELINE.json configs.

The reference validates visually (SURVEY.md §4); here the same scenes are
pinned as checked-in golden renders.  Goldens are generated on the CPU mesh
(deterministic: pixel-center rays, fixed seeds) the first time this file
runs with REGEN_GOLDEN=1; afterwards any drift beyond loose f32 tolerance
fails.  Configs mirror BASELINE.json:

  1. Schwarzschild hole vs procedural sky (config 1)
  2. textured sphere behind the hole -> Einstein ring (config 2)
  3. accretion disk at inclination + two moons (config 3)
  4. Kerr a = 0.9
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_geodesic_calculator_tpu.camera import Camera
from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
from blackhole_geodesic_calculator_tpu.render import RenderConfig, render_image
from blackhole_geodesic_calculator_tpu.scene import (
    BlackHole, Disk, Scene, Spheres,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def sky():
    h, w = 32, 64
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return jnp.asarray(np.stack([
        0.5 + 0.5 * np.sin(2 * np.pi * u / w) * np.sin(np.pi * v / h),
        v / h,
        ((u // 8 + v // 8) % 2).astype(np.float32)], -1), jnp.float32)


CFG = RenderConfig(width=64, height=64, samples=1,
                   integrator=IntegratorConfig(n_steps=400, dt=0.08,
                                               backend="scan"),
                   lam_max=120.0)

DISK_TEX = jnp.broadcast_to(jnp.asarray([1.0, 0.6, 0.2]), (8, 32, 3))
MOON_TEX = jnp.broadcast_to(jnp.asarray([0.2, 1.0, 0.2]), (2, 8, 8, 3))


def scenes():
    yield "schwarzschild_sky", (
        Scene(bh=BlackHole.make(mass=0.5), background=sky()),
        Camera.make(position=(0.0, 0.0, 20.0), fov=(0.7, 0.7)))
    yield "einstein_ring", (
        Scene(bh=BlackHole.make(mass=0.5), background=sky(),
              spheres=Spheres.make(center=[[0.0, 0.0, -12.0]], radius=[1.0],
                                   texture=MOON_TEX[:1])),
        Camera.make(position=(0.0, 0.0, 20.0), fov=(0.9, 0.9)))
    yield "disk_and_moons", (
        Scene(bh=BlackHole.make(mass=0.5), background=sky(),
              disk=Disk.make(r_in=2.0, r_out=6.0, texture=DISK_TEX),
              spheres=Spheres.make(
                  center=[[6.0, 2.0, 6.0], [-5.0, -2.0, -8.0]],
                  radius=[0.8, 0.8], texture=MOON_TEX)),
        Camera.make(position=(0.0, 6.0, 19.0), euler=(-0.3, 0.0, 0.0),
                    fov=(0.9, 0.9)))
    # "a09" = DIMENSIONLESS spin a/M = 0.9 (the reference's Kerr pkl naming,
    # RelativisticRenderEngineCamEdition.py:216-221).  Scene.spin is the
    # dimensionFUL Kerr-Schild a = J/M, so with M = 0.5 it is 0.45 here.
    yield "kerr_a09", (
        Scene(bh=BlackHole.make(mass=0.5, spin=0.45), background=sky()),
        Camera.make(position=(20.0, 0.0, 0.0),
                    euler=(0.0, np.pi / 2, 0.0), fov=(0.7, 0.7)))


@pytest.mark.parametrize("name_scene", list(scenes()),
                         ids=lambda ns: ns[0])
def test_golden(name_scene):
    name, (scene, cam) = name_scene
    img = np.asarray(render_image(scene, cam, CFG))
    assert np.isfinite(img).all()
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        pytest.skip(f"golden regenerated: {path}")
    with np.load(path) as z:
        ref = z["img"].astype(np.float32)
    # f16 storage + backend drift tolerance; the mean bound is the real
    # guard, the max bound allows isolated critical-curve pixels to move
    diff = np.abs(img - ref)
    assert diff.mean() < 2e-3, f"{name}: mean drift {diff.mean():.2e}"
    assert (diff > 0.1).mean() < 0.01, (
        f"{name}: {100 * (diff > 0.1).mean():.2f}% of pixels moved > 0.1")
