"""Differentiable texture sampling.

The reference leans on Blender's CPU texture engine --
``bpy.data.textures[...].evaluate((x, y, 0))`` with coordinates in the
[-1, 1] box (background lookup at
/root/reference/raytracer/RelativisticRenderEngine.py:375, disk lookup at
LimitedRelativisticRenderEngine.py:434, moon UV at :357) -- costing a
Python<->C++ FFI crossing per pixel.  Here a texture is just a jnp array
(H, W, 3) and sampling is a batched bilinear gather: differentiable w.r.t.
the texture contents (texture optimization/inverse rendering) and fused by
XLA into the shading program.

Coordinate convention matches ``bpy`` evaluate: x, y in [-1, 1], x wraps
(image textures repeat), y = -1 is the bottom image row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# arccos has an infinite derivative at +-1; rays aligned with the poles (the
# exact center pixel of a hole-centered camera, radial rays) would poison
# gradients through jnp.where (the unselected branch still differentiates).
_ACOS_EPS = 1e-6


def safe_arccos(x: Array) -> Array:
    return jnp.arccos(jnp.clip(x, -1.0 + _ACOS_EPS, 1.0 - _ACOS_EPS))


def safe_arctan2(y: Array, x: Array) -> Array:
    """atan2 whose gradient is finite at (0, 0) -- exactly polar directions
    (radial rays through the camera axis) have undefined azimuth anyway."""
    deg = (jnp.abs(x) < _ACOS_EPS) & (jnp.abs(y) < _ACOS_EPS)
    return jnp.arctan2(jnp.where(deg, 0.0, y), jnp.where(deg, 1.0, x))


def sample_bpy(tex: Array, x: Array, y: Array) -> Array:
    """Bilinear sample at bpy-style coords; tex (H, W, C), x/y (...,)."""
    h, w = tex.shape[0], tex.shape[1]
    # [-1, 1] -> continuous pixel coords; y flipped (row 0 is the top).
    fx = (x + 1.0) * 0.5 * w - 0.5
    fy = (1.0 - y) * 0.5 * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    xi0 = jnp.mod(x0, w)
    xi1 = jnp.mod(x0 + 1, w)
    yi0 = jnp.clip(y0, 0, h - 1)
    yi1 = jnp.clip(y0 + 1, 0, h - 1)

    c00 = tex[yi0, xi0]
    c01 = tex[yi0, xi1]
    c10 = tex[yi1, xi0]
    c11 = tex[yi1, xi1]
    top = c00 * (1.0 - tx) + c01 * tx
    bot = c10 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty


def sample_equirect(tex: Array, direction: Array) -> Array:
    """Equirectangular environment lookup from a unit direction.

    Exactly the reference mapping (RelativisticRenderEngine.py:373-375):
        theta = 1 - arccos(d_z)/pi
        phi   = atan2(d_y, d_x)/pi
        color = tex.evaluate((-phi, 2*theta - 1))
    """
    theta = 1.0 - safe_arccos(direction[..., 2]) / jnp.pi
    phi = safe_arctan2(direction[..., 1], direction[..., 0]) / jnp.pi
    return sample_bpy(tex, -phi, 2.0 * theta - 1.0)


def sphere_uv_bpy(normal: Array, compat_arctan: bool = True) -> tuple[Array, Array]:
    """Spherical UV of a unit normal, reference emission-shader convention
    (LimitedRelativisticRenderEngine.py:353-357):
        th = arccos(n_z); ph = arctan(n_y/n_x)   [note: arctan, not atan2]
        coords = (ph/(2 pi), th/pi)
    ``compat_arctan=False`` upgrades to atan2 (full 360-degree seamless wrap).
    """
    th = safe_arccos(normal[..., 2])
    if compat_arctan:
        ph = jnp.arctan(normal[..., 1] / jnp.where(
            jnp.abs(normal[..., 0]) > 1e-20, normal[..., 0], 1e-20))
    else:
        ph = jnp.arctan2(normal[..., 1], normal[..., 0])
    return ph / (2.0 * jnp.pi), th / jnp.pi
