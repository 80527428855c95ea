"""Kerr metric in Kerr-Schild Cartesian form (spin parameter ``a``).

The reference exposes Kerr spin through its precomputed-camera backend:
``RelativisticCamera(..., a=0.9, ...)`` and pkl ray fields named with
``a_0.0`` / ``a_0.9``
(/root/reference/raytracer/RelativisticRenderEngineCamEdition.py:206-221).
Here Kerr is a first-class metric family:

    g_{mu nu} = eta_{mu nu} + 2 H l_mu l_nu

    H   = M r^3 / (r^4 + a^2 z^2)
    l_mu = (1, (r x + a y)/(r^2 + a^2), (r y - a x)/(r^2 + a^2), z/r)

with the Kerr-Schild radius r(x, y, z) solving

    r^4 - (rho^2 - a^2) r^2 - a^2 z^2 = 0,   rho^2 = x^2 + y^2 + z^2.

``a = 0`` reduces exactly to Schwarzschild in Kerr-Schild form
(models/schwarzschild.py); the chart is horizon-penetrating for |a| < M.
The spin axis is +z, matching the reference's accretion disk plane z = 0
(/root/reference/raytracer/LimitedRelativisticRenderEngine.py:417).
"""

from __future__ import annotations

import jax.numpy as jnp

from .metric import Metric
from .flat import ETA


def ks_radius(x3, a):
    """Kerr-Schild radius r(x, y, z); equals |x3| when a = 0."""
    rho2 = jnp.sum(x3 * x3, axis=-1)
    z2 = x3[..., 2] * x3[..., 2]
    b = rho2 - a * a
    r2 = 0.5 * (b + jnp.sqrt(b * b + 4.0 * a * a * z2))
    return jnp.sqrt(r2)


def ks_scalars(x3, mass, a):
    """(H, l3) -- Kerr-Schild potential and the spatial null covector l_i."""
    r = ks_radius(x3, a)
    x, y, z = x3[..., 0], x3[..., 1], x3[..., 2]
    r2a2 = r * r + a * a
    lx = (r * x + a * y) / r2a2
    ly = (r * y - a * x) / r2a2
    lz = z / r
    H = mass * r**3 / (r**4 + a * a * z * z)
    return H, jnp.stack([lx, ly, lz], axis=-1)


def _g_kerr_ks(x4, mass, a):
    H, l3 = ks_scalars(x4[1:], mass, a)
    l = jnp.concatenate([jnp.ones((1,), x4.dtype), l3])
    return ETA + 2.0 * H * jnp.outer(l, l)


def _g_inv_kerr_ks(x4, mass, a):
    # g^{mu nu} = eta^{mu nu} - 2H l^mu l^nu with l^mu = eta^{mu nu} l_nu
    H, l3 = ks_scalars(x4[1:], mass, a)
    l_up = jnp.concatenate([-jnp.ones((1,), x4.dtype), l3])
    return ETA - 2.0 * H * jnp.outer(l_up, l_up)


def kerr_ks_metric(mass, a) -> Metric:
    return Metric(
        g_fn=_g_kerr_ks, params=(mass, a), name="kerr_ks", g_inv_fn=_g_inv_kerr_ks
    )


def horizon_radius(mass, a):
    """Outer event horizon r_+ = M + sqrt(M^2 - a^2) (Boyer-Lindquist/KS r)."""
    return mass + jnp.sqrt(jnp.maximum(mass * mass - a * a, 0.0))
