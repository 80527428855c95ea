"""Schwarzschild metric in two Cartesian charts.

The reference backend (curvedpy) integrates null geodesics of the Schwarzschild
metric "in cartesian coordinates" (reference README.md:160-174; instantiated with
``GeodesicIntegratorSchwarzschild(mass, time_like=False)`` at
/root/reference/raytracer/RelativisticRenderEngine.py:134).  Geometrized units,
horizon radius r_s = 2M (RelativisticRenderEngine.py:95), default M = 0.5 so
r_s = 1 (RelativisticRenderEngine.py:506).

Two charts are provided:

1. ``schwarzschild_cartesian_metric`` -- the textbook chart the reference uses:
   the spherical Schwarzschild line element (README.md:160-172) rewritten with
   x = r sin(theta) cos(phi) etc.:

       ds^2 = -f dt^2 + dx.dx + (r_s / (r^3 f)) (x.dx)^2,   f = 1 - r_s/r

   Used for validation/parity; singular at the horizon like the original.

2. ``schwarzschild_ks_metric`` -- the same spacetime in Kerr-Schild form

       g_{mu nu} = eta_{mu nu} + (r_s/r) l_mu l_nu,   l_mu = (1, x/r, y/r, z/r)

   which is horizon-penetrating (no coordinate singularity at r = r_s), so the
   integrator needs no stiffness control near the horizon.  The two charts share
   the *same spatial coordinates* (only t is resummed), hence spatial photon
   trajectories x(lambda), deflection angles, disk crossings and shadow
   boundaries are identical between the charts and identical to the reference's.
   This chart is the default/fast path and generalizes to Kerr (models/kerr.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from .metric import Metric
from .flat import ETA


def _g_schwarzschild_cartesian(x4, mass):
    rs = 2.0 * mass
    x3 = x4[1:]
    r2 = jnp.dot(x3, x3)
    r = jnp.sqrt(r2)
    f = 1.0 - rs / r
    g = jnp.zeros((4, 4)).at[0, 0].set(-f)
    spatial = jnp.eye(3) + (rs / (f * r2 * r)) * jnp.outer(x3, x3)
    return g.at[1:, 1:].set(spatial)


def _g_schwarzschild_ks(x4, mass):
    rs = 2.0 * mass
    x3 = x4[1:]
    r = jnp.sqrt(jnp.dot(x3, x3))
    l = jnp.concatenate([jnp.ones((1,), x4.dtype), x3 / r])
    return ETA + (rs / r) * jnp.outer(l, l)


def _g_inv_schwarzschild_cartesian(x4, mass):
    # g^tt = -1/f;  g^ij = delta_ij - (r_s/r^3) x_i x_j  (closed form)
    rs = 2.0 * mass
    x3 = x4[1:]
    r2 = jnp.dot(x3, x3)
    r = jnp.sqrt(r2)
    f = 1.0 - rs / r
    gi = jnp.zeros((4, 4)).at[0, 0].set(-1.0 / f)
    spatial = jnp.eye(3) - (rs / (r2 * r)) * jnp.outer(x3, x3)
    return gi.at[1:, 1:].set(spatial)


def _g_inv_schwarzschild_ks(x4, mass):
    # g^{mu nu} = eta^{mu nu} - (r_s/r) l^mu l^nu with l^mu = (-1, x/r)
    rs = 2.0 * mass
    x3 = x4[1:]
    r = jnp.sqrt(jnp.dot(x3, x3))
    l_up = jnp.concatenate([-jnp.ones((1,), x4.dtype), x3 / r])
    return ETA - (rs / r) * jnp.outer(l_up, l_up)


def schwarzschild_cartesian_metric(mass) -> Metric:
    return Metric(
        g_fn=_g_schwarzschild_cartesian,
        params=(mass,),
        name="schwarzschild",
        g_inv_fn=_g_inv_schwarzschild_cartesian,
    )


def schwarzschild_ks_metric(mass) -> Metric:
    return Metric(
        g_fn=_g_schwarzschild_ks,
        params=(mass,),
        name="schwarzschild_ks",
        g_inv_fn=_g_inv_schwarzschild_ks,
    )
