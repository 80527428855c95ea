"""Polarization transport along Schwarzschild null geodesics.

The reference lists "Add polarisation" among its open milestones
(/root/reference/README.md:217-220, unchecked); this module implements it
exactly for the Schwarzschild case, batched and differentiable.

Physics: a photon's polarization vector is parallel-transported along the
null geodesic (f.k = 0 preserved, gauge f ~ f + alpha k).  In a spherically
symmetric spacetime every null geodesic is PLANAR (the orbital plane normal
n = x cross k / |x cross k| is conserved), the plane is totally geodesic,
and reflection symmetry through it forces the transported polarization to
keep constant components in the orthonormal frame

    e_out = n                  (out of the orbital plane)
    e_in  = unit(d cross n)    (in plane, orthogonal to the ray)

i.e. Schwarzschild produces NO gravitational Faraday rotation relative to
the plane-of-motion basis (Plebanski 1960); the observable polarization
rotation is purely the geometric rotation of e_in as the ray bends.  This
closed form is exact -- no extra ODE is integrated, so the feature costs
nothing on top of the geodesic solve.

Kerr is NOT covered here: frame dragging rotates polarization relative to
this basis (the Walker-Penrose constant would be needed); passing
spin != 0 state into these helpers is a physics error, guarded at the
renderer-level entry point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def _unit(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def plane_normal(x: Array, d: Array) -> Array:
    """Conserved orbital-plane normal n = unit(x cross d); for radial rays
    (|x cross d| ~ 0, which do not bend) an arbitrary fixed normal is
    returned so downstream math stays finite."""
    n = jnp.cross(x, d)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    radial = nn < 1e-8
    # any unit vector orthogonal to d works for a radial (undeflected) ray
    alt = jnp.cross(d, jnp.where(
        jnp.abs(d[..., :1]) < 0.9,
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), d.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), d.shape)))
    return _unit(jnp.where(radial, alt, n))


def transport_polarization(x0: Array, d0: Array, f0: Array,
                           d1: Array) -> Array:
    """Transport polarization ``f0`` (unit, orthogonal to ``d0``) from the
    launch state (x0, d0) to the escape direction ``d1``.

    Exact for Schwarzschild: decompose f0 in the (e_out, e_in) frame at
    launch; rebuild with the SAME components in the frame at escape.
    Returns a unit vector orthogonal to d1.
    """
    n = plane_normal(x0, d0)
    e_in0 = _unit(jnp.cross(d0, n))
    e_in1 = _unit(jnp.cross(d1, n))
    a = jnp.sum(f0 * n, axis=-1, keepdims=True)
    b = jnp.sum(f0 * e_in0, axis=-1, keepdims=True)
    f1 = a * n + b * e_in1
    # exact orthogonality to d1 (float cleanup of the frame construction)
    f1 = f1 - jnp.sum(f1 * d1, axis=-1, keepdims=True) * d1
    return _unit(f1)


def polarization_rotation(x0: Array, d0: Array, d1: Array) -> Array:
    """Rotation angle (radians) of the in-plane polarization basis from
    launch to escape -- the per-pixel observable of a polarization map.
    Equals the deflection angle signed within the orbital plane; exactly 0
    in the flat limit."""
    n = plane_normal(x0, d0)
    cos = jnp.clip(jnp.sum(d0 * d1, axis=-1), -1.0, 1.0)
    # signed by the plane orientation: sin = (d0 cross d1) . n
    sin = jnp.sum(jnp.cross(d0, d1) * n, axis=-1)
    return jnp.arctan2(sin, cos)
