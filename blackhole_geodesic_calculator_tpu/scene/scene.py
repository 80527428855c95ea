"""Scene description -- pure data, replacing the Blender depsgraph.

The reference reads its scene from Blender objects and scene properties: a
pointer to the black-hole object, sphere meshes tagged "isBH", lamp objects,
disk scene properties, a sky image path
(/root/reference/raytracer/RelativisticRenderEngine.py:50-118 and the PROPS
registry :504-517, LimitedRelativisticRenderEngine.py:486-506).  Here the
scene is a pytree of jnp leaves, so every physical quantity -- mass, spin,
camera pose, sphere centers, disk parameters, texture contents, light
positions -- is differentiable and shardable by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def _f(v):
    return jnp.asarray(v, jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlackHole:
    """mass (r_s = 2M, geometrized; reference default 0.5 =>
    RelativisticRenderEngine.py:506), Kerr spin a (None = Schwarzschild fast
    path), and world location (reference blackhole_obj.location, :96-99)."""

    mass: Any
    loc: Any
    spin: Any = None

    @classmethod
    def make(cls, mass=0.5, loc=(0.0, 0.0, 0.0), spin=None):
        return cls(mass=_f(mass), loc=_f(loc),
                   spin=None if spin is None else _f(spin))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Disk:
    """z=0 annulus accretion disk, the reference model at
    LimitedRelativisticRenderEngine.py:413-438 with scene props
    disk_R_in/R_out/phase/mean/stddev/intensity (:52-58, PROPS :492-498).
    Radii are in Schwarzschild-radius units scaled by the caller, matching
    ``disk_R_in * ratio`` semantics at :284-285."""

    r_in: Any
    r_out: Any
    phase: Any
    mean: Any
    stddev: Any
    intensity: Any
    texture: Any  # (H, W, 3)
    # Relativistic beaming (BEYOND the reference -- its "Add redshift"
    # milestone is unchecked, reference README.md:217-220).  None disables
    # statically (exact reference parity).  A number enables Keplerian
    # disk kinematics and scales emission by g**beaming where
    # g = E_inf / E_emitted is the combined gravitational + Doppler shift
    # (4.0 = bolometric invariant I ~ g^4, 3.0 = photon-count).
    beaming: Any = None
    orbit_dir: Any = None  # +1 prograde (default), -1 retrograde
    # Intrinsic polarization degree of the disk emission (BEYOND the
    # reference -- its "Add polarisation" milestone is unchecked, reference
    # README.md:217-220).  None disables (unpolarized, exact reference
    # parity).  A number q in [0, 1] gives emitted polarization degree
    # q sin^2(theta_em) with E-vector along the projection of the disk
    # normal transverse to the photon (the scattering-atmosphere
    # orientation; zero face-on, maximal edge-on).  Consumed by
    # render.render_stokes.
    pol_frac: Any = None

    @classmethod
    def make(cls, r_in, r_out, texture, phase=0.0, mean=0.5, stddev=0.2,
             intensity=1.0, beaming=None, orbit_dir=1.0, pol_frac=None):
        return cls(r_in=_f(r_in), r_out=_f(r_out), phase=_f(phase),
                   mean=_f(mean), stddev=_f(stddev), intensity=_f(intensity),
                   texture=_f(texture),
                   beaming=None if beaming is None else _f(beaming),
                   orbit_dir=_f(orbit_dir),
                   pol_frac=None if pol_frac is None else _f(pol_frac))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Spheres:
    """K textured/emissive spheres (the reference's moon/star meshes shaded by
    normal_hit, LimitedRelativisticRenderEngine.py:338-380).  ``emission``
    selects the reference's emission branch (spherical-UV texture lookup) per
    sphere; non-emissive spheres get the Lambertian lamp model."""

    center: Any          # (K, 3)
    radius: Any          # (K,)
    emission: Any        # (K,) float 0/1 mask
    albedo: Any          # (K, 3) base color for the Lambert branch
    texture: Any         # (K, Ht, Wt, 3) emission textures (stacked)

    @classmethod
    def make(cls, center, radius, texture, emission=None, albedo=None):
        center = _f(center)
        k = center.shape[0]
        if emission is None:
            emission = jnp.ones((k,), jnp.float32)
        if albedo is None:
            albedo = jnp.ones((k, 3), jnp.float32)
        return cls(center=center, radius=_f(radius), emission=_f(emission),
                   albedo=_f(albedo), texture=_f(texture))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Lights:
    """Point lamps for the Lambertian branch (reference collects all LIGHT
    objects, LimitedRelativisticRenderEngine.py:168, and shades with
    intensity^2 * (n.l)/d^2 -- note the reference multiplies base_color by
    intensity twice at :361+:378; reproduced faithfully)."""

    position: Any    # (L, 3)
    intensity: Any   # scalar, reference default 10 (:338)

    @classmethod
    def make(cls, position, intensity=10.0):
        return cls(position=_f(position), intensity=_f(intensity))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    """Full differentiable scene; None fields statically disable features."""

    bh: BlackHole
    background: Any = None       # (H, W, 3) equirect sky or None
    disk: Disk | None = None
    spheres: Spheres | None = None
    lights: Lights | None = None
