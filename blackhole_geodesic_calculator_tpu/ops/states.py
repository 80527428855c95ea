"""Per-ray state and termination taxonomy.

The reference communicates ray outcomes through a status dict from curvedpy --
``hit_blackhole``, ``start_inside_hole``, ``error: 'Outside'`` -- plus implicit
outcomes decided by the shading dispatch (disk crossing, object hit, background)
(/root/reference/raytracer/RelativisticRenderEngine.py:296-313,
LimitedRelativisticRenderEngine.py:259-335).  Here the same taxonomy is a dense
int32 status array carried through the integrator, so classification is
branchless and sharded with the rays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array

# Status codes (order matters only for readability; comparisons are explicit).
ACTIVE = 0        # still integrating
CAPTURED = 1      # crossed the horizon -> black (ref: hit_blackhole)
ESCAPED = 2       # left the domain r > r_escape -> background lookup
BUDGET = 3        # affine budget exhausted (ref: curve_end/integration_depth)
DISK = 4          # crossed the accretion-disk annulus (ref: checkHitDisk)
OBJECT = 5        # hit a scene sphere (ref: Blender ray_cast + normal_hit)
INSIDE_HORIZON = 6  # ray *started* inside the horizon (ref: start_inside_hole)
ERROR = 7         # non-finite state: rendered as red, like ref 'Outside' rays


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RayState:
    """Structure-of-arrays state for a batch of rays; all leaves share (...,).

    x, p        : position / spatial covariant momentum, (..., 3).
                  For DISK/OBJECT rays ``x`` IS the event point: the
                  integrator freezes the ray at the interpolated crossing
                  (not at the post-step state), so every geometric shading
                  input -- disk radius/azimuth, sphere normal
                  normalize(x - center) -- is a differentiable function of
                  (x, p) alone and the whole gradient surface of the
                  integrator is just (x-bar, p-bar).
    E           : conserved energy -p_t, set once by the null condition
    lam         : accumulated affine parameter (ref: curve length);
                  event rays get the interpolated fraction of the last step
    status      : termination taxonomy above
    hit_obj     : sphere index for OBJECT hits, else -1
    """

    x: Array
    p: Array
    E: Array
    lam: Array
    status: Array
    hit_obj: Array

    @property
    def active(self) -> Array:
        return self.status == ACTIVE

    def hit_normal(self, centers: Array) -> Array:
        """Outward unit normal at a sphere hit: normalize(x - center[obj]).

        Derived, not stored: keeps the integrator carry minimal and the
        normal exactly consistent with the differentiable hit point.
        """
        obj = jnp.clip(self.hit_obj, 0, centers.shape[0] - 1)
        n = self.x - centers[obj]
        return n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20
        )


def init_state(x0: Array, p0: Array, E: Array) -> RayState:
    batch = x0.shape[:-1]
    dtype = x0.dtype
    return RayState(
        x=x0,
        p=p0,
        E=E,
        lam=jnp.zeros(batch, dtype),
        status=jnp.zeros(batch, jnp.int32),
        hit_obj=jnp.full(batch, -1, jnp.int32),
    )
