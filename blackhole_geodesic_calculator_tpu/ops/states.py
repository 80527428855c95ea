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

    x, p        : position / spatial covariant momentum, (..., 3)
    E           : conserved energy -p_t, set once by the null condition
    lam         : accumulated affine parameter (ref: curve length)
    status      : termination taxonomy above
    hit_point   : event location (disk crossing / sphere hit point), (..., 3)
    hit_normal  : surface normal at a sphere hit, (..., 3)
    hit_obj     : sphere index for OBJECT hits, else -1
    """

    x: Array
    p: Array
    E: Array
    lam: Array
    status: Array
    hit_point: Array
    hit_normal: Array
    hit_obj: Array

    @property
    def active(self) -> Array:
        return self.status == ACTIVE


def init_state(x0: Array, p0: Array, E: Array) -> RayState:
    batch = x0.shape[:-1]
    dtype = x0.dtype
    return RayState(
        x=x0,
        p=p0,
        E=E,
        lam=jnp.zeros(batch, dtype),
        status=jnp.zeros(batch, jnp.int32),
        hit_point=jnp.zeros(batch + (3,), dtype),
        hit_normal=jnp.zeros(batch + (3,), dtype),
        hit_obj=jnp.full(batch, -1, jnp.int32),
    )
