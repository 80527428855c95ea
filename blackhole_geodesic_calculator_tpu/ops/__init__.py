"""Numerical core: batched geodesic RHS, integrators, event detection."""

from . import states
from .states import RayState, init_state
from .geodesic import (
    null_init,
    timelike_init,
    xdot,
    schwarzschild_rhs,
    ks_rhs,
    hamiltonian,
)
from .polarization import (
    plane_normal,
    polarization_rotation,
    transport_polarization,
)
from .pallas_kernel import integrate_pallas
from .integrate import (
    GeodesicEnv,
    DiskGeom,
    SphereGeom,
    IntegratorConfig,
    integrate,
    integrate_fixed,
    integrate_fixed_fast,
    integrate_adaptive,
    integrate_adaptive_scan,
    launch,
    trajectory,
    final_direction,
    rk4_step,
    dopri_step,
)
