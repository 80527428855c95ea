"""Spacetime metric families (the framework's "model zoo").

flat          -- Minkowski validation metric (reference metric='flat').
schwarzschild -- reference default spacetime, two Cartesian charts.
kerr          -- spinning hole, Kerr-Schild form (reference Gen-3 `a` param).
"""

from .metric import Metric
from .flat import flat_metric, ETA
from .schwarzschild import (
    schwarzschild_cartesian_metric,
    schwarzschild_ks_metric,
)
from .kerr import kerr_ks_metric, ks_radius, ks_scalars, horizon_radius

__all__ = [
    "Metric",
    "flat_metric",
    "ETA",
    "schwarzschild_cartesian_metric",
    "schwarzschild_ks_metric",
    "kerr_ks_metric",
    "ks_radius",
    "ks_scalars",
    "horizon_radius",
]
