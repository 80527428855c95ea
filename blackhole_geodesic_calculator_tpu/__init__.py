"""blackhole_geodesic_calculator_tpu -- a TPU-native differentiable
general-relativistic ray tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
Blender render engines in bldevries/blackhole_geodesic_calculator (see
SURVEY.md): every camera ray is a null-geodesic ODE solve through
Schwarzschild/Kerr spacetime, batched over the whole image, jitted, sharded
and differentiable end to end.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Honor an explicit CPU request even where a sitecustomize
    # force-registers a TPU PJRT plugin (tests/conftest.py semantics):
    # submodule import below touches jnp at module level, which would
    # otherwise finalize the TPU backend before any caller-side
    # jax.config.update can run (e.g. `python -m ...cli profile-train`).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from . import models, ops, scene, camera, render, parallel, utils

__version__ = "0.3.0"
