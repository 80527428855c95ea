"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the standard JAX way --
``xla_force_host_platform_device_count`` -- which is this framework's
equivalent of the reference's 'flat metric' fake backend for precise
comparisons (reference README.md:233).

Note: this image registers a TPU PJRT plugin in ``sitecustomize`` before
pytest starts, so the env-var route (JAX_PLATFORMS=cpu) alone is not enough;
``jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")`` below overrides the plugin as
long as it runs before the first backend query, which conftest guarantees.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
