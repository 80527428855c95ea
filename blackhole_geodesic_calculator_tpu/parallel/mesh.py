"""Device-mesh construction for ray-sharded rendering.

The reference's entire distributed story is file-level frame farming on the
Snellius cluster plus a commented-out ``multiprocessing.Pool``
(/root/reference/raytracer/RelativisticRenderEngine.py:210-216,
README.md:238-240).  Here distribution is first-class SPMD: a
``jax.sharding.Mesh`` with a ``samples`` axis (multisample parallel) and a
``rays`` axis (pixel-batch data parallel); per-ray state is 8 floats so the
ray axis is embarrassingly parallel and collectives only appear where physics
demands them -- the multisample mean (psum over ``samples``) and parameter
gradients in training (psum over both axes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "samples"
RAY_AXIS = "rays"


def make_mesh(devices=None, sample_parallel: int = 1) -> Mesh:
    """Mesh over ``devices`` (default: all), shaped (samples, rays).

    ``sample_parallel`` devices cooperate on different multisample jitters of
    the same pixels; the rest shard the pixel batch.  ``sample_parallel=1``
    (the default) is pure ray-data-parallel.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % sample_parallel != 0:
        raise ValueError(
            f"sample_parallel={sample_parallel} must divide device count {n}"
        )
    arr = np.asarray(devices).reshape(sample_parallel, n // sample_parallel)
    return Mesh(arr, (SAMPLE_AXIS, RAY_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a flat ray-major array: first axis split over rays."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """``device_put`` that also works when ``sharding`` spans processes.

    Single-process: plain ``jax.device_put``.  Multi-process: every process
    holds the SAME full logical value (pixel grids, replicated scene
    params -- all deterministic), and each contributes its addressable
    shards via ``make_array_from_callback``.  Works on pytrees.
    """
    def put(leaf):
        if jax.process_count() == 1:
            return jax.device_put(leaf, sharding)
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree.map(put, x)
