"""Multi-device sharded rendering.

Replaces the reference's absent parallel runtime (SURVEY.md §2.2: an
abandoned ``mp.Pool`` block at
/root/reference/raytracer/RelativisticRenderEngine.py:210-216 and per-frame
cluster job farming) with SPMD over a ``jax.sharding.Mesh`` via
``shard_map`` -- explicit per-device programs with explicit collectives,
which (unlike sharding-annotation auto-partitioning) also composes with the
Pallas integrator kernels, since each device simply runs its local
``pallas_call``:

* the flat pixel batch is sharded over the ``rays`` mesh axis;
* multisample jitters are sharded over the ``samples`` axis and reduced
  with one ``pmean`` riding the ICI;
* scene/camera parameters are replicated (a few KB);
* a **load-balancing shuffle**: cost per ray is wildly nonuniform (shadow
  rays capture in a few steps, photon-sphere grazers need thousands --
  reference ``nr_points_curve=10000``), so pixels are dealt round-robin
  across shards before the solve and unpermuted after.  Contiguous row
  blocks would make the shard containing the photon ring the straggler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..camera.pinhole import Camera
from ..render.renderer import RenderConfig, render_rays
from ..scene.scene import Scene
from .mesh import RAY_AXIS, SAMPLE_AXIS, make_mesh, put_global

Array = jax.Array


def _flat_pixels(cfg: RenderConfig, n_shards: int):
    """Flattened (ys, xs) of the crop window, dealt round-robin over shards
    and padded so every shard gets the same count.  Returns (ys, xs, perm,
    n_valid) -- ``perm[i]`` is the flat crop-pixel index that ray slot i
    serves, so colors scatter back with ``out.at[perm].set(rgb)``."""
    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0
    n = hc * wc
    pad = (-n) % n_shards
    total = n + pad
    # Round-robin deal: slot (s, j) -> pixel j * n_shards + s.  Neighboring
    # pixels (similar geodesic cost) land on different shards.
    slot = jnp.arange(total)
    per = total // n_shards
    perm = (slot % per) * n_shards + slot // per
    perm = jnp.where(perm < n, perm, 0)  # padding slots re-trace pixel 0
    ys = y0 + perm // wc
    xs = x0 + perm % wc
    return ys, xs, perm, n


@functools.lru_cache(maxsize=64)
def _sharded_render_fn(mesh: Mesh, cfg: RenderConfig, multisample: bool):
    """Build the shard_map'd per-device render program."""

    def local(scene, cam, keys, ys, xs):
        if not multisample:
            return render_rays(scene, cam, cfg, ys, xs, None)
        rgb = jnp.mean(
            jax.vmap(lambda k: render_rays(scene, cam, cfg, ys, xs, k))(keys),
            axis=0,
        )
        return jax.lax.pmean(rgb, SAMPLE_AXIS)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(SAMPLE_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    ))


def render_image_sharded(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    mesh: Mesh | None = None,
    key: Array | None = None,
) -> Array:
    """Full multisampled render on a device mesh -> (H, W, 4) RGBA.

    Pixel-exact with the single-device ``render_image`` for samples == 1
    (same pixel-center rays, same integrator); multisample jitters differ
    only in RNG fan-out order.
    """
    if mesh is None:
        mesh = make_mesh()
    n_ray = mesh.shape[RAY_AXIS]
    n_smp = mesh.shape[SAMPLE_AXIS]
    if cfg.samples % n_smp != 0:
        raise ValueError(
            f"samples={cfg.samples} must be a multiple of the mesh "
            f"'{SAMPLE_AXIS}' extent {n_smp}"
        )

    ys, xs, perm, _ = _flat_pixels(cfg, n_ray)
    shard = NamedSharding(mesh, P(RAY_AXIS))
    repl = NamedSharding(mesh, P())
    ys = put_global(ys, shard)
    xs = put_global(xs, shard)
    scene = put_global(scene, repl)
    cam = put_global(cam, repl)

    multisample = not (cfg.samples == 1 and key is None)
    if multisample:
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        keys = put_global(
            jax.random.split(key, cfg.samples),
            NamedSharding(mesh, P(SAMPLE_AXIS)),
        )
    else:
        # dummy replicated-shape keys array (unused)
        keys = put_global(
            jnp.zeros((n_smp, 2), jnp.uint32),
            NamedSharding(mesh, P(SAMPLE_AXIS)),
        )

    fn = _sharded_render_fn(mesh, cfg, multisample)
    rgb = fn(scene, cam, keys, ys, xs)

    return _assemble_fn(mesh, cfg)(rgb, put_global(perm, repl))


def render_stokes_sharded(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    mesh: Mesh | None = None,
):
    """Polarized (Stokes) render sharded over the ``rays`` mesh axis -- the
    multi-device form of ``render.render_stokes``, sharing its physical
    model and conventions (renderer.stokes_rays) and this module's
    round-robin load-balancing deal.  Same rays and integrator as the
    single-device path (deterministic pixel-center rays, no jitter); agrees
    to f32 compilation noise -- per-shard fusion differences can amplify on
    near-critical rays.  Returns
    (rgb (Hc, Wc, 3), Q (Hc, Wc), U (Hc, Wc)) over the crop window,
    replicated on every device/host."""
    from ..render.renderer import stokes_rays

    if mesh is None:
        mesh = make_mesh()
    n_ray = mesh.shape[RAY_AXIS]

    ys, xs, perm, _ = _flat_pixels(cfg, n_ray)
    shard = NamedSharding(mesh, P(RAY_AXIS))
    repl = NamedSharding(mesh, P())
    ys = put_global(ys, shard)
    xs = put_global(xs, shard)
    scene = put_global(scene, repl)
    cam = put_global(cam, repl)

    local = jax.jit(shard_map(
        lambda sc, c, ys_, xs_: stokes_rays(sc, c, cfg, ys_, xs_),
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    ))
    rgb, q, u = local(scene, cam, ys, xs)

    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0

    def assemble(rgb, q, u, perm):
        rgb_f = jnp.zeros((hc * wc, 3), rgb.dtype).at[perm].set(rgb)
        q_f = jnp.zeros((hc * wc,), q.dtype).at[perm].set(q)
        u_f = jnp.zeros((hc * wc,), u.dtype).at[perm].set(u)
        return (rgb_f.reshape(hc, wc, 3), q_f.reshape(hc, wc),
                u_f.reshape(hc, wc))

    return jax.jit(assemble, out_shardings=(repl, repl, repl))(
        rgb, q, u, put_global(perm, repl))


def polarization_map_sharded(
    scene: Scene,
    cam: Camera,
    cfg: RenderConfig,
    mesh: Mesh | None = None,
) -> Array:
    """Polarization rotation map sharded over the ``rays`` mesh axis --
    the multi-device form of ``render.polarization_map``, and the intended
    entry point for large KERR maps (the per-pixel parallel-transport ODE
    is ~40x the render path's flops; see renderer.polarization_rays).
    Pixel-exact with the single-device map (deterministic, no jitter).
    Returns (Hc, Wc) with NaN at captured/error pixels."""
    from ..render.renderer import polarization_rays

    if mesh is None:
        mesh = make_mesh()
    n_ray = mesh.shape[RAY_AXIS]

    ys, xs, perm, _ = _flat_pixels(cfg, n_ray)
    shard = NamedSharding(mesh, P(RAY_AXIS))
    repl = NamedSharding(mesh, P())
    ys = put_global(ys, shard)
    xs = put_global(xs, shard)
    scene = put_global(scene, repl)
    cam = put_global(cam, repl)

    local = jax.jit(shard_map(
        lambda sc, c, ys_, xs_: polarization_rays(sc, c, cfg, ys_, xs_),
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    ))
    ang = local(scene, cam, ys, xs)

    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0

    def assemble(ang, perm):
        return jnp.full((hc * wc,), jnp.nan, ang.dtype).at[perm].set(
            ang).reshape(hc, wc)

    return jax.jit(assemble, out_shardings=repl)(ang, put_global(perm, repl))


@functools.lru_cache(maxsize=64)
def _assemble_fn(mesh: Mesh, cfg: RenderConfig):
    """Framebuffer assembly (the reference's progressive buffer write,
    RelativisticRenderEngine.py:162): unpermute and fill the frame.  Jitted
    with a REPLICATED output so it works when the mesh spans processes --
    XLA inserts the all-gather and every host ends up with the full frame
    (the multi-host counterpart of the reference's update_result flush).
    Cached per (mesh, cfg) like _sharded_render_fn, so warm render loops
    don't re-trace/re-compile the assembly every call."""
    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0
    repl = NamedSharding(mesh, P())

    def assemble(rgb, perm):
        flat = jnp.zeros((hc * wc, 3), rgb.dtype).at[perm].set(rgb)
        full = jnp.ones((cfg.height, cfg.width, 4), rgb.dtype)
        return full.at[y0:y1, x0:x1, :3].set(flat.reshape(hc, wc, 3))

    return jax.jit(assemble, out_shardings=repl)
