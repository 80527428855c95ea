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
    serves; framebuffer assembly uses the static inverse (_inv_perm) as a
    GATHER ``rgb[inv]`` (the scatter form serializes on TPU)."""
    return _flat_pixels_cached(cfg, n_shards)


@functools.lru_cache(maxsize=64)
def _flat_pixels_cached(cfg: RenderConfig, n_shards: int):
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
def _inv_perm(cfg: RenderConfig, n_shards: int):
    """Static inverse of the round-robin deal: ``inv[pixel]`` is the ray
    slot that serves flat crop pixel ``pixel``.  Computed on the host so
    framebuffer assembly is a GATHER ``out = rgb[inv]`` -- on TPU an
    arbitrary-index scatter ``zeros.at[perm].set(rgb)`` runs on the slow
    serial scatter unit (measured 41 ms for a 1024^2 frame, 3x the render
    itself), while the equivalent gather vectorizes (<1 ms).  Padding slots
    re-trace pixel 0, so duplicate writes during inversion are benign (all
    candidates hold pixel 0's color)."""
    import numpy as np

    # Invert the SAME perm _flat_pixels_cached deals (rather than
    # re-deriving the formula, which could silently drift from the deal).
    _, _, perm, n = _flat_pixels_cached(cfg, n_shards)
    perm = np.asarray(perm)
    inv = np.zeros(n, np.int32)
    inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
    return inv


@functools.lru_cache(maxsize=64)
def _sharded_pixels(mesh: Mesh, cfg: RenderConfig):
    """Device-resident sharded pixel plumbing, cached per (mesh, cfg):
    (ys, xs) sharded over the ray axis and the replicated gather-back
    ``inv`` (see _inv_perm).  The grids are deterministic functions of the
    static config, so warm render/train loops skip the per-call
    host->device puts and the index math entirely -- without this, dispatch
    of the ~ms-scale sharded render is serialized behind ~10 host ops per
    frame."""
    n_ray = mesh.shape[RAY_AXIS]
    ys, xs, _, _ = _flat_pixels(cfg, n_ray)
    shard = NamedSharding(mesh, P(RAY_AXIS))
    repl = NamedSharding(mesh, P())
    return (put_global(ys, shard), put_global(xs, shard),
            put_global(jnp.asarray(_inv_perm(cfg, n_ray)), repl))


@functools.lru_cache(maxsize=64)
def _sharded_render_fn(mesh: Mesh, cfg: RenderConfig, multisample: bool):
    """Build the shard_map'd per-device render program WITH the framebuffer
    assembly fused in (one jit, one dispatch per frame -- host dispatch over
    a tunneled stack costs ~2 ms each, so separate render/assemble calls
    would serialize ~6 ms of host time into every frame).  The replicated
    output sharding makes XLA all-gather the ray shards into the full frame
    on every device/host (the multi-host counterpart of the reference's
    update_result flush, RelativisticRenderEngine.py:162)."""
    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0

    def local(scene, cam, keys, ys, xs):
        if not multisample:
            return render_rays(scene, cam, cfg, ys, xs, None)
        rgb = jnp.mean(
            jax.vmap(lambda k: render_rays(scene, cam, cfg, ys, xs, k))(keys),
            axis=0,
        )
        return jax.lax.pmean(rgb, SAMPLE_AXIS)

    local_sm = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(SAMPLE_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )

    def full(scene, cam, keys, ys, xs, inv):
        rgb = local_sm(scene, cam, keys, ys, xs)
        # gather-back (see _inv_perm: the equivalent at[perm].set scatter
        # costs 41 ms on TPU for a 1024^2 frame; the gather is <1 ms)
        frame = jnp.ones((cfg.height, cfg.width, 4), rgb.dtype)
        return frame.at[y0:y1, x0:x1, :3].set(rgb[inv].reshape(hc, wc, 3))

    return jax.jit(full, out_shardings=NamedSharding(mesh, P()))


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

    ys, xs, inv = _sharded_pixels(mesh, cfg)
    repl = NamedSharding(mesh, P())
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

    return _sharded_render_fn(mesh, cfg, multisample)(
        scene, cam, keys, ys, xs, inv)


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
    if mesh is None:
        mesh = make_mesh()
    ys, xs, inv = _sharded_pixels(mesh, cfg)
    repl = NamedSharding(mesh, P())
    return _sharded_stokes_fn(mesh, cfg)(
        put_global(scene, repl), put_global(cam, repl), ys, xs, inv)


@functools.lru_cache(maxsize=64)
def _sharded_stokes_fn(mesh: Mesh, cfg: RenderConfig):
    """Cached fused shard_map + gather-back assembly for the Stokes render
    (one jit, one dispatch; see _sharded_render_fn)."""
    from ..render.renderer import stokes_rays

    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0
    local_sm = shard_map(
        lambda sc, c, ys_, xs_: stokes_rays(sc, c, cfg, ys_, xs_),
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )

    def full(scene, cam, ys, xs, inv):
        rgb, q, u = local_sm(scene, cam, ys, xs)
        # gather-back (see _inv_perm: scatter would serialize on TPU)
        return (rgb[inv].reshape(hc, wc, 3), q[inv].reshape(hc, wc),
                u[inv].reshape(hc, wc))

    repl = NamedSharding(mesh, P())
    return jax.jit(full, out_shardings=(repl, repl, repl))


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
    if mesh is None:
        mesh = make_mesh()
    ys, xs, inv = _sharded_pixels(mesh, cfg)
    repl = NamedSharding(mesh, P())
    return _sharded_polarization_fn(mesh, cfg)(
        put_global(scene, repl), put_global(cam, repl), ys, xs, inv)


@functools.lru_cache(maxsize=64)
def _sharded_polarization_fn(mesh: Mesh, cfg: RenderConfig):
    """Cached fused shard_map + gather-back assembly for the polarization
    map (one jit, one dispatch; see _sharded_render_fn)."""
    from ..render.renderer import polarization_rays

    x0, x1, y0, y1 = cfg.crop()
    hc, wc = y1 - y0, x1 - x0
    local_sm = shard_map(
        lambda sc, c, ys_, xs_: polarization_rays(sc, c, cfg, ys_, xs_),
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )

    def full(scene, cam, ys, xs, inv):
        # gather-back (see _inv_perm); NaN masking lives in ang itself
        return local_sm(scene, cam, ys, xs)[inv].reshape(hc, wc)

    return jax.jit(full, out_shardings=NamedSharding(mesh, P()))
