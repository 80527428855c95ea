"""Render observability -- the reference's console metrics, structured.

The reference prints a full settings dump at render start, ray totals and
progress/timing lines to stdout (RelativisticRenderEngine.py:123-129,192,
199-208; SURVEY.md §5 'Metrics / logging / observability').  Here the same
information is returned as data: a per-status ray histogram (the rogue-ray
taxonomy as numbers instead of in-image colors), affine-length statistics,
and a settings dump, all from one extra jitted pass or alongside a render.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..camera.pinhole import Camera, pixel_grid, generate_rays
from ..ops import states
from ..ops.integrate import launch
from ..scene.scene import Scene
from .renderer import RenderConfig, scene_env, _bh_frame

STATUS_NAMES = {
    states.ACTIVE: "active",
    states.CAPTURED: "captured",
    states.ESCAPED: "escaped",
    states.BUDGET: "budget",
    states.DISK: "disk",
    states.OBJECT: "object",
    states.INSIDE_HORIZON: "inside_horizon",
    states.ERROR: "error",
}


@jax.jit
def _histogram(status):
    return jnp.stack(
        [jnp.sum(status == code) for code in sorted(STATUS_NAMES)])


def render_stats(scene: Scene, cam: Camera, cfg: RenderConfig) -> dict:
    """Trace the frame's rays and return the termination report.

    Keys: ``rays_total``, per-status counts (the reference's '#rays total'
    print and rogue-ray colors as numbers), ``rogue_fraction`` (ERROR +
    BUDGET rays -- the ones the reference paints red), ``lam_mean/max``
    (integration-cost profile), and the ``settings`` dump.
    """
    x0, x1, y0, y1 = cfg.crop()
    ys, xs = pixel_grid(cfg.width, cfg.height, x0, x1, y0, y1)
    o, d = generate_rays(cam, cfg.width, cfg.height, ys, xs, None)
    env = scene_env(scene, cfg, cam)
    s = launch(env, o - scene.bh.loc, d, cfg.integrator)

    counts = np.asarray(_histogram(s.status))
    total = int(counts.sum())
    by_name = {STATUS_NAMES[code]: int(c)
               for code, c in zip(sorted(STATUS_NAMES), counts)}
    rogue = by_name["error"] + by_name["budget"]
    return {
        "rays_total": total,
        "status": by_name,
        "rogue_fraction": rogue / max(total, 1),
        "lam_mean": float(jnp.mean(s.lam)),
        "lam_max": float(jnp.max(s.lam)),
        "settings": settings_dump(scene, cam, cfg),
    }


def settings_dump(scene: Scene, cam: Camera, cfg: RenderConfig) -> dict:
    """The reference's render-start settings print, as a dict."""
    return {
        "mass": float(scene.bh.mass),
        "spin": None if scene.bh.spin is None else float(scene.bh.spin),
        "bh_loc": np.asarray(scene.bh.loc).tolist(),
        "camera": np.asarray(cam.position).tolist(),
        "euler": np.asarray(cam.euler).tolist(),
        "fov": np.asarray(cam.fov).tolist(),
        "resolution": [cfg.width, cfg.height],
        "samples": cfg.samples,
        "seed": cfg.seed,
        "n_steps": cfg.integrator.n_steps,
        "dt": cfg.integrator.dt,
        "backend": cfg.integrator.backend,
        "lam_max": cfg.lam_max,
        "disk": scene.disk is not None,
        "spheres": 0 if scene.spheres is None
        else int(scene.spheres.center.shape[0]),
        "lights": 0 if scene.lights is None
        else int(scene.lights.position.shape[0]),
    }
