"""Rendering pipeline: rays -> geodesics -> events -> shading -> image."""

from .limited import LimitedConfig, SurrogateTable, render_limited
from .stats import render_stats, settings_dump
from .debug import debug_rays, format_debug_string
from .renderer import (
    RenderConfig,
    polarization_map,
    polarization_rays,
    render_image,
    render_image_u8,
    render_sample,
    render_progressive,
    render_stokes,
    scene_env,
    stokes_rays,
)

__all__ = [
    "LimitedConfig",
    "SurrogateTable",
    "render_stats",
    "debug_rays",
    "format_debug_string",
    "settings_dump",
    "render_limited",
    "RenderConfig",
    "polarization_map",
    "polarization_rays",
    "render_image",
    "render_image_u8",
    "render_sample",
    "render_progressive",
    "render_stokes",
    "stokes_rays",
    "scene_env",
]
