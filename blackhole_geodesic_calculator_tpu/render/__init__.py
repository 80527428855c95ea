"""Rendering pipeline: rays -> geodesics -> events -> shading -> image."""

from .limited import LimitedConfig, render_limited
from .renderer import (
    RenderConfig,
    render_image,
    render_sample,
    render_progressive,
    scene_env,
)

__all__ = [
    "LimitedConfig",
    "render_limited",
    "RenderConfig",
    "render_image",
    "render_sample",
    "render_progressive",
    "scene_env",
]
