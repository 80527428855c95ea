"""Rendering pipeline: rays -> geodesics -> events -> shading -> image."""

from .renderer import (
    RenderConfig,
    render_image,
    render_sample,
    render_progressive,
    scene_env,
)

__all__ = [
    "RenderConfig",
    "render_image",
    "render_sample",
    "render_progressive",
    "scene_env",
]
