"""Image IO.

The reference writes pixels into Blender's RenderResult and loads sky maps
through ``bpy.data.images.load`` (RelativisticRenderEngine.py:78-90,162).
Standalone equivalents: PNG out (PIL when present, pure-zlib fallback so the
framework has zero hard IO dependencies), image in, and a simple HDR
tonemap for the disk's >1 intensities.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap(rgb: np.ndarray, exposure: float = 1.0) -> np.ndarray:
    """Simple Reinhard x/(1+x) tonemap for HDR disk intensities."""
    v = np.asarray(rgb, np.float32) * exposure
    return v / (1.0 + v)


def _png_bytes(arr: np.ndarray) -> bytes:
    """Minimal RGB(A) 8-bit PNG encoder (no external deps)."""
    h, w, c = arr.shape
    color = {3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag, data):
        payload = tag + data
        return (struct.pack(">I", len(data)) + payload
                + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def write_png(path: str, img, clip: bool = True) -> str:
    """(H, W, 3|4) float [0,1] or uint8 -> PNG file.

    Writes atomically (tmp file + rename): readers -- in particular
    ``cli animate --resume``'s existence check -- never observe a
    truncated file after a crash mid-write.
    """
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.asarray(arr, np.float32)
        if clip:
            arr = np.clip(arr, 0.0, 1.0)
        arr = (arr * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"expected (H, W, 3|4), got {arr.shape}")
    import os

    tmp = path + ".tmp"
    # Fastest first: the native C++ encoder (filtered + zlib), then PIL,
    # then the dependency-free pure-Python fallback.
    written = False
    try:
        from .. import native

        if native.available() and path.lower().endswith(".png"):
            native.write_png(tmp, np.ascontiguousarray(arr))
            written = True
    except Exception:
        written = False
    if not written:
        try:
            from PIL import Image

            Image.fromarray(arr).save(tmp, format="PNG")
        except ImportError:
            with open(tmp, "wb") as f:
                f.write(_png_bytes(np.ascontiguousarray(arr)))
    os.replace(tmp, path)
    return path


def read_image(path: str) -> np.ndarray:
    """Image file -> (H, W, 3) float32 in [0, 1] (the sky-map loader;
    reference: bpy.data.images.load at RelativisticRenderEngine.py:80)."""
    try:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return img
    except ImportError:
        pass
    from .. import native  # 8-bit PNG / PFM decoder (no PIL needed)

    if path.lower().endswith(".pfm"):
        return np.clip(native.read_pfm(path), 0.0, 1.0)
    arr = native.read_png(path)
    return np.asarray(arr[..., :3], np.float32) / 255.0
