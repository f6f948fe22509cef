"""Image I/O helpers (replaces the reference's stb usage,
src/impl/textures.cu:172-201)."""

from __future__ import annotations

import numpy as np


def srgb_to_linear(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def load_image(path: str, to_linear: bool = True) -> np.ndarray:
    """Load an LDR/HDR image → float32 (H, W, C) in [0,1] (LDR) / linear."""
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img).astype(np.float32)
    if arr.dtype == np.float32 and arr.max() > 2.0:  # 8/16-bit quantized
        arr = arr / (65535.0 if arr.max() > 255.0 else 255.0)
    if arr.ndim == 2:
        arr = arr[..., None]
    if to_linear:
        arr = srgb_to_linear(arr)
    return np.ascontiguousarray(arr, dtype=np.float32)


def save_png(path: str, img: np.ndarray):
    """Save (H, W, 3) float [0,1] or uint8 image as PNG."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img).save(path)
