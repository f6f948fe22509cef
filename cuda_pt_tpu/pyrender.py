"""Drop-in PythonRenderer API (reference src/pyrender/python_bind.cu:61-70).

The reference exposes ``pyrender.PythonRenderer(xml, device_id, seed_offset)``
returning PyTorch CUDA tensors; here the same method surface returns JAX /
NumPy arrays (zero-copy on device where possible). Used by the distributed
scripts exactly like scripts/ddp_render.py used the nanobind module.
"""

from __future__ import annotations

import numpy as np

from .api import Renderer
from .core import film as film_mod


class PythonRenderer:
    def __init__(self, xml_path: str, device_id: int = 0, seed_offset: int = 0,
                 override_res=None, **renderer_kw):
        # device_id kept for signature parity; JAX places arrays per its
        # default device policy (one process drives all local chips).
        # Extra kwargs (sampler="sobol", traversal="auto", ...) pass through
        # to api.Renderer — beyond-reference knobs on the drop-in surface.
        self._r = Renderer(xml_path, seed_offset=seed_offset,
                           override_res=override_res, **renderer_kw)

    def render(self) -> np.ndarray:
        """One 1-spp pass; returns the accumulated (H, W, 4) float32 image
        (RGB + accumulation weight in alpha, like the reference's float4)."""
        self._r.render_raw()
        mean = np.asarray(self._r.film.mean)
        w = np.asarray(self._r.film.weight)[..., None]
        return np.concatenate([mean, w], axis=-1).astype(np.float32)

    def variance(self) -> np.ndarray:
        """(H, W, 1) float32 per-pixel luminance variance."""
        return np.asarray(film_mod.variance(self._r.film))[..., None].astype(np.float32)

    def counter(self) -> int:
        return self._r.counter()

    def avg_frame_time(self) -> float:
        return self._r.avg_frame_time()

    def info(self) -> dict:
        return self._r.info()

    def release(self):
        self._r.release()
