"""Colormap LUTs for the depth / BVH-cost visualizers.

The reference embeds 1024-line PLASMA/JET/VIRIDIS tables as CUDA 1D textures
(src/impl/color_map.cu); we generate the same maps from matplotlib at import
time and sample them with a gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_N = 256


def _build(name: str) -> np.ndarray:
    try:
        import matplotlib

        cmap = matplotlib.colormaps[name]
        return cmap(np.linspace(0, 1, _N))[:, :3].astype(np.float32)
    except Exception:
        # grayscale fallback
        g = np.linspace(0, 1, _N, dtype=np.float32)
        return np.stack([g, g, g], axis=-1)


# ids match the reference enum ordering (src/core/color_map.cuh)
COLOR_MAPS = jnp.asarray(
    np.stack([_build("plasma"), _build("jet"), _build("viridis")], axis=0)
)
NUM_MAPS = 3


def apply_colormap(x: jnp.ndarray, map_id) -> jnp.ndarray:
    """Map normalized values (...,) in [0,1] through colormap map_id → (..., 3)."""
    idx = jnp.clip((x * (_N - 1)).astype(jnp.int32), 0, _N - 1)
    return COLOR_MAPS[map_id][idx]
