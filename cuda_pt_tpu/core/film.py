"""Film: sample accumulation, online Welford variance, gamma export.

Parity with the reference DeviceImage (src/core/host_device.cuh:30-113) and
the Welford variance accumulation in src/renderer/tracing_func.cuh:194-208.
The film is a pytree so it can live on device across frames (the de-facto
checkpoint state of the renderer — SURVEY.md §5) and be psum-reduced across
a device mesh.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Film:
    mean: jnp.ndarray  # (H, W, 3) running mean radiance
    m2: jnp.ndarray  # (H, W) running M2 of luminance (Welford)
    weight: jnp.ndarray  # (H, W) accumulated sample weight (spp; fractional for LT splats)
    count: jnp.ndarray  # () int32 number of accumulated passes


def make_film(height: int, width: int) -> Film:
    return Film(
        mean=jnp.zeros((height, width, 3), jnp.float32),
        m2=jnp.zeros((height, width), jnp.float32),
        weight=jnp.zeros((height, width), jnp.float32),
        count=jnp.int32(0),
    )


def accumulate(film: Film, radiance: jnp.ndarray) -> Film:
    """Fold one 1-spp pass (H, W, 3) into the film with Welford updates."""
    n = film.count + 1
    lum = 0.212671 * radiance[..., 0] + 0.715160 * radiance[..., 1] + 0.072169 * radiance[..., 2]
    old_lum = (
        0.212671 * film.mean[..., 0]
        + 0.715160 * film.mean[..., 1]
        + 0.072169 * film.mean[..., 2]
    )
    delta = lum - old_lum
    mean = film.mean + (radiance - film.mean) / n.astype(jnp.float32)
    new_lum = old_lum + delta / n.astype(jnp.float32)
    m2 = film.m2 + delta * (lum - new_lum)
    return Film(mean=mean, m2=m2, weight=film.weight + 1.0, count=n)


def variance(film: Film) -> jnp.ndarray:
    """Per-pixel sample variance of luminance (H, W)."""
    n = jnp.maximum(film.count - 1, 1).astype(jnp.float32)
    return film.m2 / n


def to_srgb(mean: jnp.ndarray, gamma: bool = True,
            tonemap: str = "gamma") -> jnp.ndarray:
    """Tonemap linear radiance to [0,1] sRGB-ish.

    tonemap="gamma": the reference's gamma 1/2.1 (src/core/host_device.cuh
    :44). tonemap="aces": Narkowicz's ACES filmic fit (public formula) —
    highlight rolloff instead of clipping, then the same gamma; beyond the
    reference, useful for bright emitters in the viewer."""
    img = jnp.clip(mean, 0.0, None)
    if tonemap == "aces":
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        img = (img * (a * img + b)) / (img * (c * img + d) + e)
    if gamma:
        img = jnp.power(jnp.clip(img, 0.0, 1e9), 1.0 / 2.1)
    return jnp.clip(img, 0.0, 1.0)


def save_checkpoint(film: Film, path: str):
    """Persist film state (the renderer's de-facto checkpoint — SURVEY.md §5:
    the reference's accumulated DeviceImage + accum_cnt persisting across
    frames). Enables crash-resume at pass granularity like
    scripts/serial_render.py's per-frame PNGs, but lossless."""
    np.savez(
        path,
        mean=np.asarray(film.mean),
        m2=np.asarray(film.m2),
        weight=np.asarray(film.weight),
        count=np.asarray(film.count),
    )


def load_checkpoint(path: str) -> Film:
    z = np.load(path)
    return Film(
        mean=jnp.asarray(z["mean"]),
        m2=jnp.asarray(z["m2"]),
        weight=jnp.asarray(z["weight"]),
        count=jnp.asarray(z["count"]),
    )


def export_numpy(film: Film, gamma: bool = True) -> np.ndarray:
    """Bring the tonemapped image to host as uint8 (H, W, 3)."""
    img = np.asarray(to_srgb(film.mean, gamma=gamma))
    return (img * 255.0 + 0.5).astype(np.uint8)
