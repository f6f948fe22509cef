"""Texture atlas sampling (bilinear, wrap addressing).

Replaces the reference's CUDA texture objects (src/core/textures.cuh,
src/impl/textures.cu) with explicit gathers into one flat texel pool —
static shapes, dynamic indices, differentiable in texel values. Normal maps
are stored raw [0,1] and remapped to [-1,1] at evaluation (reference
src/impl/textures.cu:185-188).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as vm
from .types import TextureAtlas


def sample_texture(atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear RGBA fetch. tex_id: (B,) int32 (-1 → returns 1s so callers can
    multiply unconditionally). uv: (B, 2) in [0,1] (wrapped)."""
    tid = jnp.maximum(tex_id, 0)
    w = atlas.width[tid].astype(jnp.float32)
    h = atlas.height[tid].astype(jnp.float32)
    off = atlas.offset[tid]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    wi = atlas.width[tid]
    hi = atlas.height[tid]

    def fetch(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), wi)
        yi = jnp.mod(yi.astype(jnp.int32), hi)
        return atlas.texels[off + yi * wi + xi]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    c = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    return jnp.where((tex_id >= 0)[..., None], c, jnp.ones_like(c))


def scaled_rgb(atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray,
               base: jnp.ndarray) -> jnp.ndarray:
    """base color modulated by an optional texture (identity when tex_id < 0)."""
    return base * sample_texture(atlas, tex_id, uv)[..., :3]


def eval_normal_map(atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray,
                    n_s: jnp.ndarray) -> jnp.ndarray:
    """Perturb the shading normal by a tangent-space normal map (TBN rotate —
    reference Textures::eval_normal, src/core/textures.cuh:79-88)."""
    texn = sample_texture(atlas, tex_id, uv)[..., :3] * 2.0 - 1.0
    t, b = vm.onb(n_s)
    n_pert = vm.normalize(
        texn[..., 0:1] * t + texn[..., 1:2] * b + jnp.maximum(texn[..., 2:3], 0.1) * n_s
    )
    return jnp.where((tex_id >= 0)[..., None], n_pert, n_s)
