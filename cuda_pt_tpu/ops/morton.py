"""Morton (Z-order) codes for ray-coherence sorting.

The reference sorts wavefront rays by material key only
(src/pt_impl/wf_path_tracer.cu:68-80); on TPU the packet traversal kernel
additionally rewards *spatial* coherence inside each ray tile, so the
wavefront sort key appends a Morton code of the ray origin (scene-normalized)
— tiles then agree on their BVH subtree and the packet walk touches fewer
nodes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton3d(p: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton code of points p (B, 3) within bounds [lo, hi]."""
    q = (p - lo) / jnp.maximum(hi - lo, 1e-8)
    q = jnp.clip(q, 0.0, 1.0 - 1e-7)
    xi = (q * 1024.0).astype(jnp.uint32)
    return (
        (_expand_bits(xi[..., 0]) << 2)
        | (_expand_bits(xi[..., 1]) << 1)
        | _expand_bits(xi[..., 2])
    ).astype(jnp.uint32)


def direction_octant(d: jnp.ndarray) -> jnp.ndarray:
    """3-bit sign octant of directions (B, 3)."""
    return (
        (d[..., 0] >= 0).astype(jnp.uint32) * 4
        + (d[..., 1] >= 0).astype(jnp.uint32) * 2
        + (d[..., 2] >= 0).astype(jnp.uint32)
    )
