"""Vector math utilities for batched (..., 3) float32 arrays.

TPU-native replacement for the reference's Vec3/SO3 classes
(src/core/vec3.cuh, src/core/so3.cuh): instead of a 3-float struct with fused
ops, everything here is plain jnp arrays with the last axis = xyz so the VPU
vectorizes across the ray batch.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5
MAX_DIST = 1e7  # reference: src/core/constants.cuh MAX_DIST


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 1e-30))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v * jax_rsqrt(jnp.maximum(dot(v, v, keepdims=True), 1e-30))


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(x)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect incident direction d (pointing toward surface) about normal n."""
    return d - 2.0 * dot(d, n, keepdims=True) * n


def refract(d: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Refract d (toward surface) through normal n with relative IoR eta = n_i/n_t.

    Returns (wt, total_internal_reflection_mask). Mirrors the physics of the
    reference's snell_refraction (src/bsdf/translucent.cuh) without its
    branching.
    """
    cos_i = -dot(d, n, keepdims=True)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = (sin2_t >= 1.0)[..., 0]
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = eta * d + (eta * cos_i - cos_t) * n
    return normalize(wt), tir


def onb(n: jnp.ndarray):
    """Build an orthonormal basis (t, b, n) from unit normal n.

    Branchless Duff et al. / Frisvad construction — replaces the reference's
    delocalize_rotate SO3 machinery (src/core/so3.cuh:183-252) with pure
    vector ops that map directly onto the VPU.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def to_world(local: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Rotate a local-frame (z-up) direction into the frame whose +z is n."""
    t, b = onb(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def to_local(world: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Express a world direction in the z-up frame of normal n."""
    t, b = onb(n)
    return jnp.stack(
        [dot(world, t), dot(world, b), dot(world, n)], axis=-1
    )


def spherical_to_dir(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


def safe_div(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def sqr(x):
    return x * x
