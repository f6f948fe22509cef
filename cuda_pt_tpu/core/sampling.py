"""Low-level sampling routines with PDFs.

Parity with reference src/core/sampling.cuh:27-67 (cosine hemisphere, uniform
sphere / cone / disk) plus uniform-triangle sampling used by area emitters
(src/core/emitter.cuh:141-222). All functions take pre-drawn uniforms so the
RNG stays in the caller — keeps these pure and trivially differentiable-safe
(directions are discrete-sample outputs; callers stop_gradient them).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as vm

INV_PI = 0.3183098861837907
TWO_PI = 6.283185307179586


def cosine_hemisphere(u: jnp.ndarray):
    """Cosine-weighted hemisphere around +z. u: (..., 2). Returns (dir, pdf)."""
    phi = TWO_PI * u[..., 0]
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - u[..., 1], 0.0))
    sin_theta = jnp.sqrt(jnp.maximum(u[..., 1], 0.0))
    d = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return d, cos_theta * INV_PI


def cosine_hemisphere_pdf(cos_theta: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(cos_theta, 0.0) * INV_PI


def uniform_sphere(u: jnp.ndarray):
    """Uniform direction on S². Returns (dir, pdf=1/4pi)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u[..., 1]
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, jnp.full(u.shape[:-1], 1.0 / (2.0 * TWO_PI), jnp.float32)


def uniform_hemisphere(u: jnp.ndarray):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u[..., 1]
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, jnp.full(u.shape[:-1], 1.0 / TWO_PI, jnp.float32)


def uniform_cone(u: jnp.ndarray, cos_max: jnp.ndarray):
    """Uniform direction in a cone of half-angle acos(cos_max) around +z."""
    cos_theta = 1.0 - u[..., 0] * (1.0 - cos_max)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * u[..., 1]
    d = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    pdf = 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_max, 1e-8))
    return d, pdf


def concentric_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Concentric map of [0,1)² to the unit disk (for thin-lens DoF)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (jnp.pi / 4.0) * vm.safe_div(oy, ox),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * vm.safe_div(ox, oy),
    )
    zero = (jnp.abs(ox) < 1e-12) & (jnp.abs(oy) < 1e-12)
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def uniform_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform barycentrics (b1, b2) on a triangle via sqrt warp. u: (..., 2)."""
    su = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    b1 = 1.0 - su
    b2 = u[..., 1] * su
    return jnp.stack([b1, b2], axis=-1)


def power_heuristic(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (beta=2) MIS weight for strategy a.

    Ratio form 1/(1+(b/a)²): immune to pdf² overflow (large solid-angle pdfs
    at long distances squared past f32 max would give inf/inf = NaN)."""
    r = pdf_b / jnp.maximum(pdf_a, 1e-12)
    w = 1.0 / (1.0 + r * r)
    return jnp.where(pdf_a > 0.0, w, 0.0)


def balance_heuristic(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    r = pdf_b / jnp.maximum(pdf_a, 1e-12)
    return jnp.where(pdf_a > 0.0, 1.0 / (1.0 + r), 0.0)
