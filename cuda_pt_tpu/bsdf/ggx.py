"""Anisotropic GGX microfacet distribution with visible-NDF sampling.

Parity with the reference GGX conductor implementation
(src/impl/bsdf_ggx.cu:48-143): Trowbridge-Reitz NDF, Smith height-correlated
masking, and Heitz's stretched-slope VNDF sampling — all in the local frame
where +z is the shading normal, batched over rays.
"""

from __future__ import annotations

import jax.numpy as jnp


def ndf(h_local: jnp.ndarray, ax: jnp.ndarray, ay: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic GGX NDF D(h). h_local: (..., 3) in the shading frame."""
    x = h_local[..., 0] / jnp.maximum(ax, 1e-5)
    y = h_local[..., 1] / jnp.maximum(ay, 1e-5)
    z = h_local[..., 2]
    t = x * x + y * y + z * z
    valid = z > 0.0
    d = 1.0 / (jnp.pi * ax * ay * jnp.maximum(t * t, 1e-12))
    return jnp.where(valid, d, 0.0)


def _lambda(w: jnp.ndarray, ax, ay) -> jnp.ndarray:
    """Smith Lambda for GGX."""
    cz = jnp.abs(w[..., 2])
    a2 = (w[..., 0] * ax) ** 2 + (w[..., 1] * ay) ** 2
    t2 = a2 / jnp.maximum(cz * cz, 1e-10)
    return 0.5 * (jnp.sqrt(1.0 + t2) - 1.0)


def g1(w: jnp.ndarray, ax, ay) -> jnp.ndarray:
    return 1.0 / (1.0 + _lambda(w, ax, ay))


def g2(wo: jnp.ndarray, wi: jnp.ndarray, ax, ay) -> jnp.ndarray:
    """Height-correlated Smith masking-shadowing."""
    return 1.0 / (1.0 + _lambda(wo, ax, ay) + _lambda(wi, ax, ay))


def sample_vndf(wo_local: jnp.ndarray, ax, ay, u: jnp.ndarray) -> jnp.ndarray:
    """Sample a visible half-vector (Heitz 2018 stretched-slope method).

    wo_local: (..., 3) view direction in the shading frame (z > 0 expected —
    callers mirror through z first). u: (..., 2) uniforms. Returns h (..., 3).
    """
    ax_ = jnp.broadcast_to(ax, wo_local.shape[:-1])
    ay_ = jnp.broadcast_to(ay, wo_local.shape[:-1])
    v = jnp.stack(
        [wo_local[..., 0] * ax_, wo_local[..., 1] * ay_, wo_local[..., 2]], axis=-1
    )
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    # orthonormal frame around v
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-8)[..., None],
        jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(lensq)], axis=-1)
        / jnp.sqrt(jnp.maximum(lensq, 1e-8))[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape),
    )
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    h = jnp.stack(
        [
            nh[..., 0] * ax_,
            nh[..., 1] * ay_,
            jnp.maximum(nh[..., 2], 1e-6),
        ],
        axis=-1,
    )
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)


def vndf_pdf(wo_local: jnp.ndarray, h_local: jnp.ndarray, ax, ay) -> jnp.ndarray:
    """PDF (w.r.t. wi solid angle) of VNDF sampling + reflection."""
    cos_o = jnp.abs(wo_local[..., 2])
    doh = jnp.abs(jnp.sum(wo_local * h_local, axis=-1))
    d = ndf(h_local, ax, ay)
    g = g1(wo_local, ax, ay)
    return g * d * doh / jnp.maximum(cos_o, 1e-6) / jnp.maximum(4.0 * doh, 1e-8)
