"""Fresnel terms (dielectric exact, conductor spectral, hemispherical diffuse).

Parity with reference src/bsdf/fresnel.cuh:28-140: exact (non-Schlick)
dielectric Fresnel with TIR handling, spectral conductor Fresnel, and the
hemisphere-integrated diffuse Fresnel used by the plastic BSDF — here as a
cheap polynomial fit (Egan & d'Eon style) instead of the reference's 131072-
sample MC precompute, evaluated inline so it stays differentiable in IoR.
"""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_i: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Unpolarized Fresnel reflectance for a dielectric.

    cos_i: |cos| of incident angle (>= 0). eta: n_t / n_i (relative IoR of the
    transmitted side). Returns 1.0 under total internal reflection.
    """
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-8)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-8)
    r_per = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-8)
    f = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def fresnel_conductor(cos_i: jnp.ndarray, eta: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Spectral conductor Fresnel (exact, per RGB channel).

    cos_i: (...,) clamped cosine; eta, k: (..., 3). Returns (..., 3).
    """
    c = jnp.clip(cos_i, 1e-5, 1.0)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-8)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-8)
    return jnp.clip(0.5 * (rp + rs), 0.0, 1.0)


def diffuse_fresnel(eta: jnp.ndarray) -> jnp.ndarray:
    """Hemispherically-integrated Fresnel reflectance F_dr for internal
    diffuse bounce (d'Eon & Irving polynomial fit, eta = n_in/n_out > 1).
    Used by the plastic substrate energy normalization (reference
    diffuse_fresnel, src/impl/bsdf_plastic.cu)."""
    inv = 1.0 / jnp.maximum(eta, 1.0 + 1e-4)
    return jnp.clip(
        -1.4399 * inv * inv + 0.7099 * inv + 0.6681 + 0.0636 * eta,
        0.0,
        0.999,
    )
