"""Phase functions: isotropic, Henyey-Greenstein, dual-lobe HG, Rayleigh.

Parity with reference src/volume/ (henyey_greenstein.cuh:42-108,
rayleigh.cuh; SGGX falls back to isotropic exactly like the reference,
src/impl/scene.cu:762-766). Evaluated batched + masked-selected by type id.

Conventions: wo = direction the photon ARRIVES along (unit, pointing forward
along the previous ray), wi = new propagation direction. All phases here are
reciprocal, so eval() doubles as the sampling pdf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as vm
from ..scene import types as T

_INV_4PI = 1.0 / (4.0 * jnp.pi)


def _hg(cos_t: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    g2 = g * g
    denom = 1.0 + g2 + 2.0 * g * cos_t
    return _INV_4PI * (1.0 - g2) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-8)), 1e-8)


def _rayleigh(cos_t: jnp.ndarray) -> jnp.ndarray:
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)


def phase_eval(ptype, g, g2, w, d_in: jnp.ndarray, d_out: jnp.ndarray):
    """Phase value (= pdf) for scattering d_in → d_out. All (B,)-batched."""
    cos_t = vm.dot(d_in, d_out)
    iso = jnp.full_like(cos_t, _INV_4PI)
    hg1 = _hg(cos_t, g)
    dual = w * _hg(cos_t, g) + (1.0 - w) * _hg(cos_t, g2)
    ray = _rayleigh(cos_t)
    out = iso
    out = jnp.where(ptype == T.PHASE_HG, hg1, out)
    out = jnp.where(ptype == T.PHASE_DUAL_HG, dual, out)
    out = jnp.where(ptype == T.PHASE_RAYLEIGH, ray, out)
    return out


def _sample_hg_cos(g: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Exact HG inverse CDF (reference henyey_greenstein.cuh:42-73)."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u)
    cos_hg = (1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * u
    return jnp.where(jnp.abs(g) < 1e-3, cos_iso, jnp.clip(cos_hg, -1.0, 1.0))


def _sample_rayleigh_cos(u: jnp.ndarray) -> jnp.ndarray:
    """Exact Rayleigh inversion: solve cubic via Cardano."""
    q = 2.0 * (2.0 * u - 1.0)
    z = jnp.cbrt(q + jnp.sqrt(q * q + 1.0))
    return jnp.clip(z - 1.0 / z, -1.0, 1.0)


def phase_sample(ptype, g, g2, w, d_in: jnp.ndarray, u2: jnp.ndarray, u1: jnp.ndarray):
    """Sample d_out and return (d_out, pdf). Discrete lobe pick + direction
    are detached by the caller; MIS between dual-HG lobes follows the
    reference (one-sample MIS: pdf is the mixture)."""
    pick_first = u1 < w
    g_pick = jnp.where(pick_first, g, g2)
    cos_iso = 1.0 - 2.0 * u2[..., 0]
    cos_hg = _sample_hg_cos(g_pick, u2[..., 0])
    cos_ray = _sample_rayleigh_cos(u2[..., 0])
    cos_t = cos_iso
    cos_t = jnp.where(ptype == T.PHASE_HG, _sample_hg_cos(g, u2[..., 0]), cos_t)
    cos_t = jnp.where(ptype == T.PHASE_DUAL_HG, cos_hg, cos_t)
    cos_t = jnp.where(ptype == T.PHASE_RAYLEIGH, cos_ray, cos_t)

    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    d_out = vm.to_world(local, d_in)
    pdf = phase_eval(ptype, g, g2, w, d_in, d_out)
    return jax.lax.stop_gradient(d_out), pdf
