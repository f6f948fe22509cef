"""Homogeneous medium: RGB channel-MIS analytic distance sampling.

Parity with the reference HomogeneousMedium (src/volume/homogeneous.cuh:
43-88): per-channel analytic free-flight sampling with a numerically stable
3-channel balance (one-sample channel MIS), analytic exp(-σt d)
transmittance. Differentiable in σa/σs/scale (sampling decisions detached,
density factors attached).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene import types as T


def sigma_at(media: T.MediumTable, mid: jnp.ndarray):
    """(sigma_a, sigma_s, sigma_t) of medium ids mid (clamped ≥ 0)."""
    m = jnp.maximum(mid, 0)
    scale = media.scale[m][:, None]
    sa = media.sigma_a[m] * scale
    ss = media.sigma_s[m] * scale
    return sa, ss, sa + ss


def sample_distance(media: T.MediumTable, mid: jnp.ndarray, t_surf: jnp.ndarray,
                    u: jnp.ndarray):
    """Sample a free-flight distance against the surface hit at t_surf.

    Returns dict(t, is_medium_event, weight (B,3)). Weight is the usual
    channel-MIS estimator:
      medium event:  σs·exp(-σt t) / mean_c(σt_c·exp(-σt_c t))
      surface event: exp(-σt t_surf) / mean_c(exp(-σt_c t_surf))
    """
    _, ss, st = sigma_at(media, mid)
    st_d = jax.lax.stop_gradient(st)
    # pick a channel uniformly (detached)
    c = jnp.minimum((u[..., 0] * 3.0).astype(jnp.int32), 2)
    st_c = jnp.take_along_axis(st_d, c[:, None], axis=-1)[:, 0]
    st_c = jnp.maximum(st_c, 1e-8)
    t = -jnp.log(jnp.maximum(1.0 - u[..., 1], 1e-12)) / st_c
    t = jax.lax.stop_gradient(t)
    is_med = t < t_surf

    tr_med = jnp.exp(-st * t[:, None])
    pdf_med = jnp.mean(st_d * jnp.exp(-st_d * t[:, None]), axis=-1)
    w_med = ss * tr_med / jnp.maximum(pdf_med, 1e-12)[:, None]

    tr_srf = jnp.exp(-st * t_surf[:, None])
    pdf_srf = jnp.mean(jnp.exp(-st_d * t_surf[:, None]), axis=-1)
    w_srf = tr_srf / jnp.maximum(pdf_srf, 1e-12)[:, None]

    weight = jnp.where(is_med[:, None], w_med, w_srf)
    t_out = jnp.where(is_med, t, t_surf)
    return {"t": t_out, "is_medium": is_med, "weight": weight}


def transmittance(media: T.MediumTable, mid: jnp.ndarray, dist: jnp.ndarray):
    """Analytic transmittance over distance dist (B,) → (B,3)."""
    _, _, st = sigma_at(media, mid)
    return jnp.exp(-st * jnp.maximum(dist, 0.0)[:, None])
