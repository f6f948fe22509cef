"""Grid (heterogeneous) medium: delta-tracking sampling, ratio-tracking
transmittance, blackbody emission.

Parity with the reference NanoVDB grid medium (src/volume/grid.cuh,
src/impl/vol_grid.cu:128-198): tree-extrema majorant delta tracking for
free-flight distances and ratio tracking with Russian roulette for
transmittance. TPU re-design: grids are dense (G, D, H, W) HBM arrays with
*trilinear* lookups (better than the reference's stochastic-NN filter and
differentiable in the density field — the BASELINE.json north star), and the
rejection loops are fixed-cap fori loops with masked termination so they
vectorize and reverse-differentiate.

Differentiability: the accepted/rejected decisions are detached; the
real-collision ratio sigma(x)/majorant factors stay attached, which is the
standard unbiased "attached ratio tracking" estimator for transmittance
gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng as prng
from ..scene import types as T

MAX_TRACK_STEPS = 64


def density_lookup(grids: T.GridMediumData, gid: jnp.ndarray, p: jnp.ndarray,
                   field: str = "density"):
    """Trilinear density at world positions p (B, 3) in grid gid (B,)."""
    g = jnp.maximum(gid, 0)
    vol = getattr(grids, field)  # (G, D, H, W)
    bmin = grids.bbox_min[g]
    bmax = grids.bbox_max[g]
    ext = jnp.maximum(bmax - bmin, 1e-8)
    # normalized [0,1] → voxel coords (x→W, y→H, z→D)
    q = (p - bmin) / ext
    D, H, W = vol.shape[1], vol.shape[2], vol.shape[3]
    fx = q[:, 0] * (W - 1)
    fy = q[:, 1] * (H - 1)
    fz = q[:, 2] * (D - 1)
    inside = (
        (q[:, 0] >= 0.0) & (q[:, 0] <= 1.0)
        & (q[:, 1] >= 0.0) & (q[:, 1] <= 1.0)
        & (q[:, 2] >= 0.0) & (q[:, 2] <= 1.0)
    )
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, D - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)
    tx = jnp.clip(fx - x0, 0.0, 1.0)
    ty = jnp.clip(fy - y0, 0.0, 1.0)
    tz = jnp.clip(fz - z0, 0.0, 1.0)

    def at(z, y, x):
        return vol[g, z, y, x]

    c00 = at(z0, y0, x0) * (1 - tx) + at(z0, y0, x1) * tx
    c01 = at(z0, y1, x0) * (1 - tx) + at(z0, y1, x1) * tx
    c10 = at(z1, y0, x0) * (1 - tx) + at(z1, y0, x1) * tx
    c11 = at(z1, y1, x0) * (1 - tx) + at(z1, y1, x1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    val = c0 * (1 - tz) + c1 * tz
    return jnp.where(inside, val, 0.0)


def blackbody_rgb(temp: jnp.ndarray) -> jnp.ndarray:
    """Planck spectrum sampled at R/G/B wavelengths, peak-normalized.

    Replaces the reference's precomputed temperature→RGB table
    (scene/data/blackbody.bin, src/impl/vol_grid.cu:304-326) with the direct
    physical formula (temp in Kelvin)."""
    wl = jnp.array([615e-9, 535e-9, 465e-9])  # m
    h, c, kb = 6.626e-34, 2.998e8, 1.381e-23
    t = jnp.maximum(temp, 1.0)[:, None]
    x = (h * c) / (wl * kb * t)
    rad = 1.0 / (wl ** 5 * jnp.expm1(jnp.clip(x, 1e-4, 80.0)))
    # normalize so T=6500K is ~white with unit luminance
    x_ref = (h * c) / (wl * kb * 6500.0)
    ref = 1.0 / (wl ** 5 * jnp.expm1(x_ref))
    return rad / ref


def _grid_params(scene: T.Scene, mid: jnp.ndarray):
    m = jnp.maximum(mid, 0)
    gid = jnp.maximum(scene.media.grid_id[m], 0)
    scale = scene.media.scale[m]
    maj = jnp.maximum(scene.grids.majorant[gid] * scale, 1e-6)
    albedo = scene.media.sigma_s[m]  # grid albedo stored in sigma_s
    return gid, scale, maj, albedo


def sample_distance_grid(scene: T.Scene, mid: jnp.ndarray, o: jnp.ndarray,
                         d: jnp.ndarray, t_surf: jnp.ndarray, rng: jnp.ndarray,
                         active: jnp.ndarray):
    """Delta-tracking free flight (reference src/impl/vol_grid.cu:128-150).

    Fixed-cap masked loop. Returns dict(t, is_medium, weight(B,3)), rng.
    """
    gid, scale, maj, albedo = _grid_params(scene, mid)
    return sample_distance_arrays(scene.grids, gid, scale, maj, albedo,
                                  o, d, t_surf, rng, active)


def sample_distance_arrays(grids: T.GridMediumData, gid, scale, maj, albedo,
                           o: jnp.ndarray, d: jnp.ndarray,
                           t_surf: jnp.ndarray, rng: jnp.ndarray,
                           active: jnp.ndarray):
    """sample_distance_grid against raw arrays — shared by the composed
    VPT (scene wrapper above) and the fused split driver (MKPack gr_*
    refs, ops/pallas/megakernel.trace_megakernel_swf)."""
    B = o.shape[0]
    inv_maj = 1.0 / maj

    def body(i, carry):
        t, done, is_med, w, rng = carry
        u, rng = prng.next2d(rng)
        step = -jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12)) * inv_maj
        t_new = t + jax.lax.stop_gradient(step)
        pass_srf = t_new >= t_surf
        p = o + t_new[:, None] * d
        dens = density_lookup(grids, gid, p) * scale
        ratio = jnp.clip(dens * inv_maj, 0.0, 1.0)
        real = u[..., 1] < jax.lax.stop_gradient(ratio)
        # attached weight for real collisions: sigma(x)/majorant over its
        # detached probability — cancels in expectation, carries d(sigma).
        w_real = ratio / jnp.maximum(jax.lax.stop_gradient(ratio), 1e-8)
        w_null = (1.0 - ratio) / jnp.maximum(
            1.0 - jax.lax.stop_gradient(ratio), 1e-8
        )
        upd = ~done
        newly_srf = upd & pass_srf
        newly_med = upd & ~pass_srf & real
        w = jnp.where(upd & ~pass_srf, w * jnp.where(real, w_real, w_null), w)
        t = jnp.where(upd, jnp.where(pass_srf, t_surf, t_new), t)
        is_med = is_med | newly_med
        done = done | newly_srf | newly_med
        return t, done, is_med, w, rng

    t0 = jnp.zeros(B)
    done0 = ~active
    carry = (t0, done0, jnp.zeros(B, bool), jnp.ones(B), rng)
    t, done, is_med, w, rng = jax.lax.fori_loop(0, MAX_TRACK_STEPS, body, carry)
    # lanes that never terminated: treat as reaching the surface
    t = jnp.where(done, t, t_surf)
    weight = (w[:, None] * jnp.where(is_med[:, None], albedo, 1.0))
    return {"t": t, "is_medium": is_med & active, "weight": weight}, rng


def transmittance_grid(scene: T.Scene, mid: jnp.ndarray, o: jnp.ndarray,
                       d: jnp.ndarray, dist: jnp.ndarray, rng: jnp.ndarray,
                       active: jnp.ndarray):
    """Ratio tracking with RR (reference src/impl/vol_grid.cu:177-198)."""
    B = o.shape[0]
    gid, scale, maj, _ = _grid_params(scene, mid)
    inv_maj = 1.0 / maj

    def body(i, carry):
        t, tr, done, rng = carry
        u, rng = prng.next2d(rng)
        step = -jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12)) * inv_maj
        t_new = t + jax.lax.stop_gradient(step)
        out = t_new >= dist
        p = o + t_new[:, None] * d
        dens = density_lookup(scene.grids, gid, p) * scale
        ratio = jnp.clip(dens * inv_maj, 0.0, 1.0)
        upd = ~done & ~out
        tr = jnp.where(upd, tr * (1.0 - ratio), tr)
        # Russian roulette on very low transmittance (detached)
        trd = jax.lax.stop_gradient(tr)
        rr_kill = upd & (trd < 1e-3) & (u[..., 1] > 0.5)
        tr = jnp.where(rr_kill, 0.0, jnp.where(upd & (trd < 1e-3), tr * 2.0, tr))
        done = done | out | rr_kill | (tr <= 0.0)
        t = jnp.where(upd, t_new, t)
        return t, tr, done, rng

    carry = (jnp.zeros(B), jnp.ones(B), ~active, rng)
    _, tr, _, rng = jax.lax.fori_loop(0, MAX_TRACK_STEPS, body, carry)
    return jnp.clip(tr, 0.0, 1.0), rng


def transmittance_grid_residual(scene: T.Scene, mid: jnp.ndarray, o: jnp.ndarray,
                                d: jnp.ndarray, dist: jnp.ndarray,
                                rng: jnp.ndarray, active: jnp.ndarray):
    """Residual-ratio tracking with an average-density control variate
    (reference src/impl/vol_grid.cu:153-175; avg density from
    compute_volume_sum :47-81; Novák et al. 2014).

    Tr = exp(-σ_c·dist) · E[ ∏ (1 − (σ(x_i) − σ_c)/σ_r) ] with
    σ_c = scale·avg_density and residual majorant
    σ_r = max(σ_c, maj − σ_c): the analytic control absorbs the bulk of
    the optical depth, so the stochastic residual product has far lower
    variance in dense, smooth regions than plain ratio tracking."""
    gid, scale, maj, _ = _grid_params(scene, mid)
    return transmittance_residual_arrays(scene.grids, gid, scale, maj,
                                         o, d, dist, rng, active)


def transmittance_residual_arrays(grids: T.GridMediumData, gid, scale, maj,
                                  o: jnp.ndarray, d: jnp.ndarray,
                                  dist: jnp.ndarray, rng: jnp.ndarray,
                                  active: jnp.ndarray):
    """transmittance_grid_residual against raw arrays (shared with the
    fused split driver, like sample_distance_arrays above)."""
    B = o.shape[0]
    sigma_c = grids.avg_density[gid] * scale
    sigma_r = jnp.maximum(jnp.maximum(sigma_c, maj - sigma_c), 1e-6)
    inv_maj = 1.0 / sigma_r

    def body(i, carry):
        t, tr, done, rng = carry
        u, rng = prng.next2d(rng)
        step = -jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12)) * inv_maj
        t_new = t + jax.lax.stop_gradient(step)
        out = t_new >= dist
        p = o + t_new[:, None] * d
        dens = density_lookup(grids, gid, p) * scale
        upd = ~done & ~out
        # signed residual factor — may exceed 1 when σ < σ_c, still unbiased
        tr = jnp.where(upd, tr * (1.0 - (dens - sigma_c) * inv_maj), tr)
        # Russian roulette on |Tr| (detached, reference resets Tr to 1)
        trd = jnp.abs(jax.lax.stop_gradient(tr))
        rr = upd & (trd < 0.1)
        kill = rr & (u[..., 1] >= trd)
        tr = jnp.where(kill, 0.0, jnp.where(rr, tr / jnp.maximum(trd, 1e-12), tr))
        done = done | out | kill
        t = jnp.where(upd, t_new, t)
        return t, tr, done, rng

    carry = (jnp.zeros(B), jnp.ones(B), ~active, rng)
    _, tr, _, rng = jax.lax.fori_loop(0, MAX_TRACK_STEPS, body, carry)
    ctrl = jnp.exp(-sigma_c * jnp.maximum(dist, 0.0))
    return tr * ctrl, rng


def query_emission(scene: T.Scene, mid: jnp.ndarray, p: jnp.ndarray):
    """Blackbody emission at medium points (reference query_emission,
    src/impl/vol_grid.cu:97-102)."""
    m = jnp.maximum(mid, 0)
    gid = jnp.maximum(scene.media.grid_id[m], 0)
    emis_scale = scene.media.emission_scale[m]
    temp = density_lookup(scene.grids, gid, p, field="emission")
    # emission grids store normalized temperature; map to Kelvin range
    rgb = blackbody_rgb(temp * 3000.0 + 800.0)
    return rgb * (emis_scale * jnp.clip(temp, 0.0, None))[:, None]
