"""Emitter sampling and evaluation (point / area / area-spot / envmap).

TPU re-design of the reference emitter hierarchy (src/core/emitter.cuh:36-359
+ src/impl/emitter.cu): dense parameter tables, masked multi-type evaluation,
area-weighted primitive CDFs precomputed at scene compile (the reference
samples uniform-by-prim via sample_emitter_primitive; area weighting strictly
improves the estimator without changing the API).

NEE strategy pdf (used consistently for both the actual division and the MIS
weights so the combination stays a partition of unity):
  emitter choice: uniform 1/E over all real emitters;
  area emitters:  area-weighted surface point, pdf_area = inv_area(obj);
  envmap:         cosine hemisphere at the shading point (reference
                  EnvMapEmitter::sample, src/core/emitter.cuh:313-359);
  point:          delta (no MIS counterpart).
All sampled positions/directions are detached; radiance values are
differentiable w.r.t. the emission tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as vm
from ..core import rng as prng
from ..core import sampling
from ..scene import textures as tex
from ..scene import types as T


def emitter_radiance(scene: T.Scene, eid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Le of emitter eid (possibly texture-modulated at surface uv)."""
    e = scene.emitters
    base = e.emission[eid] * e.scaler[eid][:, None]
    return tex.scaled_rgb(scene.textures, e.tex_id[eid], uv, base)


def emitter_radiance_hit(
    scene: T.Scene, eid: jnp.ndarray, uv: jnp.ndarray, cos_l: jnp.ndarray
) -> jnp.ndarray:
    """Le toward the viewer for a BSDF-sampled / directly-visible hit on
    emitter eid, with the AREA_SPOT cone gate applied: the reference's
    AreaSpotSource::eval_le returns zero outside the cone
    (src/core/emitter.cuh:225-311), and NEE/sample_le gate the same way —
    the hit-side evaluation must match or MIS no longer sums to the gated
    radiance."""
    le = emitter_radiance(scene, eid, uv)
    in_cone = cos_l >= scene.emitters.extra[eid, 0]
    gate = (scene.emitters.etype[eid] != T.EMITTER_AREA_SPOT) | in_cone
    return jnp.where(gate[..., None], le, 0.0)


def _rot_x(d: jnp.ndarray, ang) -> jnp.ndarray:
    """Rotate direction(s) about the +x axis by ang radians (the envmap
    zenith tilt; the reference composes yaw(azimuth)∘pitch(zenith)
    quaternions, src/core/emitter.cuh:354-357 — azimuth is folded into the
    phi offset, this supplies the pitch)."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    y = c * d[..., 1] - s * d[..., 2]
    z = s * d[..., 1] + c * d[..., 2]
    return jnp.stack([d[..., 0], y, z], axis=-1)


def env_radiance(scene: T.Scene, d: jnp.ndarray) -> jnp.ndarray:
    """Environment radiance for direction d (lat-long HDRI with runtime
    scale/azimuth/zenith rotation — reference src/impl/emitter.cu:26-73)."""
    eid = scene.env_emitter
    e = scene.emitters
    has_env = eid > 0
    scale = e.extra[eid, 0]
    azimuth = e.extra[eid, 1]
    dz = _rot_x(d, e.extra[eid, 2])
    phi = jnp.arctan2(dz[..., 2], dz[..., 0]) + azimuth
    theta = jnp.arccos(jnp.clip(dz[..., 1], -1.0, 1.0))
    u = phi / (2.0 * jnp.pi) + 0.5
    v = theta / jnp.pi
    uv = jnp.stack([u, v], axis=-1)
    tid = jnp.broadcast_to(e.tex_id[eid], d.shape[:-1])
    texv = tex.sample_texture(scene.textures, tid, uv)[..., :3]
    base = e.emission[eid] * e.scaler[eid]
    rad = texv * base * jnp.maximum(scale, 0.0)
    return jnp.where(has_env, rad, jnp.zeros_like(rad))


def sample_emitter(
    scene: T.Scene,
    p: jnp.ndarray,  # (B, 3) shading points
    n: jnp.ndarray,  # (B, 3) shading normals (for envmap cosine sampling)
    rng_state: jnp.ndarray,
):
    """Sample one NEE candidate per ray.

    Returns (out, rng_state) with out = {dir, dist, le, pdf, valid, delta}:
    dir: unit shadow-ray direction; dist: distance to the light point (large
    for envmap); le: emitted radiance toward p; pdf: solid-angle pdf of this
    strategy (includes the 1/E emitter-choice factor); delta: no-MIS flag.
    """
    B = p.shape[0]
    e = scene.emitters

    u_sel, rng_state = prng.next1d(rng_state)
    u_prim, rng_state = prng.next1d(rng_state)
    u_pos, rng_state = prng.next2d(rng_state)

    # emitter ids are 1..num_emitters (slot 0 = null); power-weighted CDF
    # pick (beyond the reference's uniform choice — see EmitterTable.sel_pmf)
    eid = jnp.sum((e.sel_cdf[None, :] < u_sel[:, None]).astype(jnp.int32), -1)
    eid = jnp.clip(eid, 1, e.etype.shape[0] - 1)
    etype = e.etype[eid]
    sel_pdf = jnp.maximum(e.sel_pmf[eid], 1e-12)

    # ---- area / area-spot: pick prim by CDF, point by sqrt-warp ---------
    cdf = e.prim_cdf[eid]  # (B, K)
    kidx = jnp.sum((cdf < u_prim[:, None]).astype(jnp.int32), axis=-1)
    kidx = jnp.minimum(kidx, cdf.shape[1] - 1)
    prim = e.prim_sel[eid, kidx]  # (E, K) table indexed by emitter id

    g = scene.geom
    sph = g.is_sphere[prim]
    bary = sampling.uniform_triangle(u_pos)
    b1, b2 = bary[..., 0], bary[..., 1]
    pos_tri = g.p0[prim] + b1[:, None] * g.e1[prim] + b2[:, None] * g.e2[prim]
    n_tri = vm.normalize(jnp.cross(g.e1[prim], g.e2[prim]))
    uv_tri = (
        (1.0 - b1 - b2)[:, None] * g.uv0[prim]
        + b1[:, None] * g.uv1[prim]
        + b2[:, None] * g.uv2[prim]
    )
    # spheres: uniform surface point
    sdir, _ = sampling.uniform_sphere(u_pos)
    radius = g.e1[prim][:, 0:1]
    pos_sph = g.p0[prim] + sdir * radius
    n_sph = sdir
    pos_l = jnp.where(sph[:, None], pos_sph, pos_tri)
    n_l = jnp.where(sph[:, None], n_sph, n_tri)
    uv_l = jnp.where(sph[:, None], jnp.zeros_like(uv_tri), uv_tri)

    to_l = pos_l - p
    dist = vm.length(to_l)
    dirn = to_l / jnp.maximum(dist, 1e-8)[:, None]
    cos_l = -vm.dot(dirn, n_l)
    # two-sided? reference area lights emit from the front face only.
    front = cos_l > 1e-6
    obj = e.obj_id[eid]
    inv_area = scene.objects.inv_area[jnp.maximum(obj, 0)]
    pdf_area = sel_pdf * inv_area * (dist * dist) / jnp.maximum(cos_l, 1e-6)
    le_area = emitter_radiance(scene, eid, uv_l)

    # spot cone gating (reference AreaSpotSource, src/core/emitter.cuh:225-311)
    cos_falloff = e.extra[eid, 0]
    in_cone = cos_l >= cos_falloff
    le_area = jnp.where(
        ((etype != T.EMITTER_AREA_SPOT) | in_cone)[:, None], le_area, 0.0
    )
    valid_area = front

    # ---- point source ----------------------------------------------------
    to_p = e.pos[eid] - p
    dist_p = vm.length(to_p)
    dir_p = to_p / jnp.maximum(dist_p, 1e-8)[:, None]
    le_point = emitter_radiance(scene, eid, jnp.zeros_like(uv_l)) / jnp.maximum(
        dist_p * dist_p, 1e-8
    )[:, None]
    pdf_point = jnp.full((B,), 1.0, jnp.float32) * sel_pdf

    # ---- envmap -----------------------------------------------------------
    imp = scene.env_importance
    if imp is not None and imp.enabled:
        # luminance-CDF importance sampling over texels (variance win over
        # the reference's cosine NEE, src/core/emitter.cuh:313-359)
        u_tex, rng_state = prng.next2d(rng_state)
        Hh, Ww = imp.pmf.shape
        row = jnp.sum((imp.row_cdf[None, :] < u_pos[:, 0:1]).astype(jnp.int32), -1)
        row = jnp.minimum(row, Hh - 1)
        ccdf = imp.col_cdf[row]  # (B, W)
        col = jnp.sum((ccdf < u_pos[:, 1:2]).astype(jnp.int32), -1)
        col = jnp.minimum(col, Ww - 1)
        v = (row.astype(jnp.float32) + u_tex[:, 0]) / Hh
        u_ = (col.astype(jnp.float32) + u_tex[:, 1]) / Ww
        theta = v * jnp.pi
        azimuth = e.extra[scene.env_emitter, 1]
        phi = (u_ - 0.5) * (2.0 * jnp.pi) - azimuth
        st = jnp.sin(theta)
        dir_env = jnp.stack(
            [st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)], axis=-1
        )
        # undo the zenith tilt: texel frame → world (inverse of env_radiance)
        dir_env = _rot_x(dir_env, -e.extra[scene.env_emitter, 2])
        le_env = env_radiance(scene, dir_env)
        pdf_env = sel_pdf * imp.pmf[row, col] * (Hh * Ww) / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * st, 1e-6
        )
    else:
        # cosine hemisphere around n (reference strategy)
        d_loc, pdf_env_loc = sampling.cosine_hemisphere(u_pos)
        dir_env = vm.to_world(d_loc, n)
        le_env = env_radiance(scene, dir_env)
        pdf_env = sel_pdf * pdf_env_loc

    is_area = (etype == T.EMITTER_AREA) | (etype == T.EMITTER_AREA_SPOT)
    is_point = etype == T.EMITTER_POINT
    is_env = etype == T.EMITTER_ENVMAP

    dirn_out = jnp.where(is_point[:, None], dir_p, jnp.where(is_env[:, None], dir_env, dirn))
    dist_out = jnp.where(is_point, dist_p, jnp.where(is_env, vm.MAX_DIST, dist))
    le = jnp.where(
        is_point[:, None], le_point, jnp.where(is_env[:, None], le_env, le_area)
    )
    pdf = jnp.where(is_point, pdf_point, jnp.where(is_env, pdf_env, pdf_area))
    valid = jnp.where(is_area, valid_area, True) & (etype != T.EMITTER_NULL)
    valid = valid & (jnp.max(le, axis=-1) > 0.0) & (pdf > 1e-12)

    out = {
        "dir": jax.lax.stop_gradient(dirn_out),
        "dist": jax.lax.stop_gradient(dist_out),
        "le": le,
        "pdf": jax.lax.stop_gradient(pdf),
        "valid": valid,
        "delta": is_point,
        "prim": prim,
        "eid": eid,
    }
    return out, rng_state


def sample_le(scene: T.Scene, rng_state: jnp.ndarray, n_lanes: int):
    """Sample emission position + direction for light tracing (reference
    Emitter::sample_le, src/core/emitter.cuh:54-79 / :141-359).

    Returns (out, rng) with out = {pos, dir, n, thp0, valid}: thp0 is the
    full initial path throughput Le·cos/(p_sel·p_A·p_ω). Area emitters use
    cosine-hemisphere emission (so p_ω = cos/π cancels the cos); point
    sources emit uniformly over the sphere.
    """
    e = scene.emitters
    u_sel, rng_state = prng.next1d(rng_state)
    u_prim, rng_state = prng.next1d(rng_state)
    u_pos, rng_state = prng.next2d(rng_state)
    u_dir, rng_state = prng.next2d(rng_state)

    eid = jnp.sum((e.sel_cdf[None, :] < u_sel[:, None]).astype(jnp.int32), -1)
    eid = jnp.clip(eid, 1, e.etype.shape[0] - 1)
    etype = e.etype[eid]
    sel_pdf = jnp.maximum(e.sel_pmf[eid], 1e-12)

    B = n_lanes
    g = scene.geom
    cdf = e.prim_cdf[eid]
    kidx = jnp.sum((cdf < u_prim[:, None]).astype(jnp.int32), axis=-1)
    kidx = jnp.minimum(kidx, cdf.shape[1] - 1)
    prim = e.prim_sel[eid, kidx]
    sph = g.is_sphere[prim]
    bary = sampling.uniform_triangle(u_pos)
    b1, b2 = bary[..., 0], bary[..., 1]
    pos_tri = g.p0[prim] + b1[:, None] * g.e1[prim] + b2[:, None] * g.e2[prim]
    n_tri = vm.normalize(jnp.cross(g.e1[prim], g.e2[prim]))
    sdir, _ = sampling.uniform_sphere(u_pos)
    pos_sph = g.p0[prim] + sdir * g.e1[prim][:, 0:1]
    pos_l = jnp.where(sph[:, None], pos_sph, pos_tri)
    n_l = jnp.where(sph[:, None], sdir, n_tri)

    # cosine-weighted emission direction: Le cos / (pA pω) = Le·π/ (pA)
    d_loc, _ = sampling.cosine_hemisphere(u_dir)
    dir_area = vm.to_world(d_loc, n_l)
    obj = e.obj_id[eid]
    area = 1.0 / jnp.maximum(
        scene.objects.inv_area[jnp.maximum(obj, 0)], 1e-12
    )
    le = emitter_radiance(scene, eid, jnp.zeros((B, 2), jnp.float32))
    # area-spot emitters only emit inside their cone (same gate as NEE) —
    # the indicator keeps the estimator consistent with the gated Le.
    in_cone = d_loc[..., 2] >= e.extra[eid, 0]
    spot_gate = jnp.where(
        (etype == T.EMITTER_AREA_SPOT) & ~in_cone, 0.0, 1.0
    )
    thp_area = le * (jnp.pi * area * spot_gate / sel_pdf)[..., None] * jnp.ones((B, 1))

    # point: uniform sphere direction; thp = I·4π/sel
    dir_pnt, _ = sampling.uniform_sphere(u_dir)
    thp_pnt = le * (4.0 * jnp.pi / sel_pdf)[..., None]

    is_point = etype == T.EMITTER_POINT
    is_area = (etype == T.EMITTER_AREA) | (etype == T.EMITTER_AREA_SPOT)
    pos = jnp.where(is_point[:, None], e.pos[eid], pos_l)
    dirn = jnp.where(is_point[:, None], dir_pnt, dir_area)
    nrm = jnp.where(is_point[:, None], dirn, n_l)
    thp0 = jnp.where(is_point[:, None], thp_pnt, thp_area)
    valid = is_point | is_area
    # positional throughput Le·A/p_sel — used for the emission-vertex →
    # camera connection (directly visible emitters); zero for point sources
    # (measure-zero on the film).
    thp_pos = jnp.where(
        is_area[:, None], le * (area / sel_pdf)[..., None], jnp.zeros_like(le)
    )
    # cone threshold for direct emitter→camera connections: AREA_SPOT only
    # emits within cos >= extra[eid,0]; -1 (always pass) otherwise.
    cos_gate = jnp.where(etype == T.EMITTER_AREA_SPOT, e.extra[eid, 0], -1.0)
    out = {
        "pos": jax.lax.stop_gradient(pos),
        "dir": jax.lax.stop_gradient(dirn),
        "n": jax.lax.stop_gradient(nrm),
        "thp0": thp0,
        "thp_pos": thp_pos,
        "valid": valid,
        "is_point": is_point,
        "cos_gate": cos_gate,
    }
    return out, rng_state


def hit_emitter_pdf(scene: T.Scene, obj: jnp.ndarray, t: jnp.ndarray, cos_l: jnp.ndarray):
    """Solid-angle pdf that NEE would have generated a BSDF-sampled hit on an
    area emitter (for the MIS weight at emitter hits)."""
    eid = scene.objects.emitter_id[jnp.maximum(obj, 0)]
    sel = scene.emitters.sel_pmf[jnp.clip(eid, 0, scene.emitters.sel_pmf.shape[0] - 1)]
    inv_area = scene.objects.inv_area[jnp.maximum(obj, 0)]
    return sel * inv_area * (t * t) / jnp.maximum(cos_l, 1e-6)


def env_nee_pdf(scene: T.Scene, n_prev: jnp.ndarray, d: jnp.ndarray):
    """Solid-angle pdf that envmap NEE would pick direction d at the previous
    vertex — cached into the loop state for envmap MIS. Matches whichever
    strategy sample_emitter uses (importance tables or cosine fallback)."""
    sel = scene.emitters.sel_pmf[scene.env_emitter]
    has_env = scene.env_emitter > 0
    imp = scene.env_importance
    if imp is not None and imp.enabled:
        Hh, Ww = imp.pmf.shape
        azimuth = scene.emitters.extra[scene.env_emitter, 1]
        dz = _rot_x(d, scene.emitters.extra[scene.env_emitter, 2])
        phi = jnp.arctan2(dz[..., 2], dz[..., 0]) + azimuth
        theta = jnp.arccos(jnp.clip(dz[..., 1], -1.0, 1.0))
        u = phi / (2.0 * jnp.pi) + 0.5
        v = theta / jnp.pi
        col = jnp.clip((u - jnp.floor(u)) * Ww, 0, Ww - 1).astype(jnp.int32)
        row = jnp.clip(v * Hh, 0, Hh - 1).astype(jnp.int32)
        st = jnp.maximum(jnp.sin(theta), 1e-6)
        pdf = imp.pmf[row, col] * (Hh * Ww) / (2.0 * jnp.pi * jnp.pi * st) * sel
        return jnp.where(has_env, pdf, 0.0)
    cos_t = jnp.maximum(vm.dot(d, n_prev), 0.0)
    return jnp.where(has_env, cos_t * sampling.INV_PI * sel, 0.0)
