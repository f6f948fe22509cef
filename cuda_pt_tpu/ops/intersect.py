"""Batched ray-primitive intersection (triangles + analytic spheres).

TPU-native counterpart of the reference's Primitive::intersect
(src/core/primitives.cuh:33-124): instead of one thread per ray with a
precomputed-adjoint scalar pipeline, we evaluate Möller-Trumbore on (B, K)
ray×prim blocks so the VPU runs 8x128 lanes of it at once. Sphere prims ride
in triangle slots (p0 = center, e1.x = radius), selected by mask — no
branches.

All routines are differentiable; hit *attributes* (t, barycentrics, normals)
carry gradients w.r.t. geometry while the discrete hit decision itself is
boolean (SURVEY.md §7 decision 4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as vm
from ..scene.types import Geometry

HIT_EPS = 1e-4


def intersect_gather(
    geom: Geometry,
    o: jnp.ndarray,  # (B, 3)
    d: jnp.ndarray,  # (B, 3)
    prim_ids: jnp.ndarray,  # (B, K) int32 (may contain duplicates / padding)
    valid: jnp.ndarray,  # (B, K) bool — padding mask
):
    """Intersect each ray with K gathered primitives.

    Returns (t, hit, b1, b2): all (B, K); t = +inf where no hit. For spheres
    (b1, b2) encode the unit normal's (theta, phi) surrogate — consumers use
    sphere_interaction instead.
    """
    p0 = geom.p0[prim_ids]  # (B, K, 3)
    e1 = geom.e1[prim_ids]
    e2 = geom.e2[prim_ids]
    sph = geom.is_sphere[prim_ids]  # (B, K)

    ob = o[:, None, :]
    db = d[:, None, :]

    # Möller-Trumbore
    h = jnp.cross(db, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    s = ob - p0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(db * q, axis=-1)
    t_tri = f * jnp.sum(e2 * q, axis=-1)
    tri_ok = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t_tri > HIT_EPS)
    )

    # Sphere: |o + t d - c|^2 = r^2 (reference src/core/primitives.cuh:35-55)
    c = p0
    r = e1[..., 0]
    oc = ob - c
    b_half = jnp.sum(oc * db, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b_half * b_half - cc
    # Double-where safe sqrt: sqrt'(0)=inf meets the miss-lane zero in the
    # VJP as inf*0=NaN, poisoning vertex grads whenever ANY ray-sphere disc
    # <= 0 (same fix as intersect_mxu.py; advisor r2 finding).
    disc_pos = disc > 0.0
    sq = jnp.where(disc_pos, jnp.sqrt(jnp.where(disc_pos, disc, 1.0)), 0.0)
    t0 = -b_half - sq
    t1 = -b_half + sq
    t_sph = jnp.where(t0 > HIT_EPS, t0, t1)
    sph_ok = (disc > 0.0) & (t_sph > HIT_EPS)

    t = jnp.where(sph, t_sph, t_tri)
    hit = jnp.where(sph, sph_ok, tri_ok) & valid
    t = jnp.where(hit, t, jnp.inf)
    b1 = jnp.where(sph, 0.0, u)
    b2 = jnp.where(sph, 0.0, v)
    return t, hit, b1, b2


def closest_hit_brute(geom: Geometry, o: jnp.ndarray, d: jnp.ndarray, t_max=None):
    """O(N) closest hit over every primitive — correctness oracle and the
    fast path for small scenes (a (B, N) vectorized block beats traversal
    when N is tiny). Returns dict(t, prim, hit, b1, b2)."""
    B = o.shape[0]
    N = geom.num_prims
    ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    valid = jnp.ones((B, N), bool)
    t, hit, b1, b2 = intersect_gather(geom, o, d, ids, valid)
    if t_max is not None:
        keep = t < t_max[:, None]
        hit = hit & keep
        t = jnp.where(keep, t, jnp.inf)
    k = jnp.argmin(t, axis=-1)
    ar = jnp.arange(B)
    return {
        "t": t[ar, k],
        "prim": jnp.where(hit[ar, k], k.astype(jnp.int32), -1),
        "hit": hit[ar, k],
        "b1": b1[ar, k],
        "b2": b2[ar, k],
    }


def occlusion_brute(geom: Geometry, o: jnp.ndarray, d: jnp.ndarray, t_far: jnp.ndarray):
    """Any-hit test up to t_far (shadow rays). True = occluded."""
    B = o.shape[0]
    N = geom.num_prims
    ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    valid = jnp.ones((B, N), bool)
    t, hit, _, _ = intersect_gather(geom, o, d, ids, valid)
    occluded = hit & (t < t_far[:, None] * (1.0 - 1e-3))
    return jnp.any(occluded, axis=-1)


def surface_interaction(geom: Geometry, prim: jnp.ndarray, b1, b2, p_hit, d):
    """Interpolated hit record (reference get_interaction,
    src/core/primitives.cuh:109-124 + Interaction struct).

    prim: (B,) int32 (clamped to valid range by caller for inactive lanes).
    Returns dict(n_s shading normal, n_g geometric normal, uv, obj).
    """
    n0 = geom.n0[prim]
    n1 = geom.n1[prim]
    n2 = geom.n2[prim]
    uv0 = geom.uv0[prim]
    uv1 = geom.uv1[prim]
    uv2 = geom.uv2[prim]
    sph = geom.is_sphere[prim]
    w = (1.0 - b1 - b2)[:, None]
    n_tri = vm.normalize(w * n0 + b1[:, None] * n1 + b2[:, None] * n2)
    uv_tri = w * uv0 + b1[:, None] * uv1 + b2[:, None] * uv2
    e1 = geom.e1[prim]
    e2 = geom.e2[prim]
    ng_tri = vm.normalize(jnp.cross(e1, e2))
    # flip geometric normal to shading-normal hemisphere
    ng_tri = jnp.where(vm.dot(ng_tri, n_tri, keepdims=True) < 0.0, -ng_tri, ng_tri)

    # Sphere: outward normal; lat-long UV.
    c = geom.p0[prim]
    r = jnp.maximum(e1[..., 0:1], 1e-8)
    n_sph = (p_hit - c) / r
    n_sph = vm.normalize(n_sph)
    u_sph = (jnp.arctan2(n_sph[..., 1], n_sph[..., 0]) / (2.0 * jnp.pi)) + 0.5
    v_sph = jnp.arccos(jnp.clip(n_sph[..., 2], -1.0, 1.0)) / jnp.pi
    uv_sph = jnp.stack([u_sph, v_sph], axis=-1)

    sphb = sph[:, None]
    n_s = jnp.where(sphb, n_sph, n_tri)
    n_g = jnp.where(sphb, n_sph, ng_tri)
    uv = jnp.where(sphb, uv_sph, uv_tri)
    return {
        "n_s": n_s,
        "n_g": n_g,
        "uv": uv,
        "obj": geom.obj_idx[prim],
    }
