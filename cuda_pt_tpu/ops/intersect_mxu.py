"""Matmul-form brute-force intersection: ray x prim tests on the MXU.

The VPU/gather formulation (ops/intersect.py) materialises (B, P, 3)
broadcasts and evaluates Möller-Trumbore elementwise — memory-bound on TPU.
This module exploits that every MT numerator is a scalar TRIPLE PRODUCT,
i.e. LINEAR in per-ray features once the per-prim part is factored out:

    a     = e1 . (d x e2)            =  d . (e2 x e1)
    u . a = (o - p0) . (d x e2)      =  w . e2  -  d . (e2 x p0)
    v . a = d . ((o - p0) x e1)      = -w . e1  -  d . (p0 x e1)
    t . a = e2 . ((o - p0) x e1)     =  o . n   -  p0 . n,   n = e1 x e2

with w = o x d. Stacking per-ray features F = [o, d, w, 1, o.d, |o|^2]
(B, 12) and per-prim coefficient columns G (12, 4) turns ALL ray x prim
tests into ONE (B, 12) @ (12, 4P) matmul — MXU work instead of VPU
broadcasts, no (B, P, 3) intermediates. Analytic spheres (center c = p0,
radius r = e1.x, reference src/core/primitives.cuh:35-55) ride the same
contraction:

    b_half = oc . d = (o . d) - d . c
    cc     = |oc|^2 - r^2 = |o|^2 - o . 2c + (|c|^2 - r^2)

filling output slots [b_half, 0, 0, cc], selected by the is_sphere mask.

This is the TPU-native descendant of the reference's precomputed-adjoint
trick (src/core/aos.cuh:113-221 — it precomputes per-triangle terms to save
FMAs per thread; here the precomputation factors the whole test into a
matrix so the systolic array does it). Fully differentiable: G is built
from geometry inside the trace, so gradients flow to vertices.

The prim axis is processed in chunks under lax.scan (carrying the running
best hit) to bound the (B, chunk, 4) intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.types import Geometry

HIT_EPS = 1e-4
_DET_EPS = 1e-12
DEFAULT_CHUNK = 1024


def _ray_features(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """(B, 12): [o, d, o x d, 1, o.d, |o|^2]."""
    w = jnp.cross(o, d)
    one = jnp.ones_like(o[..., :1])
    od = jnp.sum(o * d, axis=-1, keepdims=True)
    oo = jnp.sum(o * o, axis=-1, keepdims=True)
    return jnp.concatenate([o, d, w, one, od, oo], axis=-1)


def prim_matrix(geom: Geometry) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-prim coefficient tensor G (P, 12, 4) + sphere mask (P,).

    Feature slots: o = 0:3, d = 3:6, w = 6:9, const = 9, o.d = 10,
    |o|^2 = 11. Output slots: tri [a, u*a, v*a, t*a]; sphere
    [b_half, 0, 0, cc]. Pure jnp — safe under jit, and XLA hoists it out
    of render loops as loop-invariant."""
    p0, e1, e2 = geom.p0, geom.e1, geom.e2
    P = p0.shape[0]
    n = jnp.cross(e1, e2)
    G = jnp.zeros((P, 12, 4), jnp.float32)
    # a = d . (e2 x e1)
    G = G.at[:, 3:6, 0].set(jnp.cross(e2, e1))
    # u*a = w . e2 - d . (e2 x p0)
    G = G.at[:, 6:9, 1].set(e2)
    G = G.at[:, 3:6, 1].set(-jnp.cross(e2, p0))
    # v*a = -w . e1 - d . (p0 x e1)
    G = G.at[:, 6:9, 2].set(-e1)
    G = G.at[:, 3:6, 2].set(-jnp.cross(p0, e1))
    # t*a = o . n - p0 . n
    G = G.at[:, 0:3, 3].set(n)
    G = G.at[:, 9, 3].set(-jnp.sum(p0 * n, axis=-1))

    # sphere overrides (center c = p0, radius r = e1.x)
    c = p0
    r = e1[..., 0]
    Gs = jnp.zeros((P, 12, 4), jnp.float32)
    Gs = Gs.at[:, 10, 0].set(1.0)  # o.d
    Gs = Gs.at[:, 3:6, 0].set(-c)  # - d.c
    Gs = Gs.at[:, 11, 3].set(1.0)  # |o|^2
    Gs = Gs.at[:, 0:3, 3].set(-2.0 * c)
    Gs = Gs.at[:, 9, 3].set(jnp.sum(c * c, axis=-1) - r * r)

    sph = geom.is_sphere
    G = jnp.where(sph[:, None, None], Gs, G)
    return G, sph


def _chunk_tests(F, Gc, sph_c, t_clip):
    """One chunk: (B, 12) @ (12, 4K) -> per-pair (t, ok, u, v)."""
    K = Gc.shape[0]
    out = jax.lax.dot_general(
        F, Gc.reshape(K, 12 * 4).T.reshape(12, 4 * K),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(F.shape[0], 4, K)
    o0, o1, o2, o3 = out[:, 0], out[:, 1], out[:, 2], out[:, 3]

    # triangle decode
    a = o0
    f = 1.0 / jnp.where(jnp.abs(a) < _DET_EPS, _DET_EPS, a)
    u = o1 * f
    v = o2 * f
    t_tri = o3 * f
    tri_ok = (
        (jnp.abs(a) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t_tri > HIT_EPS)
    )

    # sphere decode
    bh = o0
    cc = o3
    disc = bh * bh - cc
    # safe sqrt: d(sqrt)/d(disc) at the clamp point is inf, and inf*0 = NaN
    # poisons vertex gradients through the jnp.where selects downstream —
    # substitute 1.0 under the mask instead of clamping to 0
    disc_pos = disc > 0.0
    sq = jnp.sqrt(jnp.where(disc_pos, disc, 1.0))
    sq = jnp.where(disc_pos, sq, 0.0)
    t0 = -bh - sq
    t1 = -bh + sq
    t_sph = jnp.where(t0 > HIT_EPS, t0, t1)
    sph_ok = (disc > 0.0) & (t_sph > HIT_EPS)

    sph_b = sph_c[None, :]
    t = jnp.where(sph_b, t_sph, t_tri)
    ok = ((sph_b & sph_ok) | (~sph_b & tri_ok)) & (t < t_clip)
    b1 = jnp.where(sph_b, 0.0, u)
    b2 = jnp.where(sph_b, 0.0, v)
    return t, ok, b1, b2


def _centroid(geom: Geometry) -> jnp.ndarray:
    """Scene AABB center, detached. The expanded quadratic cc = |o|^2 -
    2 o.c + (|c|^2 - r^2) and the |o|-scaled w = o x d features cancel
    catastrophically in f32 when the scene sits far from the origin
    (advisor r2 finding) — re-centering rays and prims about this point
    keeps feature magnitudes O(scene size). The test is translation-
    invariant, so stop_gradient drops only an analytically-zero term."""
    lo = jnp.min(geom.p0, axis=0)
    hi = jnp.max(geom.p0, axis=0)
    return jax.lax.stop_gradient(0.5 * (lo + hi))


def _padded(geom: Geometry, chunk: int):
    """G/sphere-mask padded to a chunk multiple, reshaped (C, chunk, ...)."""
    G, sph = prim_matrix(geom)
    P = G.shape[0]
    chunk = min(chunk, max(P, 1))
    Pp = -(-P // chunk) * chunk
    # padding prims: all-zero G rows -> a = 0 -> rejected by the det test
    G = jnp.pad(G, ((0, Pp - P), (0, 0), (0, 0)))
    sph = jnp.pad(sph, (0, Pp - P))
    return (G.reshape(Pp // chunk, chunk, 12, 4),
            sph.reshape(Pp // chunk, chunk), chunk, Pp)


def closest_hit_mxu(geom: Geometry, o, d, t_max=None,
                    chunk: int = DEFAULT_CHUNK):
    """MXU-contraction closest hit over every primitive. Same contract as
    intersect.closest_hit_brute: dict(t, prim, hit, b1, b2)."""
    B = o.shape[0]
    c0 = _centroid(geom)
    Gc, sphc, chunk, Pp = _padded(geom.replace(p0=geom.p0 - c0), chunk)
    C = Gc.shape[0]
    F = _ray_features(o - c0, d)
    t_clip = jnp.inf if t_max is None else t_max[:, None]

    def step(carry, xs):
        t_best, prim, b1, b2 = carry
        Gk, sk, base = xs
        t, ok, u, v = _chunk_tests(F, Gk, sk, t_clip)
        t = jnp.where(ok, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        ar = jnp.arange(B)
        t_k, ok_k = t[ar, k], ok[ar, k]
        better = ok_k & (t_k < t_best)
        t_best = jnp.where(better, t_k, t_best)
        prim = jnp.where(better, base + k.astype(jnp.int32), prim)
        b1 = jnp.where(better, u[ar, k], b1)
        b2 = jnp.where(better, v[ar, k], b2)
        return (t_best, prim, b1, b2), None

    init = (jnp.full((B,), jnp.inf), jnp.full((B,), -1, jnp.int32),
            jnp.zeros((B,)), jnp.zeros((B,)))
    bases = jnp.arange(C, dtype=jnp.int32) * chunk
    if C == 1:
        (t, prim, b1, b2), _ = step(init, (Gc[0], sphc[0], bases[0]))
    else:
        (t, prim, b1, b2), _ = jax.lax.scan(step, init, (Gc, sphc, bases))
    return {"t": t, "prim": prim, "hit": prim >= 0, "b1": b1, "b2": b2}


def occlusion_mxu(geom: Geometry, o, d, t_far, chunk: int = DEFAULT_CHUNK):
    """Any-hit up to t_far (shadow rays). True = occluded."""
    c0 = _centroid(geom)
    Gc, sphc, chunk, Pp = _padded(geom.replace(p0=geom.p0 - c0), chunk)
    C = Gc.shape[0]
    F = _ray_features(o - c0, d)
    t_clip = t_far[:, None] * (1.0 - 1e-3)

    def step(occ, xs):
        Gk, sk = xs
        _, ok, _, _ = _chunk_tests(F, Gk, sk, t_clip)
        return occ | jnp.any(ok, axis=-1), None

    init = jnp.zeros((o.shape[0],), bool)
    if C == 1:
        occ, _ = step(init, (Gc[0], sphc[0]))
    else:
        occ, _ = jax.lax.scan(step, init, (Gc, sphc))
    return occ
