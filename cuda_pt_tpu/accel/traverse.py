"""Batched stackless BVH traversal in JAX.

TPU re-design of the reference's per-thread stackless walk
(ray_intersect_bvh / occlusion_test_bvh, src/renderer/tracing_func.cuh:44-181):
every ray in the batch holds its own node pointer; one ``lax.while_loop``
steps all rays together (gather node → slab test → fixed-K leaf block →
advance by +1 on interior hit / skip[] on miss). The loop runs until every
lane has walked off the end of the node array — the vector-machine analogue
of SIMT divergence, bounded by DFS-order locality of the gathers.

A traversal-counting variant backs the BVH-cost visualizer (reference
ray_intersect_cost, src/pt_impl/bvh_cost.cu:38-101).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import intersect as isect
from ..scene.types import BVHArrays, Geometry


@flax.struct.dataclass
class _TravState:
    ptr: jnp.ndarray
    t: jnp.ndarray
    prim: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray
    node_cnt: jnp.ndarray
    prim_cnt: jnp.ndarray


def _slab(nmin, nmax, o, inv_d, t_best):
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf > isect.HIT_EPS) & (tn < t_best)


def closest_hit_bvh(
    geom: Geometry,
    bvh: BVHArrays,
    o: jnp.ndarray,
    d: jnp.ndarray,
    max_leaf: int | None = None,
    count_cost: bool = False,
):
    """Closest hit via stackless traversal. Same contract as
    ops.intersect.closest_hit_brute. With count_cost, also returns per-ray
    node/prim test counters. max_leaf defaults to the tree's own build
    capacity — passing a smaller constant silently skips prims (see
    BVHArrays.max_leaf)."""
    if max_leaf is None:
        max_leaf = bvh.max_leaf
    B = o.shape[0]
    M = bvh.num_nodes
    N = geom.num_prims
    safe_d = jnp.where(jnp.abs(d) < 1e-8, jnp.where(d < 0, -1e-8, 1e-8), d)
    inv_d = 1.0 / safe_d
    karange = jnp.arange(max_leaf, dtype=jnp.int32)[None, :]

    # init derived from o so the carry inherits shard_map varying axes
    zero = o[:, 0] * 0.0
    izero = zero.astype(jnp.int32)
    init = _TravState(
        ptr=izero,
        t=zero + jnp.inf,
        prim=izero - 1,
        b1=zero,
        b2=zero,
        node_cnt=izero,
        prim_cnt=izero,
    )

    def cond(s: _TravState):
        return jnp.any(s.ptr < M)

    def body(s: _TravState):
        live = s.ptr < M
        pc = jnp.minimum(s.ptr, M - 1)
        nmin = bvh.node_min[pc]
        nmax = bvh.node_max[pc]
        cnt = bvh.node_count[pc]
        base = bvh.node_base[pc]
        skip = bvh.node_skip[pc]

        box_hit = _slab(nmin, nmax, o, inv_d, s.t) & live
        is_leaf = cnt > 0
        do_leaf = box_hit & is_leaf

        ids = jnp.clip(base[:, None] + karange, 0, N - 1)
        valid = (karange < cnt[:, None]) & do_leaf[:, None]
        t_k, hit_k, b1_k, b2_k = isect.intersect_gather(geom, o, d, ids, valid)
        t_k = jnp.where(hit_k & (t_k < s.t[:, None]), t_k, jnp.inf)
        k = jnp.argmin(t_k, axis=-1)
        ar = jnp.arange(B)
        t_new = t_k[ar, k]
        better = jnp.isfinite(t_new)
        ptr_next = jnp.where(box_hit & ~is_leaf, s.ptr + 1, skip)
        return _TravState(
            ptr=jnp.where(live, ptr_next, s.ptr),
            t=jnp.where(better, t_new, s.t),
            prim=jnp.where(better, ids[ar, k], s.prim),
            b1=jnp.where(better, b1_k[ar, k], s.b1),
            b2=jnp.where(better, b2_k[ar, k], s.b2),
            node_cnt=s.node_cnt + live.astype(jnp.int32),
            prim_cnt=s.prim_cnt + jnp.sum(valid, axis=-1).astype(jnp.int32),
        )

    s = jax.lax.while_loop(cond, body, init)
    out = {
        "t": s.t,
        "prim": s.prim,
        "hit": s.prim >= 0,
        "b1": s.b1,
        "b2": s.b2,
    }
    if count_cost:
        out["node_cnt"] = s.node_cnt
        out["prim_cnt"] = s.prim_cnt
    return out


def occlusion_bvh(
    geom: Geometry,
    bvh: BVHArrays,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_far: jnp.ndarray,
    max_leaf: int | None = None,
):
    """Any-hit shadow test (early-out per lane by parking ptr at M).
    Reference: occlusion_test_bvh, src/renderer/tracing_func.cuh:44-99.
    max_leaf defaults to the tree's own build capacity."""
    if max_leaf is None:
        max_leaf = bvh.max_leaf
    B = o.shape[0]
    M = bvh.num_nodes
    N = geom.num_prims
    safe_d = jnp.where(jnp.abs(d) < 1e-8, jnp.where(d < 0, -1e-8, 1e-8), d)
    inv_d = 1.0 / safe_d
    karange = jnp.arange(max_leaf, dtype=jnp.int32)[None, :]
    t_lim = t_far * (1.0 - 1e-3)

    def cond(state):
        ptr, occ = state
        return jnp.any(ptr < M)

    def body(state):
        ptr, occ = state
        live = ptr < M
        pc = jnp.minimum(ptr, M - 1)
        cnt = bvh.node_count[pc]
        box_hit = _slab(bvh.node_min[pc], bvh.node_max[pc], o, inv_d, t_lim) & live
        is_leaf = cnt > 0
        do_leaf = box_hit & is_leaf
        ids = jnp.clip(bvh.node_base[pc][:, None] + karange, 0, N - 1)
        valid = (karange < cnt[:, None]) & do_leaf[:, None]
        t_k, hit_k, _, _ = isect.intersect_gather(geom, o, d, ids, valid)
        found = jnp.any(hit_k & (t_k < t_lim[:, None]), axis=-1)
        occ = occ | found
        ptr_next = jnp.where(box_hit & ~is_leaf, ptr + 1, bvh.node_skip[pc])
        ptr_next = jnp.where(occ, M, ptr_next)  # early-out
        return jnp.where(live, ptr_next, ptr), occ

    izero = (o[:, 0] * 0.0).astype(jnp.int32)  # shard_map-varying init
    _, occluded = jax.lax.while_loop(cond, body, (izero, izero > 0))
    return occluded
