"""Batched 8-wide BVH traversal with per-lane ordered stacks (JAX).

Per lax.while_loop step, every lane pops one stack entry:

- interior  → gather its 8 child AABBs ((B,8,3) slabs in one vector op),
  push surviving children *far-to-near* so the nearest is popped first;
- leaf      → fixed-K primitive tests (same gather as the binary walk);
- pruned    → an entry whose recorded entry t_near >= current t_best is
  discarded at pop (the ordered-descent payoff: whole far subtrees die
  after a close hit).

This buys what the skip-encoded binary loop (accel/traverse.py)
structurally cannot: ~4-6x fewer serial steps (8 boxes per step instead
of 1) and near-child-first visit order. The reference's SIMT walk gets
ordering from per-thread stacks (src/renderer/tracing_func.cuh:117-181);
this is the batched vector-machine equivalent, with the stack as a
(B, S) carry of static shape.

Stack safety: S = WideBVHArrays.max_stack is a build-time worst-case
bound (see accel/wide_build.py); writes use a sacrificial padding column
so masked pushes never scatter out of bounds.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import intersect as isect
from ..scene.types import Geometry, WideBVHArrays

_EMPTY = jnp.iinfo(jnp.int32).min  # wide_build.EMPTY: unfilled child slot


@flax.struct.dataclass
class _WideState:
    stack: jnp.ndarray  # (B, S+1) int32 entries (pad col S)
    stack_t: jnp.ndarray  # (B, S+1) f32 entry t_near at push time
    sp: jnp.ndarray  # (B,) int32
    t: jnp.ndarray
    prim: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray
    node_cnt: jnp.ndarray
    prim_cnt: jnp.ndarray
    pop_cnt: jnp.ndarray  # total pops incl. leaf + pruned (= serial steps)
    max_sp: jnp.ndarray


def _child_slabs(wb: WideBVHArrays, nid, o, inv_d, t_best):
    """(B,8) t_near + hit mask for the 8 children of wide nodes nid.
    bf16 boxes (conservatively rounded outward at build) upcast to f32
    after the gather — the bandwidth saving is in the gather itself."""
    cmin = wb.child_min[nid].astype(jnp.float32)  # (B, 8, 3)
    cmax = wb.child_max[nid].astype(jnp.float32)
    t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
    t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (B, 8)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    # empty slots carry inverted boxes (min=+inf) -> tn=+inf > tf: auto-miss
    hit = (tn <= tf) & (tf > isect.HIT_EPS) & (tn < t_best[:, None])
    return tn, hit


def closest_hit_wide(
    geom: Geometry,
    wb: WideBVHArrays,
    o: jnp.ndarray,
    d: jnp.ndarray,
    count_cost: bool = False,
):
    """Closest hit. Same contract as accel/traverse.closest_hit_bvh."""
    B = o.shape[0]
    S = wb.max_stack
    K = wb.max_leaf
    N = geom.num_prims
    W = wb.num_nodes
    L = wb.num_leaves
    safe_d = jnp.where(jnp.abs(d) < 1e-8, jnp.where(d < 0, -1e-8, 1e-8), d)
    inv_d = 1.0 / safe_d
    ar = jnp.arange(B)
    karange = jnp.arange(K, dtype=jnp.int32)[None, :]

    zero = o[:, 0] * 0.0  # inherits shard_map varying axes
    izero = zero.astype(jnp.int32)
    stack = jnp.zeros((B, S + 1), jnp.int32) + izero[:, None]  # root id 0
    stack_t = jnp.full((B, S + 1), jnp.inf, jnp.float32) + zero[:, None]
    stack_t = stack_t.at[:, 0].set(0.0)
    init = _WideState(
        stack=stack,
        stack_t=stack_t,
        sp=izero + 1,
        t=zero + jnp.inf,
        prim=izero - 1,
        b1=zero,
        b2=zero,
        node_cnt=izero,
        prim_cnt=izero,
        pop_cnt=izero,
        max_sp=izero + 1,
    )

    def cond(s: _WideState):
        return jnp.any(s.sp > 0)

    def body(s: _WideState):
        live = s.sp > 0
        top = jnp.clip(s.sp - 1, 0, S - 1)
        e = s.stack[ar, top]
        e_tn = s.stack_t[ar, top]
        sp = jnp.where(live, s.sp - 1, s.sp)
        act = live & (e_tn < s.t)  # ordered-descent pruning at pop
        is_leaf = e < 0

        # --- leaf lanes: K primitive tests ------------------------------
        lid = jnp.clip(-e - 1, 0, L - 1)
        lbase = wb.leaf_base[lid]
        lcnt = wb.leaf_count[lid]
        ids = jnp.clip(lbase[:, None] + karange, 0, N - 1)
        valid = (karange < lcnt[:, None]) & (act & is_leaf)[:, None]
        t_k, hit_k, b1_k, b2_k = isect.intersect_gather(geom, o, d, ids, valid)
        t_k = jnp.where(hit_k & (t_k < s.t[:, None]), t_k, jnp.inf)
        k = jnp.argmin(t_k, axis=-1)
        t_new = t_k[ar, k]
        better = jnp.isfinite(t_new)
        t_best = jnp.where(better, t_new, s.t)

        # --- interior lanes: expand 8 children --------------------------
        expand = act & ~is_leaf
        nid = jnp.clip(e, 0, W - 1)
        cnode = wb.child_node[nid]  # (B, 8)
        tn_c, hit_c = _child_slabs(wb, nid, o, inv_d, t_best)
        # empty slots pass the swap-slab test (inverted box -> tn=-inf,
        # tf=+inf) — mask them out explicitly
        hit_c = hit_c & expand[:, None] & (cnode != _EMPTY)
        npush = jnp.sum(hit_c, axis=-1).astype(jnp.int32)  # (B,)
        # far-to-near push order: ascending sort of -t_near (misses -> +inf)
        order = jnp.argsort(jnp.where(hit_c, -tn_c, jnp.inf), axis=-1)
        r8 = jnp.arange(8, dtype=jnp.int32)
        pos = jnp.where(
            (r8[None, :] < npush[:, None]) & expand[:, None],
            sp[:, None] + r8[None, :],
            S,  # sacrificial pad column
        )
        ent = jnp.take_along_axis(cnode, order, axis=-1)
        etn = jnp.take_along_axis(tn_c, order, axis=-1)
        new_stack = s.stack
        new_stack_t = s.stack_t
        for r in range(8):
            new_stack = new_stack.at[ar, pos[:, r]].set(ent[:, r])
            new_stack_t = new_stack_t.at[ar, pos[:, r]].set(etn[:, r])
        sp = sp + jnp.where(expand, npush, 0)

        return _WideState(
            stack=new_stack,
            stack_t=new_stack_t,
            sp=sp,
            t=t_best,
            prim=jnp.where(better, ids[ar, k], s.prim),
            b1=jnp.where(better, b1_k[ar, k], s.b1),
            b2=jnp.where(better, b2_k[ar, k], s.b2),
            node_cnt=s.node_cnt + expand.astype(jnp.int32),
            prim_cnt=s.prim_cnt + jnp.sum(valid, axis=-1).astype(jnp.int32),
            pop_cnt=s.pop_cnt + live.astype(jnp.int32),
            max_sp=jnp.maximum(s.max_sp, sp),
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
        out["pop_cnt"] = s.pop_cnt
        out["max_sp"] = s.max_sp
    return out


def occlusion_wide(
    geom: Geometry,
    wb: WideBVHArrays,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_far: jnp.ndarray,
):
    """Any-hit shadow test (unordered pushes, early-out by clearing sp)."""
    B = o.shape[0]
    S = wb.max_stack
    K = wb.max_leaf
    N = geom.num_prims
    W = wb.num_nodes
    L = wb.num_leaves
    safe_d = jnp.where(jnp.abs(d) < 1e-8, jnp.where(d < 0, -1e-8, 1e-8), d)
    inv_d = 1.0 / safe_d
    ar = jnp.arange(B)
    karange = jnp.arange(K, dtype=jnp.int32)[None, :]
    t_lim = t_far * (1.0 - 1e-3)

    zero = o[:, 0] * 0.0
    izero = zero.astype(jnp.int32)
    stack = jnp.zeros((B, S + 1), jnp.int32) + izero[:, None]

    def cond(state):
        _, sp, occ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, occ = state
        live = sp > 0
        top = jnp.clip(sp - 1, 0, S - 1)
        e = stack[ar, top]
        sp = jnp.where(live, sp - 1, sp)
        is_leaf = e < 0

        lid = jnp.clip(-e - 1, 0, L - 1)
        ids = jnp.clip(wb.leaf_base[lid][:, None] + karange, 0, N - 1)
        valid = (karange < wb.leaf_count[lid][:, None]) & (live & is_leaf)[:, None]
        t_k, hit_k, _, _ = isect.intersect_gather(geom, o, d, ids, valid)
        occ = occ | jnp.any(hit_k & (t_k < t_lim[:, None]), axis=-1)

        expand = live & ~is_leaf & ~occ
        nid = jnp.clip(e, 0, W - 1)
        cnode = wb.child_node[nid]
        tn_c, hit_c = _child_slabs(wb, nid, o, inv_d, t_lim)
        hit_c = hit_c & expand[:, None] & (cnode != _EMPTY)
        npush = jnp.sum(hit_c, axis=-1).astype(jnp.int32)
        order = jnp.argsort(~hit_c, axis=-1, stable=True)  # hits first
        ent = jnp.take_along_axis(cnode, order, axis=-1)
        r8 = jnp.arange(8, dtype=jnp.int32)
        pos = jnp.where(
            (r8[None, :] < npush[:, None]) & expand[:, None],
            sp[:, None] + r8[None, :],
            S,
        )
        for r in range(8):
            stack = stack.at[ar, pos[:, r]].set(ent[:, r])
        sp = sp + jnp.where(expand, npush, 0)
        sp = jnp.where(occ, 0, sp)  # early-out
        return stack, sp, occ

    _, _, occluded = jax.lax.while_loop(cond, body, (stack, izero + 1, izero > 0))
    return occluded
