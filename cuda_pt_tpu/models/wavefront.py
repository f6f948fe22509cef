"""Wavefront path tracer: per-bounce material sorting + SoA ray pool.

TPU re-design of the reference WFPT (src/renderer/wavefront_pt.cuh,
src/pt_impl/wf_path_tracer.cu): the giant PayLoadBufferSoA becomes the
PTState pytree (SoA by construction); thrust::sort-by-material-key becomes a
``jnp.argsort`` over (dead, material) keys with a gather of the whole state;
the compaction boundary becomes the sorted prefix (dead lanes sink to the
back, so shading gathers touch a dense prefix of live lanes). Control never
returns to the host between bounces — the whole pipeline is one
``lax.while_loop`` (SURVEY.md §3.3 notes the reference crosses host↔device
every bounce; XLA keeps it on-device).

Radiance is splatted back to pixels at the end via scatter-add (the lanes
carry their pixel ids through the sorts), mirroring radiance_splat
(src/pt_impl/wavefront_pt.cu:476-503).

The per-lane RNG travels with the lane, so for a pure permutation the result
is bit-identical to the megakernel renderer — which the tests assert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod
from ..core import qmc
from ..core.config import MaxDepthParams
from ..scene import types as T
from . import path_tracer as pt


def _permute(tree, perm):
    return jax.tree_util.tree_map(
        lambda x: x[perm] if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == perm.shape[0] else x,
        tree,
    )


def _sort_key(scene: T.Scene, s: pt.PTState, hit, spatial: bool = True):
    """Sort key: dead lanes last, material-type major (reference index-buffer
    key packing, src/pt_impl/wavefront_pt.cu:41-69), Morton code of the hit
    point minor — spatial coherence feeds the packet traversal kernel."""
    from ..ops import morton

    prim = jnp.maximum(hit["prim"], 0)
    obj = scene.geom.obj_idx[prim]
    bid = jnp.maximum(scene.objects.bsdf_id[obj], 0)
    btype = scene.bsdfs.btype[bid].astype(jnp.uint32)
    live = s.active & hit["hit"]
    key = btype << 27
    if spatial:
        t_safe = jnp.where(live, jnp.minimum(hit["t"], 1e7), 0.0)
        p = s.o + t_safe[:, None] * s.d
        code = morton.morton3d(p, scene.bvh.node_min[0], scene.bvh.node_max[0])
        key = key | ((code >> 3) & jnp.uint32(0x07FFFFFF))
    return jnp.where(live, key, jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)


def trace_paths_wavefront(
    scene: T.Scene,
    md: MaxDepthParams,
    o: jnp.ndarray,
    d: jnp.ndarray,
    rng: jnp.ndarray,
    use_bvh: bool,
    sort_rays: bool = True,
    compact: bool = False,
    compact_levels: int = 7,
    guide=None,
    wl_u=None,
    nee_candidates: int = 1,
):
    """Bounce loop with per-bounce sort; returns (L, pixel_perm) where L[i]
    belongs to original lane pixel_perm[i].

    compact=True adds TRUE stream compaction with static shapes: lanes are
    sorted dead-last, the live count selects one of ``compact_levels``
    power-of-two bucket sizes (B, B/2, …, floor 128 lanes), and
    intersection+shading run only on that prefix via lax.switch — the TPU
    equivalent of the reference's thrust compaction boundary
    (src/pt_impl/wf_path_tracer.cu:135-139), where dead rays stop costing
    compute rather than being masked. With live fractions ≤1% after bounce
    ~7 (scripts/analyze_rays.py) the deep ladder keeps late bounces paying
    ~B/64 instead of the round-1 floor of B/8."""
    B = o.shape[0]
    state = pt.init_state(o, d, rng, wl_u)
    lane = jnp.arange(B, dtype=jnp.int32)

    def cond(carry):
        s, _ = carry
        return jnp.any(s.active) & (s.bounce < md.max_depth)

    def body(carry):
        s, pix = carry
        hit = pt.intersect_stage(scene, s, use_bvh)
        if sort_rays:
            key = _sort_key(scene, s, hit)
            perm = jnp.argsort(key)
            s = _permute(s, perm)
            hit = {k: v[perm] for k, v in hit.items()}
            pix = pix[perm]
        s = pt.shade_stage(scene, md, use_bvh, s, hit, guide=guide,
                           nee_candidates=nee_candidates)
        return s, pix

    def body_compact(carry):
        s, pix = carry
        # compaction sort: live lanes to the front (stable keeps coherence)
        perm = jnp.argsort(jnp.where(s.active, 0, 1), stable=True)
        s = _permute(s, perm)
        pix = pix[perm]
        n_live = jnp.sum(s.active.astype(jnp.int32))

        def make_branch(size):
            def run(args):
                s, pix = args
                sub = jax.tree_util.tree_map(
                    lambda x: x[:size]
                    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B
                    else x,
                    s,
                )
                hit = pt.intersect_stage(scene, sub, use_bvh)
                if sort_rays:
                    key = _sort_key(scene, sub, hit)
                    p2 = jnp.argsort(key)
                    sub = _permute(sub, p2)
                    hit = {k: v[p2] for k, v in hit.items()}
                    pix = pix.at[:size].set(pix[:size][p2])
                sub = pt.shade_stage(scene, md, use_bvh, sub, hit, guide=guide,
                                     nee_candidates=nee_candidates)
                s2 = jax.tree_util.tree_map(
                    lambda full, part: full.at[:size].set(part)
                    if hasattr(full, "ndim") and full.ndim >= 1 and full.shape[0] == B
                    else part,
                    s, sub,
                )
                return s2, pix
            return run

        # power-of-two ladder B, B/2, … with a 128-lane floor (one VPU-tile
        # row block); dedupe so tiny batches don't emit duplicate branches
        sizes = [B]
        for k in range(1, max(compact_levels, 1)):
            sz = max(B >> k, min(128, B))
            if sz < sizes[-1]:
                sizes.append(sz)
        branch = jnp.int32(0)
        for sz in sizes[1:]:
            branch = branch + (n_live <= sz).astype(jnp.int32)
        return jax.lax.switch(branch, [make_branch(sz) for sz in sizes], (s, pix))

    final, pix = jax.lax.while_loop(
        cond, body_compact if compact else body, (state, lane)
    )
    return final.L, pix


def render_sample(
    scene: T.Scene,
    cam: cam_mod.Camera,
    md: MaxDepthParams,
    seed,
    sample_idx,
    use_bvh: bool,
    sort_rays: bool = True,
    compact: bool = False,
    guide=None,
    sampler: str = "pcg",
    nee_candidates: int = 1,
):
    """One 1-spp wavefront pass → (H, W, 3)."""
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    rng = qmc.make_state(sampler, seed, lane, sample_idx)
    o, d, rng = cam_mod.generate_rays(cam, lane, rng)
    L, pix = trace_paths_wavefront(scene, md, o, d, rng, use_bvh, sort_rays,
                                   compact, guide=guide,
                                   wl_u=pt.wl_stratum_u(seed, sample_idx, lane),
                                   nee_candidates=nee_candidates)
    img = jnp.zeros((B, 3), jnp.float32).at[pix].add(L)
    return img.reshape(cam.height, cam.width, 3)


def render(
    scene: T.Scene,
    cam: cam_mod.Camera,
    md: MaxDepthParams,
    spp: int,
    seed: int = 0,
    use_bvh=None,
    sort_rays: bool = True,
    compact: bool = False,
    guide=None,
    sampler: str = "pcg",
    nee_candidates: int = 1,
):
    if use_bvh is None:
        use_bvh = scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS

    def body(i, acc):
        return acc + render_sample(scene, cam, md, seed, i, use_bvh, sort_rays,
                                   compact, guide=guide, sampler=sampler,
                                   nee_candidates=nee_candidates)

    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    )
    return acc / spp
