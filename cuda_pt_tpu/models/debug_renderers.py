"""Depth renderer + BVH traversal-cost visualizer + AOV pass.

Parity with the reference debug renderers (src/pt_impl/depth.cu,
src/pt_impl/bvh_cost.cu): single-bounce depth with min/max normalization and
optional log2 scaling through a colormap, and node/prim traversal-test
heatmaps with max-cost scaling. On TPU the block/global atomic min-max
reductions become plain jnp reductions.

render_aovs goes beyond the reference: first-hit feature buffers (textured
albedo, normal-mapped shading normal, emission, linear depth, coverage) in
one pass — the standard auxiliary inputs for OIDN/OptiX-style denoisers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel import traverse
from ..bsdf import eval as bsdf_eval
from ..core import camera as cam_mod
from ..core import math as vm
from ..core import rng as prng
from ..emitters import emitters
from ..ops import intersect as isect
from ..scene import types as T
from ..utils import colormap


def _primary_rays(cam: cam_mod.Camera, seed: int = 0):
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    rng = prng.seed(jnp.uint32(seed), lane)
    o, d, _ = cam_mod.generate_rays(cam, lane, rng)
    return o, d


def render_depth(
    scene: T.Scene,
    cam: cam_mod.Camera,
    map_id: int = 0,
    log_scale: bool = False,
    use_bvh: bool = True,
    seed: int = 0,
):
    """Primary-hit depth → normalized colormap image (H, W, 3).

    Reference: render_depth_kernel + false_color_mapping
    (src/pt_impl/depth.cu:42-113)."""
    o, d = _primary_rays(cam, seed)
    if use_bvh:
        hit = traverse.closest_hit_bvh(
            scene.geom, scene.bvh, o, d, max_leaf=scene.bvh.max_leaf
        )
    else:
        hit = isect.closest_hit_brute(scene.geom, o, d)
    t = jnp.where(hit["hit"], hit["t"], jnp.nan)
    tmin = jnp.nanmin(t)
    tmax = jnp.nanmax(t)
    x = (t - tmin) / jnp.maximum(tmax - tmin, 1e-8)
    if log_scale:
        x = jnp.log2(1.0 + x) / jnp.log2(2.0)
    x = jnp.where(jnp.isnan(x), 1.0, x)
    img = colormap.apply_colormap(jnp.clip(x, 0.0, 1.0), map_id)
    return img.reshape(cam.height, cam.width, 3), {
        "depth": jnp.where(jnp.isnan(t), 0.0, t).reshape(cam.height, cam.width),
        "t_min": tmin,
        "t_max": tmax,
    }


def render_aovs(
    scene: T.Scene,
    cam: cam_mod.Camera,
    spp: int = 1,
    seed: int = 0,
    use_bvh: bool = True,
):
    """First-hit AOV buffers for denoiser interop, averaged over spp
    jittered camera samples (the same per-(pixel, sample) RNG streams as
    path_tracer.render_sample, so AOVs align with the beauty pass's
    antialiasing).

    Returns a dict of (H, W, ...) arrays:
      albedo   — textured base color (kd+ks+kg clipped to [0,1]);
                 env radiance (clipped) on miss
      normal   — world-space normal-mapped shading normal; 0 on miss
      emission — Le of emitter hits (cone-gated for spots); env on miss
      depth    — linear hit distance; 0 on miss
      coverage — fraction of samples that hit geometry
    """
    from . import path_tracer as pt

    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)

    def one(i):
        rng = prng.seed(
            jnp.asarray(seed, jnp.uint32) + jnp.uint32(i) * jnp.uint32(9781),
            lane,
        )
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        hit = pt.closest_hit(scene, o, d, use_bvh)
        ok = hit["hit"]
        prim = jnp.maximum(hit["prim"], 0)
        t_safe = jnp.where(ok, hit["t"], 1.0)
        p = o + t_safe[:, None] * d
        inter = isect.surface_interaction(scene.geom, prim, hit["b1"], hit["b2"], p, d)
        obj = inter["obj"]
        bid = jnp.maximum(scene.objects.bsdf_id[obj], 0)
        eid = jnp.maximum(scene.objects.emitter_id[obj], 0)
        ctx = bsdf_eval.make_ctx(scene, bid, inter["uv"], inter["n_s"])
        env = emitters.env_radiance(scene, d)
        # per-family base color: the slot each family's eval actually tints
        # with (bsdf/eval.py): lambert+mirror kd; translucent/dispersion ks;
        # conductor kg; plastic coat kd+ks; forward (null) white
        bt = ctx["btype"][:, None]
        base = ctx["kd"]
        base = jnp.where(
            (bt == T.BSDF_TRANSLUCENT) | (bt == T.BSDF_DISPERSION)
            | (bt == T.BSDF_GGX_DIELECTRIC),
            ctx["ks"], base)
        base = jnp.where(
            (bt == T.BSDF_PLASTIC) | (bt == T.BSDF_PLASTIC_FORWARD),
            ctx["kd"] + ctx["ks"], base)
        base = jnp.where(bt == T.BSDF_GGX_CONDUCTOR, ctx["kg"], base)
        base = jnp.where(bt == T.BSDF_FORWARD, 1.0, base)
        base = jnp.clip(base, 0.0, 1.0)
        albedo = jnp.where(ok[:, None], base, jnp.clip(env, 0.0, 1.0))
        normal = jnp.where(ok[:, None], ctx["n"], 0.0)
        cos_l = -vm.dot(d, inter["n_g"])
        le = emitters.emitter_radiance_hit(scene, eid, inter["uv"], cos_l)
        # eid slot 0 is the null emitter (same gate as path_tracer's
        # emit_mask) — non-emitting surfaces must report zero emission
        emission = jnp.where((ok & (eid > 0))[:, None], le,
                             jnp.where(ok[:, None], 0.0, env))
        depth = jnp.where(ok, hit["t"], 0.0)
        return albedo, normal, emission, depth, ok.astype(jnp.float32)

    def body(i, acc):
        a, n, e, t, c = one(i)
        return (acc[0] + a, acc[1] + n, acc[2] + e, acc[3] + t, acc[4] + c)

    z3 = jnp.zeros((B, 3), jnp.float32)
    z1 = jnp.zeros((B,), jnp.float32)
    a, n, e, t, c = jax.lax.fori_loop(0, spp, body, (z3, z3, z3, z1, z1))
    H, W = cam.height, cam.width
    # renormalize the normal average back onto the sphere (0 stays 0)
    n_mean = n / spp
    n_len = jnp.linalg.norm(n_mean, axis=-1, keepdims=True)
    n_unit = jnp.where(n_len > 1e-6, n_mean / jnp.maximum(n_len, 1e-6), 0.0)
    return {
        "albedo": (a / spp).reshape(H, W, 3),
        "normal": n_unit.reshape(H, W, 3),
        "emission": (e / spp).reshape(H, W, 3),
        "depth": (t / spp).reshape(H, W),
        "coverage": (c / spp).reshape(H, W),
    }


def render_bvh_cost(
    scene: T.Scene,
    cam: cam_mod.Camera,
    mode: str = "total",  # node | prim | total
    map_id: int = 2,
    max_cost: float = 0.0,  # 0 → auto (observed max)
    seed: int = 0,
):
    """Traversal-cost heatmap (reference ray_intersect_cost,
    src/pt_impl/bvh_cost.cu:38-130)."""
    o, d = _primary_rays(cam, seed)
    out = traverse.closest_hit_bvh(
        scene.geom, scene.bvh, o, d, count_cost=True, max_leaf=scene.bvh.max_leaf
    )
    node = out["node_cnt"].astype(jnp.float32)
    prim = out["prim_cnt"].astype(jnp.float32)
    cost = {"node": node, "prim": prim}.get(mode, node + prim)
    denom = jnp.asarray(max_cost, jnp.float32)
    denom = jnp.where(denom > 0, denom, jnp.max(cost))
    x = jnp.clip(cost / jnp.maximum(denom, 1e-8), 0.0, 1.0)
    img = colormap.apply_colormap(x, map_id)
    return img.reshape(cam.height, cam.width, 3), {
        "mean_cost": jnp.mean(cost),
        "max_cost": jnp.max(cost),
    }
