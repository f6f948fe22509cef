"""Depth renderer + BVH traversal-cost visualizer.

Parity with the reference debug renderers (src/pt_impl/depth.cu,
src/pt_impl/bvh_cost.cu): single-bounce depth with min/max normalization and
optional log2 scaling through a colormap, and node/prim traversal-test
heatmaps with max-cost scaling. On TPU the block/global atomic min-max
reductions become plain jnp reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..accel import traverse
from ..core import camera as cam_mod
from ..core import rng as prng
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
