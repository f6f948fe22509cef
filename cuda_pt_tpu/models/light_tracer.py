"""Megakernel light tracer: emitter-to-camera paths with image splatting.

TPU re-design of the reference LT (src/pt_impl/megakernel_lt.cu): paths start
at emitters via sample_le (:65-81), bounce with BSDF sampling, and at every
vertex connect deterministically to the camera — project with splat_pixel,
shadow-test, and splat with the pinhole importance W_e = f_px² / cos³θ. The
atomicAdd splatting (:129-146) becomes a scatter-add; the
specular-constraints caustic gate and caustic scaling carry over; the
``bidirectional`` mode (interleave a PT pass into the same buffer,
src/pt_impl/light_tracer.cu:43-52) is exposed by combine().
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bsdf import eval as bsdf_eval
from ..core import camera as cam_mod
from ..core import math as vm
from ..core import rng as prng
from ..core.config import MaxDepthParams
from ..emitters import emitters
from ..ops import intersect as isect
from ..scene import types as T
from . import path_tracer as pt


def _connect_camera(scene, cam, p, f_cos_over_cosy, thp, active, use_bvh, img, n_spec_ok):
    """Deterministic camera connection from vertices p; splat into img (B?)"""
    to_cam = cam.t - p
    dist = vm.length(to_cam)
    dirn = to_cam / jnp.maximum(dist, 1e-8)[:, None]
    px, py, in_film = cam_mod.splat_pixel(cam, p)
    # origin offset shortens the segment by 1e-3 exactly (offset along dirn)
    occ = pt.occluded(scene, p + dirn * 1e-3, dirn, dist - 1e-3, use_bvh)
    # pinhole importance: W_e = f² / cos³θ (θ vs optical axis)
    cos_axis = jnp.clip(vm.dot(dirn, -cam.R[:, 2]), 1e-3, 1.0)
    we = (cam.focal * cam.focal) / (cos_axis ** 3)
    contrib = thp * f_cos_over_cosy * (we / jnp.maximum(dist * dist, 1e-8))[:, None]
    ok = active & in_film & ~occ & n_spec_ok
    xi = jnp.clip(px.astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, cam.height - 1)
    flat = yi * cam.width + xi
    contrib = jnp.where(ok[:, None], contrib, 0.0)
    return img.at[flat].add(contrib)


def render_pass(scene: T.Scene, cam: cam_mod.Camera, md: MaxDepthParams,
                seed, pass_idx, use_bvh: bool, specular_constraint: int = 0,
                caustic_scale: float = 1.0, n_paths: int = 0,
                sampler: str = "pcg"):
    """One light-tracing pass of n_paths light paths → (H*W, 3) splat sum.

    sampler="sobol" stratifies the emitter-surface + emission-direction
    draws (the first QMC dims of each light path) — see core/qmc.py."""
    B = n_paths or cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    if sampler == "sobol":
        from ..core import qmc

        rng = qmc.seed(
            jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(0x5BD1E995),
            lane, pass_idx,
        )
    else:
        rng = prng.seed(
            jnp.asarray(seed, jnp.uint32)
            + jnp.asarray(pass_idx, jnp.uint32) * jnp.uint32(7919)
            + jnp.uint32(0x5BD1E995),
            lane,
        )
    le, rng = emitters.sample_le(scene, rng, B)
    img = jnp.zeros((cam.width * cam.height, 3), jnp.float32)

    # vertex-0 connection: directly visible emitters (radiance Le toward the
    # camera from the sampled emission point)
    to_cam0 = cam.t - le["pos"]
    d0 = to_cam0 / jnp.maximum(vm.length(to_cam0), 1e-8)[:, None]
    cos_e = vm.dot(le["n"], d0)  # front-facing emission only
    f0 = le["thp_pos"] * jnp.maximum(cos_e, 0.0)[:, None]
    gate0 = jnp.full(B, specular_constraint <= 0)
    # AREA_SPOT cone gate for direct emitter→camera visibility (reference
    # AreaSpotSource::eval_le zeroes emission outside the cone).
    in_cone0 = cos_e >= le["cos_gate"]
    img = _connect_camera(
        scene, cam, le["pos"] + le["n"] * 1e-3, f0, jnp.ones((B, 3)),
        le["valid"] & (cos_e > 0.0) & in_cone0, use_bvh, img, gate0,
    )

    # initial state: rays leave the emitter surface
    o = le["pos"] + le["n"] * 1e-3
    d = le["dir"]
    thp = le["thp0"]
    active = le["valid"]
    n_spec = jnp.zeros(B, jnp.int32)

    def cond(carry):
        bounce, o, d, thp, active, n_spec, rng, img = carry
        return jnp.any(active) & (bounce < md.max_depth)

    def body(carry):
        bounce, o, d, thp, active, n_spec, rng, img = carry
        hit = pt.closest_hit(scene, o, d, use_bvh)
        hit_ok = hit["hit"] & active
        prim = jnp.maximum(hit["prim"], 0)
        t_safe = jnp.where(hit_ok, hit["t"], 1.0)
        p = o + t_safe[:, None] * d
        inter = isect.surface_interaction(scene.geom, prim, hit["b1"], hit["b2"], p, d)
        bid = jnp.maximum(scene.objects.bsdf_id[inter["obj"]], 0)
        ctx = bsdf_eval.make_ctx(scene, bid, inter["uv"], inter["n_s"])
        wo = -d

        # camera connection BEFORE scattering (reference :129-146)
        to_cam = cam.t - p
        dirn = to_cam / jnp.maximum(vm.length(to_cam), 1e-8)[:, None]
        f_cos, _ = bsdf_eval.eval_bsdf(ctx, wo, dirn)
        gate = n_spec >= specular_constraint
        img = _connect_camera(
            scene, cam, p, f_cos * caustic_scale, thp, hit_ok, use_bvh, img, gate
        )

        bs, rng = bsdf_eval.sample_bsdf(ctx, wo, rng)
        thp_new = thp * bs["weight"]
        thp_new = jnp.where(jnp.isfinite(thp_new), thp_new, 0.0)
        off = jnp.sign(vm.dot(inter["n_g"], bs["wi"], keepdims=True))
        o_new = p + inter["n_g"] * off * 1e-3
        n_spec_new = n_spec + jnp.where(
            hit_ok & (bs["lobe"] != bsdf_eval.LOBE_DIFFUSE), 1, 0
        )

        # RR
        # RR on the *bounce weight* (initial LT throughput is huge in flux
        # units, so thresholding raw thp would never terminate)
        w_mx = jnp.max(jax.lax.stop_gradient(bs["weight"]), axis=-1)
        mx = jnp.max(jax.lax.stop_gradient(thp_new), axis=-1)
        u_rr, rng = prng.next1d(rng)
        p_srv = jnp.where(bounce >= 1, jnp.clip(w_mx, 0.1, 1.0), 1.0)
        survive = u_rr < p_srv
        thp_new = thp_new / p_srv[:, None]
        active_new = hit_ok & survive & (mx > 0.0)
        return (bounce + 1, o_new, bs["wi"],
                jnp.where(active_new[:, None], thp_new, 0.0),
                active_new, n_spec_new, rng, img)

    carry = (jnp.int32(0), o, d, thp, active, n_spec, rng, img)
    *_, img = jax.lax.while_loop(cond, body, carry)
    return img / B


def render(scene: T.Scene, cam: cam_mod.Camera, md: MaxDepthParams, spp: int,
           seed: int = 0, use_bvh=None, specular_constraint: int = 0,
           caustic_scale: float = 1.0, sampler: str = "pcg"):
    """Light-traced image, averaged over spp passes → (H, W, 3)."""
    if use_bvh is None:
        use_bvh = scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS

    def body(i, acc):
        return acc + render_pass(
            scene, cam, md, seed, i, use_bvh, specular_constraint,
            caustic_scale, sampler=sampler,
        )

    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((cam.width * cam.height, 3), jnp.float32)
    )
    return (acc / spp).reshape(cam.height, cam.width, 3)


def render_bidirectional(scene, cam, md, spp, seed=0, use_bvh=None,
                         specular_constraint: int = 1, caustic_scale: float = 1.0):
    """Reference ``bidirectional`` mode: PT pass + caustic LT pass summed
    (src/pt_impl/light_tracer.cu:43-52)."""
    img_pt = pt.render(scene, cam, md, spp, seed=seed, use_bvh=use_bvh)
    img_lt = render(scene, cam, md, spp, seed=seed + 1, use_bvh=use_bvh,
                    specular_constraint=specular_constraint,
                    caustic_scale=caustic_scale)
    return img_pt + img_lt
