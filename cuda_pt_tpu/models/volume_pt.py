"""Volumetric path tracer: nested media, distance sampling, transmittance NEE.

TPU re-design of the reference megakernel VPT (src/pt_impl/megakernel_vpt.cu):

- The per-thread uchar4 BankStack of nested media (≤3 levels, :64-94)
  becomes per-lane (B, 3) int32 stack arrays with masked push/pop.
- Free-flight sampling dispatches homogeneous channel-MIS vs grid delta
  tracking by medium type (:264-266); both are fixed-shape masked code.
- NEE estimates transmittance along the shadow ray by *walking interfaces*
  (null/forward BSDFs and cullable boundaries) exactly like
  occlusion_transmittance_estimate (:104-201), capped at a fixed number of
  crossings.
- Medium events: phase-function NEE + scattering, optional blackbody
  emission (:330-348); surface events update the medium stack by a
  hemisphere crossing test (:383-404).
- ToF time-gating on accumulated path distance (:49-57, 407-416).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..bsdf import eval as bsdf_eval
from ..core import camera as cam_mod
from ..core import math as vm
from ..core import qmc
from ..core import rng as prng
from ..core import sampling
from ..core.config import MaxDepthParams
from ..emitters import emitters
from ..media import grid as grid_med
from ..media import homogeneous as homo
from ..media import phase as phase_mod
from ..ops import intersect as isect
from ..scene import types as T
from . import path_tracer as pt

MAX_NESTED = 3  # reference BankStack depth
MAX_CROSSINGS = 4  # interface crossings per shadow ray


@flax.struct.dataclass
class VPTState:
    o: jnp.ndarray
    d: jnp.ndarray
    thp: jnp.ndarray
    L: jnp.ndarray
    rng: jnp.ndarray
    active: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    env_pdf: jnp.ndarray
    n_diff: jnp.ndarray
    n_spec: jnp.ndarray
    n_trans: jnp.ndarray
    n_vol: jnp.ndarray
    dist: jnp.ndarray
    wl: jnp.ndarray
    med_stack: jnp.ndarray  # (B, MAX_NESTED) int32
    med_top: jnp.ndarray  # (B,) int32, -1 = ambient
    bounce: jnp.ndarray
    rays: jnp.ndarray  # per-lane traced-ray count (segments + shadow)
    # stratified wavelength uniform (see path_tracer.wl_stratum_u)
    wl_u: jnp.ndarray | None = None


def _peek(s: VPTState, ambient) -> jnp.ndarray:
    idx = jnp.clip(s.med_top, 0, MAX_NESTED - 1)
    ar = jnp.arange(s.med_top.shape[0])
    return jnp.where(s.med_top >= 0, s.med_stack[ar, idx], ambient)


def _push(stack, top, m, do):
    top_new = jnp.where(do, jnp.minimum(top + 1, MAX_NESTED - 1), top)
    slot = (jnp.arange(MAX_NESTED)[None, :] == top_new[:, None]) & do[:, None]
    return jnp.where(slot, m[:, None], stack), top_new


def _pop(top, do):
    return jnp.where(do, jnp.maximum(top - 1, -1), top)


def _medium_type_masks(scene: T.Scene, mid: jnp.ndarray):
    m = jnp.maximum(mid, 0)
    mtype = scene.media.mtype[m]
    in_med = mid >= 0
    is_homo = in_med & (mtype == T.MEDIUM_HOMOGENEOUS)
    is_grid = in_med & (mtype == T.MEDIUM_GRID)
    return is_homo, is_grid


def _has_grids(scene: T.Scene) -> bool:
    return scene.grids.density.size > 1  # sentinel (1,1,1,1) when absent


def sample_medium_distance(scene, mid, o, d, t_surf, rng, active):
    """Dispatch homogeneous/grid free-flight sampling; vacuum lanes pass."""
    is_homo, is_grid = _medium_type_masks(scene, mid)
    u, rng = prng.next2d(rng)
    hs = homo.sample_distance(scene.media, mid, t_surf, u)
    t = jnp.where(is_homo, hs["t"], t_surf)
    is_med = is_homo & hs["is_medium"]
    weight = jnp.where(is_homo[:, None], hs["weight"], 1.0)
    if _has_grids(scene):
        gs, rng = grid_med.sample_distance_grid(
            scene, mid, o, d, t_surf, rng, active & is_grid
        )
        t = jnp.where(is_grid, gs["t"], t)
        is_med = is_med | (is_grid & gs["is_medium"])
        weight = jnp.where(is_grid[:, None], gs["weight"], weight)
    return {"t": t, "is_medium": is_med & active, "weight": weight}, rng


# Grid transmittance estimator: "residual" (default; residual-ratio with
# average-density control variate, lower variance in dense media) or
# "ratio" (plain ratio tracking — the reference's default, its residual
# variant is marked TODO at src/impl/vol_grid.cu:152).
GRID_TRANSMITTANCE = "residual"


def segment_transmittance(scene, mid, o, d, dist, rng, active):
    """Transmittance of ONE medium segment (no interfaces)."""
    is_homo, is_grid = _medium_type_masks(scene, mid)
    tr = jnp.where(
        is_homo[:, None], homo.transmittance(scene.media, mid, dist), 1.0
    )
    if _has_grids(scene):
        fn = (
            grid_med.transmittance_grid_residual
            if GRID_TRANSMITTANCE == "residual"
            else grid_med.transmittance_grid
        )
        trg, rng = fn(scene, mid, o, d, dist, rng, active & is_grid)
        tr = jnp.where(is_grid[:, None], tr * trg[:, None], tr)
    return tr, rng


def transmittance_estimate(scene, p, dirn, dist, mid0, rng, active, use_bvh):
    """Walk the shadow ray through null/cullable interfaces, multiplying
    per-segment medium transmittance; opaque hit → 0 (reference
    occlusion_transmittance_estimate, megakernel_vpt.cu:104-201)."""
    B = p.shape[0]
    tr = jnp.ones((B, 3), jnp.float32)
    cur_p = p
    cur_med = mid0
    remaining = dist
    alive = active

    for _ in range(MAX_CROSSINGS):
        hit = pt.closest_hit(scene, cur_p, dirn, use_bvh)
        t_hit = jnp.minimum(hit["t"], remaining)
        seg = jnp.where(jnp.isfinite(t_hit), t_hit, remaining)
        tr_seg, rng = segment_transmittance(
            scene, cur_med, cur_p, dirn, seg, rng, alive
        )
        tr = jnp.where(alive[:, None], tr * tr_seg, tr)

        hit_surface = hit["hit"] & (hit["t"] < remaining * (1.0 - 1e-3)) & alive
        # clamp t on miss lanes: inf * 0-direction-component = NaN
        t_step = jnp.where(hit["hit"], hit["t"], remaining)
        prim = jnp.maximum(hit["prim"], 0)
        obj = scene.geom.obj_idx[prim]
        bid = jnp.maximum(scene.objects.bsdf_id[obj], 0)
        is_null = (scene.bsdfs.btype[bid] == T.BSDF_FORWARD) | scene.objects.cullable[obj]
        blocked = hit_surface & ~is_null
        tr = jnp.where(blocked[:, None], 0.0, tr)
        # cross the null interface: object-identity toggle (same rule as the
        # bounce loop — exiting if we're already inside this object's medium)
        p_hit = cur_p + t_step[:, None] * dirn
        med_obj = scene.objects.medium_in[obj]
        crossed = hit_surface & is_null
        toggled = jnp.where(
            cur_med == med_obj, jnp.int32(T.MEDIUM_NONE), med_obj
        )
        cur_med = jnp.where(crossed & (med_obj >= 0), toggled, cur_med)
        # decrement by the FULL advance (t_step + the 1e-3 origin offset):
        # `remaining` must stay equal to the true distance-to-light from the
        # advanced origin, or after 2+ crossings the accumulated offsets
        # push the light inside the (1-1e-3) relative gate and the
        # destination itself reads as a blocker — NEE through any null
        # interface silently lost (round-5 fused-grid A/B found it)
        remaining = jnp.where(crossed, remaining - t_step - 1e-3, remaining)
        cur_p = jnp.where(crossed[:, None], p_hit + dirn * 1e-3, cur_p)
        alive = alive & crossed & (remaining > 1e-4)

    return tr, rng


def vpt_bounce(scene: T.Scene, md: MaxDepthParams, use_bvh: bool, s: VPTState,
               fixed_rr: bool = False) -> VPTState:
    B = s.o.shape[0]
    ambient = scene.cam_medium
    cur_med = _peek(s, ambient)

    hit = pt.closest_hit(scene, s.o, s.d, use_bvh)
    t_surf = jnp.where(hit["hit"], hit["t"], vm.MAX_DIST)
    miss = s.active & ~hit["hit"]

    # ---- free flight through the current medium -------------------------
    ms, rng = sample_medium_distance(
        scene, cur_med, s.o, s.d, t_surf, s.rng, s.active
    )
    thp = jnp.where(s.active[:, None], s.thp * ms["weight"], s.thp)
    med_event = ms["is_medium"]
    srf_event = s.active & hit["hit"] & ~med_event
    t_evt = ms["t"]
    p_evt = s.o + t_evt[:, None] * s.d
    dist_new = s.dist + jnp.where(s.active, t_evt, 0.0)
    tofw = pt._tof_weight(md, dist_new)

    # ---- miss: environment (only when not absorbed in medium) ----------
    env_le = emitters.env_radiance(scene, s.d)
    w_env = jnp.where(s.prev_delta, 1.0, sampling.power_heuristic(s.prev_pdf, s.env_pdf))
    esc = miss & ~med_event
    L = s.L + jnp.where(esc[:, None], thp * env_le * (w_env * pt._tof_weight(md, s.dist))[:, None], 0.0)

    # ---- surface interaction -------------------------------------------
    prim = jnp.maximum(hit["prim"], 0)
    inter = isect.surface_interaction(scene.geom, prim, hit["b1"], hit["b2"], p_evt, s.d)
    obj = inter["obj"]
    bid = jnp.maximum(scene.objects.bsdf_id[obj], 0)
    eid = scene.objects.emitter_id[obj]

    # emitter hit MIS (surface lanes only)
    cos_l = -vm.dot(s.d, inter["n_g"])
    le_hit = emitters.emitter_radiance_hit(scene, jnp.maximum(eid, 0), inter["uv"], cos_l)
    pdf_l = emitters.hit_emitter_pdf(scene, obj, t_evt, jnp.maximum(cos_l, 1e-6))
    w_hit = jnp.where(s.prev_delta, 1.0, sampling.power_heuristic(s.prev_pdf, pdf_l))
    emit_mask = srf_event & (eid > 0) & (cos_l > 1e-6)
    L = L + jnp.where(emit_mask[:, None], thp * le_hit * (w_hit * tofw)[:, None], 0.0)

    # ---- blackbody emission at medium events ----------------------------
    if _has_grids(scene):
        emis = grid_med.query_emission(scene, cur_med, p_evt)
        L = L + jnp.where(med_event[:, None], thp * emis * tofw[:, None], 0.0)

    # ---- NEE (both event kinds) with transmittance ----------------------
    ctx = bsdf_eval.make_ctx(scene, bid, inter["uv"], inter["n_s"])
    wo = -s.d
    es, rng = emitters.sample_emitter(scene, p_evt, ctx["n"], rng)
    # surface throughput
    f_srf, bpdf_srf = bsdf_eval.eval_bsdf(ctx, wo, es["dir"])
    # medium throughput: phase value
    m = jnp.maximum(cur_med, 0)
    pv = phase_mod.phase_eval(
        scene.media.phase_type[m], scene.media.phase_g[m][:, 0],
        scene.media.phase_g[m][:, 1], scene.media.phase_w[m], s.d, es["dir"],
    )
    f_evt = jnp.where(med_event[:, None], pv[:, None], f_srf)
    pdf_evt = jnp.where(med_event, pv, bpdf_srf)

    off_sign = jnp.where(med_event, 0.0, jnp.sign(vm.dot(inter["n_g"], es["dir"])))
    p_shadow = p_evt + inter["n_g"] * off_sign[:, None] * 1e-3
    # subtract the origin-offset projection from the segment length (see
    # path_tracer.shade_stage — prevents emitter self-occlusion)
    dist_shadow = es["dist"] - jnp.abs(
        off_sign * vm.dot(inter["n_g"], es["dir"])
    ) * 1e-3
    nee_try = (med_event | srf_event) & es["valid"] & (jnp.max(f_evt, axis=-1) > 0.0)
    tr_nee, rng = transmittance_estimate(
        scene, p_shadow, es["dir"], dist_shadow, cur_med, rng, nee_try, use_bvh
    )
    # final-bounce NEE takes full weight (see path_tracer.shade_stage)
    last_bounce = s.bounce >= (md.max_depth - 1)
    w_nee = jnp.where(
        es["delta"] | last_bounce, 1.0, sampling.power_heuristic(es["pdf"], pdf_evt)
    )
    tof_nee = pt._tof_weight(
        md, dist_new + jnp.where(es["dist"] < vm.MAX_DIST * 0.5, es["dist"], 0.0)
    )
    contrib = thp * f_evt * es["le"] * tr_nee * (
        w_nee * tof_nee / jnp.maximum(es["pdf"], 1e-12)
    )[:, None]
    L = L + jnp.where(nee_try[:, None], contrib, 0.0)

    # ---- scatter --------------------------------------------------------
    # medium: phase sampling
    u2, rng = prng.next2d(rng)
    u1, rng = prng.next1d(rng)
    d_phase, pdf_phase = phase_mod.phase_sample(
        scene.media.phase_type[m], scene.media.phase_g[m][:, 0],
        scene.media.phase_g[m][:, 1], scene.media.phase_w[m], s.d, u2, u1,
    )
    # surface: BSDF sampling
    bs, rng = bsdf_eval.sample_bsdf(ctx, wo, rng, wl=s.wl, u_wl=s.wl_u)

    d_new = jnp.where(med_event[:, None], d_phase, bs["wi"])
    w_new = jnp.where(med_event[:, None], 1.0, bs["weight"])  # phase: f/pdf = 1
    thp = thp * jnp.where((med_event | srf_event)[:, None], w_new, 1.0)
    thp = jnp.where(jnp.isfinite(thp), thp, 0.0)

    off2 = jnp.where(med_event, 0.0, jnp.sign(vm.dot(inter["n_g"], d_new)))
    o_new = p_evt + inter["n_g"] * off2[:, None] * 1e-3
    env_pdf = emitters.env_nee_pdf(scene, ctx["n"], d_new)

    # ---- medium stack update on surface crossings -----------------------
    # Winding-robust object-identity toggle (instead of the reference's
    # hemisphere test, megakernel_vpt.cu:383-404, which requires consistent
    # mesh winding): a transmitted ray EXITS if the stack top already holds
    # this object's medium, otherwise it ENTERS it.
    med_obj = scene.objects.medium_in[obj]
    transmitted = srf_event & (bs["lobe"] == bsdf_eval.LOBE_TRANSMIT) & (med_obj >= 0)
    do_pop = transmitted & (cur_med == med_obj)
    do_push = transmitted & ~do_pop
    med_stack, med_top = _push(s.med_stack, s.med_top, med_obj, do_push)
    med_top = _pop(med_top, do_pop)

    # ---- depth caps + RR -------------------------------------------------
    n_diff = s.n_diff + jnp.where(srf_event & (bs["lobe"] == bsdf_eval.LOBE_DIFFUSE), 1, 0)
    n_spec = s.n_spec + jnp.where(srf_event & (bs["lobe"] == bsdf_eval.LOBE_SPECULAR), 1, 0)
    n_trans = s.n_trans + jnp.where(srf_event & (bs["lobe"] == bsdf_eval.LOBE_TRANSMIT), 1, 0)
    n_vol = s.n_vol + jnp.where(med_event, 1, 0)
    depth_ok = (
        (n_diff <= md.max_diffuse)
        & (n_spec <= md.max_specular)
        & (n_trans <= md.max_transmit)
        & (n_vol <= md.max_volume)
    )
    max_thp = jnp.max(jax.lax.stop_gradient(thp), axis=-1)
    u_rr, rng = prng.next1d(rng)
    if fixed_rr:
        # θ-independent schedule (see path_tracer.shade_stage): unbiased grads
        sched = jnp.exp(-0.25 * jnp.maximum(s.bounce.astype(jnp.float32) - 1.0, 0.0))
        p_survive = jnp.where(s.bounce >= 1, jnp.maximum(sched, 0.1), 1.0)
        p_survive = jnp.broadcast_to(p_survive, max_thp.shape)
    else:
        p_survive = jnp.where(s.bounce >= 1, jnp.clip(max_thp, 0.1, 1.0), 1.0)
    survive = u_rr < p_survive
    thp = thp / p_survive[:, None]
    active = (med_event | srf_event) & depth_ok & survive & (max_thp > 0.0)

    return VPTState(
        o=o_new,
        d=d_new,
        thp=jnp.where(active[:, None], thp, 0.0),
        L=L,
        rng=rng,
        active=active,
        prev_pdf=jnp.where(active, jnp.where(med_event, pdf_phase, bs["pdf"]), s.prev_pdf),
        prev_delta=jnp.where(active, jnp.where(med_event, False, bs["is_delta"]), s.prev_delta),
        env_pdf=jnp.where(active, env_pdf, s.env_pdf),
        n_diff=n_diff,
        n_spec=n_spec,
        n_trans=n_trans,
        n_vol=n_vol,
        dist=dist_new,
        wl=jnp.where(active & srf_event, bs["wl"], s.wl),
        wl_u=s.wl_u,
        med_stack=med_stack,
        med_top=med_top,
        bounce=s.bounce + 1,
        rays=s.rays + s.active.astype(jnp.int32) + nee_try.astype(jnp.int32),
    )


def init_state(scene: T.Scene, o, d, rng, wl_u=None) -> VPTState:
    zero = o[:, 0] * 0.0
    true_ = rng[:, 0] >= 0
    izero = zero.astype(jnp.int32)
    return VPTState(
        o=o, d=d,
        thp=o * 0.0 + 1.0,
        L=o * 0.0,
        rng=rng,
        active=true_,
        prev_pdf=zero + 1.0,
        prev_delta=true_,
        env_pdf=zero,
        n_diff=izero, n_spec=izero, n_trans=izero, n_vol=izero,
        dist=zero,
        wl=zero,
        wl_u=wl_u,
        med_stack=izero[:, None] + jnp.full((1, MAX_NESTED), T.MEDIUM_NONE, jnp.int32),
        med_top=izero - 1,
        bounce=jnp.int32(0),
        rays=izero,
    )


def trace_paths(scene, md: MaxDepthParams, o, d, rng, use_bvh: bool,
                differentiable: bool = False, compact: bool = False,
                wl_u=None):
    """compact=True: live-prefix bucket compaction (see models/wavefront.py)
    — returns (L, lane_perm) instead of L so the caller can splat."""
    state = init_state(scene, o, d, rng, wl_u)
    if differentiable:
        # "remat" checkpoints each bounce: backward recomputes the bounce
        # body instead of saving its activations (see path_tracer).
        bounce = lambda s: vpt_bounce(scene, md, use_bvh, s, fixed_rr=True)  # noqa: E731
        if differentiable == "remat":
            bounce = jax.checkpoint(bounce)
        final = jax.lax.fori_loop(0, md.max_depth, lambda i, s: bounce(s), state)
        return (final.L, None) if compact else final.L

    if not compact:
        def cond(s):
            return jnp.any(s.active) & (s.bounce < md.max_depth)

        final = jax.lax.while_loop(
            cond, lambda s: vpt_bounce(scene, md, use_bvh, s), state
        )
        return final.L

    B = o.shape[0]
    lane = jnp.arange(B, dtype=jnp.int32)

    def cond(carry):
        s, _ = carry
        return jnp.any(s.active) & (s.bounce < md.max_depth)

    def _permute(tree, perm):
        return jax.tree_util.tree_map(
            lambda x: x[perm]
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B
            else x,
            tree,
        )

    def body(carry):
        s, pix = carry
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
                sub = vpt_bounce(scene, md, use_bvh, sub)
                s2 = jax.tree_util.tree_map(
                    lambda full, part: full.at[:size].set(part)
                    if hasattr(full, "ndim") and full.ndim >= 1 and full.shape[0] == B
                    else part,
                    s, sub,
                )
                return s2, pix
            return run

        # deep power-of-two ladder with a 128-lane floor (see wavefront.py):
        # VPT bounce bodies are the most expensive per-lane, so late-bounce
        # live fractions ≤1% benefit the most from sub-B/8 buckets
        sizes = [B]
        for k in range(1, 7):
            sz = max(B >> k, min(128, B))
            if sz < sizes[-1]:
                sizes.append(sz)
        branch = jnp.int32(0)
        for sz in sizes[1:]:
            branch = branch + (n_live <= sz).astype(jnp.int32)
        return jax.lax.switch(branch, [make_branch(sz) for sz in sizes], (s, pix))

    final, pix = jax.lax.while_loop(cond, body, (state, lane))
    return final.L, pix


def count_rays(scene: T.Scene, cam: cam_mod.Camera, md: MaxDepthParams,
               spp: int, seed: int = 0, use_bvh=None):
    """Traced-ray total (segments + shadow) for the same RNG streams as
    render() — see path_tracer.count_rays."""
    if use_bvh is None:
        use_bvh = scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)

    def body(i, tot):
        rng = prng.seed(
            jnp.asarray(seed, jnp.uint32)
            + jnp.asarray(i, jnp.uint32) * jnp.uint32(9781),
            lane,
        )
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        state = init_state(scene, o, d, rng, pt.wl_stratum_u(seed, i, lane))
        final = jax.lax.while_loop(
            lambda s: jnp.any(s.active) & (s.bounce < md.max_depth),
            lambda s: vpt_bounce(scene, md, use_bvh, s),
            state,
        )
        return tot + jnp.sum(final.rays)

    return jax.lax.fori_loop(0, spp, body, jnp.zeros((), jnp.int32))


def render(scene: T.Scene, cam: cam_mod.Camera, md: MaxDepthParams, spp: int,
           seed: int = 0, use_bvh=None, differentiable: bool = False,
           compact: bool = False, sampler: str = "pcg"):
    if use_bvh is None:
        use_bvh = scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)

    def one_pass(i):
        rng = qmc.make_state(sampler, seed, lane, i)
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        wl_u = pt.wl_stratum_u(seed, i, lane)
        if compact and not differentiable:
            L, pix = trace_paths(scene, md, o, d, rng, use_bvh, compact=True,
                                 wl_u=wl_u)
            img = jnp.zeros((B, 3), jnp.float32).at[pix].add(L)
        else:
            L = trace_paths(scene, md, o, d, rng, use_bvh, differentiable,
                            wl_u=wl_u)
            img = L
        return img.reshape(cam.height, cam.width, 3)

    if differentiable == "remat":
        # per-pass checkpoint: grad memory independent of spp (see
        # path_tracer.render)
        one_pass = jax.checkpoint(one_pass)

    def body(i, acc):
        return acc + one_pass(i)

    acc = jax.lax.fori_loop(0, spp, body, jnp.zeros((cam.height, cam.width, 3), jnp.float32))
    return acc / spp
