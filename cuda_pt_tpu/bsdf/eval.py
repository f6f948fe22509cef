"""Unified BSDF evaluation / sampling over dense parameter tables.

TPU re-design of the reference's device-polymorphic BSDF hierarchy
(src/bsdf/*.cuh dispatched through c_material[] vtables): there is no device
``new`` on TPU, so every family is evaluated as branch-free vector math over
the whole ray batch and the per-ray result selected by the material's type id
(SURVEY.md §7 decision 1). The wavefront renderer later sorts rays by
material so most lanes in a block share a family and XLA's masked selects
stay cheap.

Conventions:
- wo points AWAY from the surface toward the previous vertex (= -ray dir).
- wi is the sampled continuation direction (away from surface).
- ``eval`` returns f(wo, wi) * |cos(wi, n)| — smooth lobes only (delta lobes
  contribute 0 to NEE/MIS like the reference, src/bsdf/specular.cuh).
- Sampling is "detached": wi and pdf carry no gradients; the numerator does
  (SURVEY.md §7 decision 4).

Families (type ids in scene.types): lambertian, specular mirror, translucent
(smooth dielectric), plastic, plastic-forward, GGX conductor, dispersion,
forward/null. Parity targets cited per-family below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as vm
from ..core import rng as prng
from ..core import sampling
from ..scene import textures as tex
from ..scene import types as T
from . import fresnel, ggx, spectral

LOBE_DIFFUSE = 0
LOBE_SPECULAR = 1
LOBE_TRANSMIT = 2

_INV_PI = sampling.INV_PI


def make_ctx(scene: T.Scene, bid: jnp.ndarray, uv: jnp.ndarray, n_s: jnp.ndarray):
    """Gather per-ray material parameters, apply textures + normal map.

    bid: (B,) int32 material ids (clamped by caller for invalid lanes).
    """
    b = scene.bsdfs
    tids = b.tex_ids[bid]  # (B, 5)
    kd = tex.scaled_rgb(scene.textures, tids[:, T.TEX_DIFFUSE], uv, b.k_d[bid])
    ks = tex.scaled_rgb(scene.textures, tids[:, T.TEX_SPECULAR], uv, b.k_s[bid])
    kg = tex.scaled_rgb(scene.textures, tids[:, T.TEX_GLOSSY], uv, b.k_g[bid])
    n = tex.eval_normal_map(scene.textures, tids[:, T.TEX_NORMAL], uv, n_s)
    rough_tex = tex.sample_texture(scene.textures, tids[:, T.TEX_ROUGHNESS], uv)
    p = b.params[bid]
    return {
        "present": tuple(scene.present_bsdfs),  # static dispatch mask
        "btype": b.btype[bid],
        "kd": kd,
        "ks": ks,
        "kg": kg,
        "eta": b.eta[bid],
        "k": b.k[bid],
        "ior": p[:, T.P_IOR],
        "ax": jnp.maximum(p[:, T.P_ROUGH_X] * rough_tex[:, 0], 1e-4),
        "ay": jnp.maximum(p[:, T.P_ROUGH_Y] * rough_tex[:, 1], 1e-4),
        "thickness": p[:, T.P_THICKNESS],
        "cauchy_a": p[:, T.P_CAUCHY_A],
        "cauchy_b": p[:, T.P_CAUCHY_B],
        "n": n,
    }




def _oren_nayar_factor(ctx, wo_l, wi_l):
    """Oren-Nayar multiplier on the Lambertian lobe (fast A/B form).
    σ in radians rides the roughness_x column."""
    sig = ctx["ax"]
    s2 = sig * sig
    A = 1.0 - 0.5 * s2 / (s2 + 0.33)
    Bc = 0.45 * s2 / (s2 + 0.09)
    cos_to = jnp.clip(wo_l[..., 2], 1e-6, 1.0)
    cos_ti = jnp.clip(wi_l[..., 2], 1e-6, 1.0)
    sin_to = jnp.sqrt(jnp.maximum(1.0 - cos_to * cos_to, 0.0))
    sin_ti = jnp.sqrt(jnp.maximum(1.0 - cos_ti * cos_ti, 0.0))
    denom_az = jnp.maximum(sin_to * sin_ti, 1e-6)
    cos_dphi = jnp.clip(
        (wo_l[..., 0] * wi_l[..., 0] + wo_l[..., 1] * wi_l[..., 1])
        / denom_az, -1.0, 1.0)
    sin_a = jnp.maximum(sin_to, sin_ti)
    # β is the SMALLER angle: tan(β) = min(sin)/max(cos) — pairing min(sin)
    # with min(cos) (the other direction's cosine) explodes toward grazing
    # (caught in review: ~150× over-bright at θo=45°, θi≈90°)
    tan_b = jnp.minimum(sin_to, sin_ti) / jnp.maximum(
        jnp.maximum(cos_to, cos_ti), 1e-6)
    return A + Bc * jnp.maximum(cos_dphi, 0.0) * sin_a * tan_b


def _flip_to(n, wo):
    """Normal flipped into wo's hemisphere, plus the sign."""
    s = jnp.sign(vm.dot(n, wo, keepdims=True))
    s = jnp.where(s == 0.0, 1.0, s)
    return n * s, s[..., 0]


# ---------------------------------------------------------------------------
# eval + pdf (smooth lobes only)
# ---------------------------------------------------------------------------


def eval_bsdf(ctx, wo: jnp.ndarray, wi: jnp.ndarray):
    """Returns (f_cos (B, 3), pdf (B,)) for MIS/NEE.

    Families absent from the scene's static ``present_bsdfs`` mask are
    skipped at trace time (no wasted VPU work)."""
    present = set(ctx.get("present", range(T.NUM_BSDF_TYPES)))
    n = ctx["n"]
    nl, _ = _flip_to(n, wo)
    cos_i = vm.dot(wi, nl)
    same_side = cos_i > 0.0
    cos_ic = jnp.maximum(cos_i, 0.0)
    bt = ctx["btype"]

    B = wo.shape[0]
    f = jnp.zeros((B, 3), jnp.float32)
    pdf = jnp.zeros((B,), jnp.float32)

    if T.BSDF_LAMBERTIAN in present:
        # Lambertian (src/bsdf/lambert.cuh:28-76)
        f_lam = ctx["kd"] * (_INV_PI * cos_ic)[:, None]
        pdf_lam = sampling.cosine_hemisphere_pdf(cos_i)
        f = jnp.where((bt == T.BSDF_LAMBERTIAN)[:, None], f_lam, f)
        pdf = jnp.where(bt == T.BSDF_LAMBERTIAN, pdf_lam, pdf)

    if T.BSDF_OREN_NAYAR in present:
        # Oren-Nayar rough diffuse (beyond the reference); σ=0 reduces
        # exactly to Lambertian (tested)
        on = _oren_nayar_factor(ctx, vm.to_local(wo, nl), vm.to_local(wi, nl))
        f_on = ctx["kd"] * (_INV_PI * on * cos_ic)[:, None]
        pdf_on = sampling.cosine_hemisphere_pdf(cos_i)
        f = jnp.where((bt == T.BSDF_OREN_NAYAR)[:, None], f_on, f)
        pdf = jnp.where(bt == T.BSDF_OREN_NAYAR, pdf_on, pdf)

    if T.BSDF_PLASTIC in present:
        # Plastic diffuse substrate (src/impl/bsdf_plastic.cu:25-133)
        cos_o = jnp.abs(vm.dot(wo, nl))
        ior = ctx["ior"]
        f_o = fresnel.fresnel_dielectric(cos_o, ior)
        f_i = fresnel.fresnel_dielectric(cos_ic, ior)
        fdr = fresnel.diffuse_fresnel(ior)
        kd = ctx["kd"]
        absorb = jnp.exp(
            -vm.length(ctx["k"], keepdims=True)
            * ctx["thickness"][:, None]
            * (1.0 / jnp.maximum(cos_ic, 1e-4) + 1.0 / jnp.maximum(cos_o, 1e-4))[:, None]
        )
        # 1/η² solid-angle compression keeps the coupled diffuse term energy-
        # conserving (Mitsuba-style smooth plastic normalization).
        denom = jnp.maximum(1.0 - kd * fdr[:, None], 0.05) * (ior * ior)[:, None]
        f_pla = (
            kd
            * ((1.0 - f_o) * (1.0 - f_i) * _INV_PI * cos_ic)[:, None]
            * absorb
            / denom
        )
        p_spec = jnp.clip(f_o, 0.1, 0.9)
        pdf_pla = (1.0 - p_spec) * sampling.cosine_hemisphere_pdf(cos_i)
        f = jnp.where((bt == T.BSDF_PLASTIC)[:, None], f_pla, f)
        pdf = jnp.where(bt == T.BSDF_PLASTIC, pdf_pla, pdf)

    if T.BSDF_GGX_CONDUCTOR in present:
        # GGX conductor (src/impl/bsdf_ggx.cu)
        wo_l = vm.to_local(wo, nl)
        wi_l = vm.to_local(wi, nl)
        h_l = vm.normalize(wo_l + wi_l)
        ax, ay = ctx["ax"], ctx["ay"]
        d_ndf = ggx.ndf(h_l, ax, ay)
        g2v = ggx.g2(wo_l, wi_l, ax, ay)
        f_c = fresnel.fresnel_conductor(
            jnp.abs(jnp.sum(wo_l * h_l, axis=-1)), ctx["eta"], ctx["k"]
        )
        spec = (
            f_c
            * ctx["kg"]
            * (d_ndf * g2v / jnp.maximum(4.0 * jnp.abs(wo_l[..., 2]), 1e-6))[:, None]
        )
        f_ggx = jnp.where(same_side[:, None], spec, 0.0)
        pdf_ggx = jnp.where(same_side, ggx.vndf_pdf(wo_l, h_l, ax, ay), 0.0)
        f = jnp.where((bt == T.BSDF_GGX_CONDUCTOR)[:, None], f_ggx, f)
        pdf = jnp.where(bt == T.BSDF_GGX_CONDUCTOR, pdf_ggx, pdf)

    f = jnp.where(same_side[:, None], f, 0.0)
    pdf = jnp.where(same_side, pdf, 0.0)

    if T.BSDF_GGX_DIELECTRIC in present:
        # rough dielectric (Walter et al. 2007; beyond the reference): the
        # transmission lobe is smooth, so it joins NEE/MIS on BOTH sides of
        # the surface — computed after the same-side gate the reflective
        # families share.
        f_rd, pdf_rd = _eval_rough_dielectric(ctx, wo, wi, nl)
        is_rd = bt == T.BSDF_GGX_DIELECTRIC
        f = jnp.where(is_rd[:, None], f_rd, f)
        pdf = jnp.where(is_rd, pdf_rd, pdf)
    return f, pdf


def _eval_rough_dielectric(ctx, wo, wi, nl):
    """(f·|cos|, pdf) of the GGX dielectric. Conventions: local frame with
    nl (normal flipped toward wo) as +z; relative IoR e = n_far/n_near so
    Fresnel/refraction match the smooth translucent family; the
    radiance-transport 1/e² of the transmitted lobe is folded in (it cancels
    against Walter's e² BTDF numerator, eq. 21)."""
    cos_signed = vm.dot(wo, ctx["n"])
    entering = cos_signed > 0.0
    e = jnp.where(entering, ctx["ior"], 1.0 / jnp.maximum(ctx["ior"], 1e-4))
    ax, ay = ctx["ax"], ctx["ay"]
    wo_l = vm.to_local(wo, nl)
    wo_l = wo_l.at[..., 2].set(jnp.maximum(wo_l[..., 2], 1e-5))
    wi_l = vm.to_local(wi, nl)
    coso = wo_l[..., 2]
    refl = wi_l[..., 2] > 0.0
    h_r = vm.normalize(wo_l + wi_l)
    # refraction half-vector: wo + e·wi = -C·h (Walter eq. 16), oriented +z
    h_t = vm.normalize(-(wo_l + e[:, None] * wi_l))
    h_t = h_t * jnp.where(h_t[..., 2:3] < 0.0, -1.0, 1.0)
    h = jnp.where(refl[:, None], h_r, h_t)
    coh = jnp.sum(wo_l * h, axis=-1)
    wih = jnp.sum(wi_l * h, axis=-1)
    d_ndf = ggx.ndf(h, ax, ay)
    g1v = ggx.g1(wo_l, ax, ay)
    g2v = ggx.g2(wo_l, wi_l, ax, ay)
    F = fresnel.fresnel_dielectric(jnp.maximum(coh, 0.0), e)
    dv = g1v * d_ndf * jnp.maximum(coh, 0.0) / jnp.maximum(coso, 1e-6)
    ks = ctx["ks"]
    f_r = ks * (F * d_ndf * g2v / jnp.maximum(4.0 * coso, 1e-6))[:, None]
    pdf_r = F * dv / jnp.maximum(4.0 * coh, 1e-8)
    denom2 = jnp.maximum((coh + e * wih) ** 2, 1e-8)
    f_t = ks * (
        (1.0 - F) * d_ndf * g2v * jnp.abs(coh * wih)
        / (jnp.maximum(coso, 1e-6) * denom2)
    )[:, None]
    pdf_t = (1.0 - F) * dv * (e * e) * jnp.abs(wih) / denom2
    ok_r = refl & (coh > 1e-6) & (wih > 1e-6)
    ok_t = (~refl) & (coh > 1e-6) & (wih < -1e-6)
    f_out = jnp.where(ok_r[:, None], f_r, jnp.where(ok_t[:, None], f_t, 0.0))
    pdf_out = jnp.where(ok_r, pdf_r, jnp.where(ok_t, pdf_t, 0.0))
    return f_out, pdf_out


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def sample_bsdf(ctx, wo: jnp.ndarray, rng_state: jnp.ndarray,
                wl: jnp.ndarray | None = None,
                u_wl: jnp.ndarray | None = None):
    """Sample a continuation direction for every ray.

    Returns (out dict, new rng_state) where out = {wi, weight (=f cos / pdf),
    pdf, is_delta, lobe, wl}. All discrete decisions + directions are
    detached. ``wl`` is the path's locked dispersion wavelength (0 = none):
    a path samples its wavelength at the FIRST dispersive event and reuses it
    afterwards — per-event resampling would make the η² radiance-transport
    factors of different events non-telescoping and bias the estimator hot
    (E[1/η₁²]·E[η₂²] > 1 by Jensen).

    ``u_wl`` optionally overrides the wavelength uniform with a caller-
    provided (B,) value — the renderers pass a per-sample *stratified*
    uniform (path_tracer.wl_stratum_u) so consecutive samples of a pixel
    cover the spectrum evenly instead of clumping. The internal draw still
    advances the stream so enabling stratification shifts no other draw.
    """
    u_dir, rng_state = prng.next2d(rng_state)
    u_lobe, rng_state = prng.next1d(rng_state)
    u_wl_drawn, rng_state = prng.next1d(rng_state)
    u_wl = u_wl_drawn if u_wl is None else u_wl
    if wl is None:
        wl = jnp.zeros(wo.shape[0], jnp.float32)

    present = set(ctx.get("present", range(T.NUM_BSDF_TYPES)))
    n = ctx["n"]
    nl, _ = _flip_to(n, wo)
    bt = ctx["btype"]
    B = wo.shape[0]

    wi_pairs, w_pairs, pdf_pairs, delta_pairs, lobe_pairs = [], [], [], [], []

    # ---- lambertian base: cosine hemisphere (also plastic substrate) ----
    d_loc, _pdf_c = sampling.cosine_hemisphere(u_dir)
    wi_lam = vm.to_world(d_loc, nl)
    w_lam = ctx["kd"]
    pdf_lam = sampling.cosine_hemisphere_pdf(jnp.maximum(d_loc[..., 2], 1e-6))

    # shared: mirror reflection
    wi_spec = vm.normalize(vm.reflect(-wo, nl))
    cos_signed = vm.dot(wo, n)
    entering = cos_signed > 0.0
    ior = ctx["ior"]

    if T.BSDF_OREN_NAYAR in present:
        # cosine-sampled like Lambert; the weight carries the ON factor
        on_s = _oren_nayar_factor(
            ctx, vm.to_local(wo, nl), vm.to_local(wi_lam, nl)
        )
        w_pairs.append((T.BSDF_OREN_NAYAR, ctx["kd"] * on_s[:, None]))
        # wi/pdf/lobe defaults (cosine hemisphere, diffuse) already apply

    if T.BSDF_SPECULAR in present:
        # (src/bsdf/specular.cuh)
        wi_pairs.append((T.BSDF_SPECULAR, wi_spec))
        w_pairs.append((T.BSDF_SPECULAR, ctx["kd"]))
        delta_pairs.append((T.BSDF_SPECULAR, jnp.ones(B, bool)))
        lobe_pairs.append((T.BSDF_SPECULAR, jnp.full(B, LOBE_SPECULAR)))

    if T.BSDF_TRANSLUCENT in present:
        # smooth dielectric (src/bsdf/translucent.cuh)
        eta_rel = jnp.where(entering, ior, 1.0 / jnp.maximum(ior, 1e-4))
        f_die = fresnel.fresnel_dielectric(jnp.abs(cos_signed), eta_rel)
        refl = u_lobe < f_die
        wt, _tir = vm.refract(-wo, nl, (1.0 / eta_rel)[:, None])
        rad_scale = 1.0 / jnp.maximum(eta_rel * eta_rel, 1e-6)
        tint = ctx["ks"]
        wi_pairs.append((T.BSDF_TRANSLUCENT, jnp.where(refl[:, None], wi_spec, wt)))
        w_pairs.append(
            (T.BSDF_TRANSLUCENT, jnp.where(refl[:, None], tint, tint * rad_scale[:, None]))
        )
        delta_pairs.append((T.BSDF_TRANSLUCENT, jnp.ones(B, bool)))
        lobe_pairs.append(
            (T.BSDF_TRANSLUCENT, jnp.where(refl, LOBE_SPECULAR, LOBE_TRANSMIT))
        )

    if T.BSDF_PLASTIC in present or T.BSDF_PLASTIC_FORWARD in present:
        # coated substrate (src/impl/bsdf_plastic.cu)
        cos_o = jnp.abs(cos_signed)
        f_o = fresnel.fresnel_dielectric(cos_o, ior)
        p_spec = jnp.clip(f_o, 0.1, 0.9)
        take_spec = u_lobe < p_spec
        w_pla_spec = ctx["ks"] * (f_o / p_spec)[:, None]
        if T.BSDF_PLASTIC in present:
            cos_i_d = jnp.maximum(d_loc[..., 2], 1e-6)
            f_i = fresnel.fresnel_dielectric(cos_i_d, ior)
            fdr = fresnel.diffuse_fresnel(ior)
            absorb = jnp.exp(
                -vm.length(ctx["k"], keepdims=True)
                * ctx["thickness"][:, None]
                * (1.0 / cos_i_d + 1.0 / jnp.maximum(cos_o, 1e-4))[:, None]
            )
            denom = jnp.maximum(1.0 - ctx["kd"] * fdr[:, None], 0.05) * (ior * ior)[:, None]
            w_pla_diff = (
                ctx["kd"]
                * ((1.0 - f_o) * (1.0 - f_i) / (1.0 - p_spec))[:, None]
                * absorb
                / denom
            )
            wi_pairs.append(
                (T.BSDF_PLASTIC, jnp.where(take_spec[:, None], wi_spec, wi_lam))
            )
            w_pairs.append(
                (T.BSDF_PLASTIC, jnp.where(take_spec[:, None], w_pla_spec, w_pla_diff))
            )
            pdf_pairs.append((T.BSDF_PLASTIC, (1.0 - p_spec) * pdf_lam))
            delta_pairs.append((T.BSDF_PLASTIC, take_spec))
            lobe_pairs.append(
                (T.BSDF_PLASTIC, jnp.where(take_spec, LOBE_SPECULAR, LOBE_DIFFUSE))
            )
        if T.BSDF_PLASTIC_FORWARD in present:
            w_pfw_fwd = ctx["kd"] * ((1.0 - f_o) / (1.0 - p_spec))[:, None]
            wi_pairs.append(
                (T.BSDF_PLASTIC_FORWARD, jnp.where(take_spec[:, None], wi_spec, -wo))
            )
            w_pairs.append(
                (T.BSDF_PLASTIC_FORWARD, jnp.where(take_spec[:, None], w_pla_spec, w_pfw_fwd))
            )
            delta_pairs.append((T.BSDF_PLASTIC_FORWARD, jnp.ones(B, bool)))
            lobe_pairs.append(
                (T.BSDF_PLASTIC_FORWARD, jnp.where(take_spec, LOBE_SPECULAR, LOBE_TRANSMIT))
            )

    if T.BSDF_GGX_CONDUCTOR in present:
        # VNDF sampling (src/impl/bsdf_ggx.cu)
        wo_l = vm.to_local(wo, nl)
        wo_l = wo_l.at[..., 2].set(jnp.maximum(wo_l[..., 2], 1e-5))
        ax, ay = ctx["ax"], ctx["ay"]
        h_l = ggx.sample_vndf(wo_l, ax, ay, u_dir)
        wi_l = 2.0 * jnp.sum(wo_l * h_l, axis=-1, keepdims=True) * h_l - wo_l
        ggx_ok = wi_l[..., 2] > 1e-5
        f_c = fresnel.fresnel_conductor(
            jnp.abs(jnp.sum(wo_l * h_l, axis=-1)), ctx["eta"], ctx["k"]
        )
        g2v = ggx.g2(wo_l, wi_l, ax, ay)
        g1v = ggx.g1(wo_l, ax, ay)
        wi_pairs.append((T.BSDF_GGX_CONDUCTOR, vm.to_world(vm.normalize(wi_l), nl)))
        w_pairs.append(
            (T.BSDF_GGX_CONDUCTOR,
             jnp.where(ggx_ok[:, None],
                       f_c * ctx["kg"] * (g2v / jnp.maximum(g1v, 1e-6))[:, None], 0.0))
        )
        pdf_pairs.append(
            (T.BSDF_GGX_CONDUCTOR, jnp.where(ggx_ok, ggx.vndf_pdf(wo_l, h_l, ax, ay), 1.0))
        )
        lobe_pairs.append((T.BSDF_GGX_CONDUCTOR, jnp.full(B, LOBE_SPECULAR)))

    if T.BSDF_GGX_DIELECTRIC in present:
        # rough dielectric: VNDF half-vector, Fresnel lobe choice, reflect
        # or refract through the SAME microfacet h (Walter et al. 2007)
        wo_l = vm.to_local(wo, nl)
        wo_l = wo_l.at[..., 2].set(jnp.maximum(wo_l[..., 2], 1e-5))
        ax, ay = ctx["ax"], ctx["ay"]
        h_rd = ggx.sample_vndf(wo_l, ax, ay, u_dir)
        coh_rd = jnp.sum(wo_l * h_rd, axis=-1)
        e_rd = jnp.where(entering, ior, 1.0 / jnp.maximum(ior, 1e-4))
        f_rd = fresnel.fresnel_dielectric(jnp.abs(coh_rd), e_rd)
        wt_rd, tir_rd = vm.refract(-wo_l, h_rd, (1.0 / e_rd)[:, None])
        refl_rd = (u_lobe < f_rd) | tir_rd
        wi_rd_l = jnp.where(refl_rd[:, None], vm.reflect(-wo_l, h_rd), wt_rd)
        ok_rd = jnp.where(
            refl_rd, wi_rd_l[..., 2] > 1e-5, wi_rd_l[..., 2] < -1e-5
        )
        g1_rd = ggx.g1(wo_l, ax, ay)
        g2_rd = ggx.g2(wo_l, wi_rd_l, ax, ay)
        # VNDF weight G2/G1 (Fresnel handled by the lobe choice); the
        # transmitted lobe carries the 1/e² radiance-transport factor like
        # the smooth translucent family
        rad_rd = jnp.where(refl_rd, 1.0, 1.0 / jnp.maximum(e_rd * e_rd, 1e-6))
        w_rd = jnp.where(
            ok_rd[:, None],
            ctx["ks"] * (g2_rd / jnp.maximum(g1_rd, 1e-6) * rad_rd)[:, None],
            0.0,
        )
        # pdf mirrors _eval_rough_dielectric exactly (MIS consistency)
        d_rd = ggx.ndf(h_rd, ax, ay)
        dv_rd = (
            g1_rd * d_rd * jnp.maximum(coh_rd, 0.0)
            / jnp.maximum(wo_l[..., 2], 1e-6)
        )
        wih_rd = jnp.sum(wi_rd_l * h_rd, axis=-1)
        denom2_rd = jnp.maximum((coh_rd + e_rd * wih_rd) ** 2, 1e-8)
        pdf_rd = jnp.where(
            refl_rd,
            f_rd * dv_rd / jnp.maximum(4.0 * coh_rd, 1e-8),
            (1.0 - f_rd) * dv_rd * e_rd * e_rd * jnp.abs(wih_rd) / denom2_rd,
        )
        wi_pairs.append(
            (T.BSDF_GGX_DIELECTRIC, vm.to_world(vm.normalize(wi_rd_l), nl))
        )
        w_pairs.append((T.BSDF_GGX_DIELECTRIC, w_rd))
        pdf_pairs.append((T.BSDF_GGX_DIELECTRIC, jnp.maximum(pdf_rd, 1e-12)))
        # smooth lobe: is_delta stays False so it participates in NEE/MIS
        lobe_pairs.append(
            (T.BSDF_GGX_DIELECTRIC,
             jnp.where(refl_rd, LOBE_SPECULAR, LOBE_TRANSMIT))
        )

    is_disp = bt == T.BSDF_DISPERSION
    wl_out = wl
    if T.BSDF_DISPERSION in present:
        # spectral dielectric (src/bsdf/dispersion.cuh); λ locked per path
        wl_fresh = spectral.WL_MIN + u_wl * (spectral.WL_MAX - spectral.WL_MIN)
        first_disp = wl <= 0.0
        wl_use = jnp.where(first_disp, wl_fresh, wl)
        wl_um2 = (wl_use * 1e-3) ** 2
        ior_wl = ctx["cauchy_a"] + ctx["cauchy_b"] / jnp.maximum(wl_um2, 1e-6)
        eta_wl = jnp.where(entering, ior_wl, 1.0 / jnp.maximum(ior_wl, 1e-4))
        f_wl = fresnel.fresnel_dielectric(jnp.abs(cos_signed), eta_wl)
        refl_wl = u_lobe < f_wl
        wt_wl, _ = vm.refract(-wo, nl, (1.0 / eta_wl)[:, None])
        rgb_wl = jnp.where(first_disp[:, None], spectral.wavelength_to_rgb(wl_use), 1.0)
        rad_wl = 1.0 / jnp.maximum(eta_wl * eta_wl, 1e-6)
        wi_pairs.append((T.BSDF_DISPERSION, jnp.where(refl_wl[:, None], wi_spec, wt_wl)))
        w_pairs.append(
            (T.BSDF_DISPERSION,
             jnp.where(refl_wl[:, None], rgb_wl, rgb_wl * rad_wl[:, None]) * ctx["ks"])
        )
        delta_pairs.append((T.BSDF_DISPERSION, jnp.ones(B, bool)))
        lobe_pairs.append(
            (T.BSDF_DISPERSION, jnp.where(refl_wl, LOBE_SPECULAR, LOBE_TRANSMIT))
        )
        wl_out = jnp.where(is_disp, jax.lax.stop_gradient(wl_use), wl)

    if T.BSDF_FORWARD in present:
        # null interface (src/bsdf/forward.cuh)
        wi_pairs.append((T.BSDF_FORWARD, -wo))
        w_pairs.append((T.BSDF_FORWARD, jnp.ones_like(w_lam)))
        delta_pairs.append((T.BSDF_FORWARD, jnp.ones(B, bool)))
        lobe_pairs.append((T.BSDF_FORWARD, jnp.full(B, LOBE_TRANSMIT)))

    # ---- select ---------------------------------------------------------
    def sel3(pairs, default):
        out = default
        for typ, val in pairs:
            out = jnp.where((bt == typ)[:, None], val, out)
        return out

    def sel1(pairs, default):
        out = default
        for typ, val in pairs:
            out = jnp.where(bt == typ, val, out)
        return out

    wi = sel3(wi_pairs, wi_lam)
    weight = sel3(w_pairs, w_lam)
    pdf = sel1(pdf_pairs, pdf_lam)
    is_delta = sel1(delta_pairs, jnp.zeros(B, bool))
    lobe = sel1(lobe_pairs, jnp.full(B, LOBE_DIFFUSE))

    out = {
        "wi": jax.lax.stop_gradient(wi),
        "weight": weight,
        "pdf": jax.lax.stop_gradient(pdf),
        "is_delta": is_delta,
        "lobe": lobe,
        "wl": wl_out,
    }
    return out, rng_state
