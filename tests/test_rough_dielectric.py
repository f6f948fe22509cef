"""GGX rough dielectric (Walter et al. 2007) — a beyond-reference family:
the reference has smooth dielectrics and rough conductors only.

Checks: sample/eval MIS consistency on BOTH lobes, the dual Monte-Carlo
identity (importance estimate == uniform-sphere estimate over the full
sphere, i.e. the transmission eval is right too), smooth-limit reduction to
the translucent family, furnace energy bounds, and a frosted-glass render.
"""

import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.bsdf import eval as bsdf_eval
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene import types as T


def _ctx(n, **kw):
    from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder

    b = SceneBuilder()
    b.add_bsdf(BSDFSpec(btype=T.BSDF_GGX_DIELECTRIC, **kw))
    b.add_sphere((0, 0, 0), 1.0, 0)
    scene = b.compile()
    B = n.shape[0]
    return bsdf_eval.make_ctx(
        scene, jnp.zeros(B, jnp.int32), jnp.zeros((B, 2), jnp.float32), n
    )


def test_sample_weight_matches_eval_over_pdf():
    """Per-sample: weight == f·|cos| / pdf on both lobes (catches any sign
    or Jacobian error in the transmission math)."""
    B = 1 << 14
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.35, 0.1, 0.9]], (B, 1)), jnp.float32))
    ctx = _ctx(n, k_s=(1.0, 0.8, 0.6), ior=1.5, roughness_x=0.35,
               roughness_y=0.35)
    out, _ = bsdf_eval.sample_bsdf(ctx, wo, prng.seed(2, jnp.arange(B)))
    wi = out["wi"]
    f_cos, pdf = bsdf_eval.eval_bsdf(ctx, wo, wi)
    w = np.asarray(out["weight"])
    live = (w.sum(-1) > 0) & (np.asarray(pdf) > 1e-9)
    # both lobes represented (near-normal Fresnel keeps reflection ~4%)
    trans = np.asarray(vm.dot(wi, n)) < 0
    assert (live & trans).sum() > B // 4 and (live & ~trans).sum() > B // 64
    recon = np.asarray(f_cos) / np.maximum(np.asarray(pdf)[:, None], 1e-12)
    np.testing.assert_allclose(recon[live], w[live], rtol=2e-2, atol=1e-4)


def test_importance_vs_uniform_sphere_integral():
    """∫ f·cos over the FULL sphere: BSDF-sampling estimate must match a
    uniform-sphere eval estimate — validates transmission eval end-to-end."""
    B = 1 << 16
    r = np.random.default_rng(7)
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.3, 0.0, 0.95]], (B, 1)), jnp.float32))
    ctx = _ctx(n, k_s=(1.0, 1.0, 1.0), ior=1.5, roughness_x=0.4,
               roughness_y=0.4)
    out, _ = bsdf_eval.sample_bsdf(ctx, wo, prng.seed(4, jnp.arange(B)))
    est_is = np.asarray(out["weight"]).mean(axis=0)

    u = r.uniform(size=(B, 2)).astype(np.float32)
    z = 1 - 2 * u[:, 0]
    rr = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    wi = jnp.asarray(np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1))
    f_cos, _ = bsdf_eval.eval_bsdf(ctx, wo, wi)
    est_un = np.asarray(f_cos).mean(axis=0) * 4.0 * np.pi
    np.testing.assert_allclose(est_is, est_un, rtol=0.08)


def test_smooth_limit_matches_translucent():
    """roughness → 0 must reduce to the smooth translucent family."""
    md = MaxDepthParams(max_depth=16, max_transmit=16, max_specular=16)

    def furnace_mean(btype, **kw):
        scene, cam, _ = testscenes.furnace(width=12, height=12, btype=btype,
                                           **kw)
        img = np.asarray(pt.render(scene, cam, md, spp=48, seed=3,
                                   use_bvh=False))
        assert np.isfinite(img).all()
        return img.mean()

    m_rough = furnace_mean(T.BSDF_GGX_DIELECTRIC, k_s=(1, 1, 1), ior=1.5,
                           roughness_x=0.02, roughness_y=0.02)
    m_smooth = furnace_mean(T.BSDF_TRANSLUCENT, k_s=(1, 1, 1), ior=1.5)
    assert abs(m_rough - m_smooth) < 0.08, (m_rough, m_smooth)


def test_furnace_energy_bounded():
    """Single-scattering GGX loses energy at roughness 0.4 but must never
    amplify."""
    md = MaxDepthParams(max_depth=24, max_transmit=24, max_specular=24)
    scene, cam, _ = testscenes.furnace(
        width=12, height=12, btype=T.BSDF_GGX_DIELECTRIC, k_s=(1, 1, 1),
        ior=1.5, roughness_x=0.4, roughness_y=0.4,
    )
    img = np.asarray(pt.render(scene, cam, md, spp=64, seed=5, use_bvh=False))
    m = img.mean()
    assert 0.6 < m < 1.03, m


def test_frosted_pane_transmits_light():
    """An emissive quad behind a rough-glass pane must still light the
    camera (transmission + NEE through the pane), with energy comparable
    to a smooth pane."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder

    def pane_scene(btype, **kw):
        b = SceneBuilder()
        glass = b.add_bsdf(BSDFSpec(btype=btype, k_s=(1, 1, 1), ior=1.5, **kw))
        dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
        em = b.add_emitter(EmitterSpec(emission=(1, 1, 1), scaler=8.0))
        q = testscenes.quad
        # light quad at z=2 (wound so one-sided emission faces -z toward
        # the camera), glass pane at z=1, camera at z=-2 looking +z
        b.add_mesh(q([-1, -1, 2], [-1, 1, 2], [1, 1, 2], [1, -1, 2]),
                   dark, emitter_id=em)
        b.add_mesh(q([-2, -2, 1], [2, -2, 1], [2, 2, 1], [-2, 2, 1]), glass)
        cam = cam_mod.make_camera((0, 0, -2), (0, 0, 2), fov=40,
                                  width=16, height=16)
        return b.compile(), cam

    md = MaxDepthParams(max_depth=6, max_transmit=6, max_specular=6)
    sc_r, cam = pane_scene(T.BSDF_GGX_DIELECTRIC, roughness_x=0.25,
                           roughness_y=0.25)
    sc_s, _ = pane_scene(T.BSDF_TRANSLUCENT)
    img_r = np.asarray(pt.render(sc_r, cam, md, spp=64, seed=11, use_bvh=False))
    img_s = np.asarray(pt.render(sc_s, cam, md, spp=64, seed=11, use_bvh=False))
    assert img_r.mean() > 0.2, img_r.mean()
    ratio = img_r.mean() / max(img_s.mean(), 1e-9)
    assert 0.75 < ratio < 1.25, ratio


# ---------------------------------------------------------------------------
# Oren-Nayar rough diffuse (also beyond reference; shares this test module)
# ---------------------------------------------------------------------------


def test_oren_nayar_sigma0_is_lambert():
    """σ=0 must reduce exactly to the Lambertian family (eval + sampling)."""
    B = 4096
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.3, 0.2, 0.9]], (B, 1)), jnp.float32))
    wi = vm.normalize(jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 3)).astype(np.float32)
        * np.array([1, 1, 0.0]) + np.array([0, 0, 1.0])))

    from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder

    def ctx_of(btype, sig):
        b = SceneBuilder()
        b.add_bsdf(BSDFSpec(btype=btype, k_d=(0.6, 0.5, 0.4),
                            roughness_x=sig, roughness_y=sig))
        b.add_sphere((0, 0, 0), 1.0, 0)
        s = b.compile()
        return bsdf_eval.make_ctx(s, jnp.zeros(B, jnp.int32),
                                  jnp.zeros((B, 2), jnp.float32), n)

    f_on, p_on = bsdf_eval.eval_bsdf(ctx_of(T.BSDF_OREN_NAYAR, 1e-4), wo, wi)
    f_lam, p_lam = bsdf_eval.eval_bsdf(ctx_of(T.BSDF_LAMBERTIAN, 0.1), wo, wi)
    np.testing.assert_allclose(np.asarray(f_on), np.asarray(f_lam), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_on), np.asarray(p_lam), atol=1e-6)


def test_oren_nayar_sample_weight_matches_eval():
    B = 1 << 13
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.5, 0.0, 0.7]], (B, 1)), jnp.float32))
    from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder

    b = SceneBuilder()
    b.add_bsdf(BSDFSpec(btype=T.BSDF_OREN_NAYAR, k_d=(0.8, 0.6, 0.3),
                        roughness_x=0.5, roughness_y=0.5))
    b.add_sphere((0, 0, 0), 1.0, 0)
    scene = b.compile()
    ctx = bsdf_eval.make_ctx(scene, jnp.zeros(B, jnp.int32),
                             jnp.zeros((B, 2), jnp.float32), n)
    out, _ = bsdf_eval.sample_bsdf(ctx, wo, prng.seed(9, jnp.arange(B)))
    f_cos, pdf = bsdf_eval.eval_bsdf(ctx, wo, out["wi"])
    recon = np.asarray(f_cos) / np.maximum(np.asarray(pdf)[:, None], 1e-12)
    np.testing.assert_allclose(recon, np.asarray(out["weight"]), rtol=2e-2,
                               atol=1e-4)


def test_oren_nayar_darker_at_normal_flatter_at_grazing():
    """The qualitative ON behavior: relative to Lambert, grazing-view
    retro-reflection is boosted vs normal-view."""
    B = 2
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder

    b = SceneBuilder()
    b.add_bsdf(BSDFSpec(btype=T.BSDF_OREN_NAYAR, k_d=(1.0, 1.0, 1.0),
                        roughness_x=0.6, roughness_y=0.6))
    b.add_sphere((0, 0, 0), 1.0, 0)
    scene = b.compile()
    ctx = bsdf_eval.make_ctx(scene, jnp.zeros(B, jnp.int32),
                             jnp.zeros((B, 2), jnp.float32), n)
    grazing = vm.normalize(jnp.asarray([[0.95, 0.0, 0.3]] * B, jnp.float32))
    normal = jnp.asarray([[0.0, 0.0, 1.0]] * B, jnp.float32)
    # retro-reflection (wi == wo): grazing ON factor > normal-incidence ON
    f_g, _ = bsdf_eval.eval_bsdf(ctx, grazing, grazing)
    f_n, _ = bsdf_eval.eval_bsdf(ctx, normal, normal)
    on_g = float(f_g[0, 0]) / max(float(grazing[0, 2]), 1e-6)
    on_n = float(f_n[0, 0])
    assert on_g > on_n, (on_g, on_n)
