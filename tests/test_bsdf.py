"""BSDF correctness: white-furnace energy tests per family + eval/sample
consistency. The furnace is exact: any energy-preserving BSDF in a unit
furnace must converge to radiance 1 at every pixel."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pt_tpu.bsdf import eval as bsdf_eval
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene import types as T


def _furnace_mean(btype, spp=64, depth=48, **kw):
    scene, cam, _ = testscenes.furnace(width=16, height=16, btype=btype, **kw)
    md = MaxDepthParams(
        max_depth=depth, max_diffuse=depth, max_specular=depth, max_transmit=depth
    )
    img = np.asarray(pt.render(scene, cam, md, spp=spp, seed=11, use_bvh=False))
    assert np.isfinite(img).all()
    return img.mean()


def test_furnace_specular_mirror():
    m = _furnace_mean(T.BSDF_SPECULAR, k_d=(1.0, 1.0, 1.0))
    assert abs(m - 1.0) < 0.02, m


def test_furnace_translucent():
    m = _furnace_mean(T.BSDF_TRANSLUCENT, k_s=(1.0, 1.0, 1.0), ior=1.5)
    assert abs(m - 1.0) < 0.05, m


def test_furnace_forward():
    m = _furnace_mean(T.BSDF_FORWARD)
    assert abs(m - 1.0) < 0.02, m


def test_furnace_dispersion_white():
    """Also validates the spectral RGB normalization (mean-one weights)."""
    m = _furnace_mean(T.BSDF_DISPERSION, k_s=(1.0, 1.0, 1.0), spp=128)
    assert abs(m - 1.0) < 0.08, m


def test_furnace_ggx_bounded():
    m = _furnace_mean(
        T.BSDF_GGX_CONDUCTOR,
        k_g=(1.0, 1.0, 1.0),
        eta=(0.14, 0.37, 1.44),
        k=(3.98, 2.38, 1.60),
        roughness_x=0.3,
        roughness_y=0.3,
    )
    assert 0.5 < m < 1.02, m  # conductor absorbs, never amplifies


def test_furnace_plastic_bounded():
    m = _furnace_mean(
        T.BSDF_PLASTIC, k_d=(1.0, 1.0, 1.0), k_s=(1.0, 1.0, 1.0), ior=1.5
    )
    assert 0.6 < m < 1.05, m


def _ctx_single(btype, n, **kw):
    from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder

    b = SceneBuilder()
    b.add_bsdf(BSDFSpec(btype=btype, **kw))
    b.add_sphere((0, 0, 0), 1.0, 0)
    scene = b.compile()
    B = n.shape[0]
    bid = jnp.zeros(B, jnp.int32)
    uv = jnp.zeros((B, 2), jnp.float32)
    return bsdf_eval.make_ctx(scene, bid, uv, n)


def test_ggx_eval_sample_consistency():
    """∫ f·cos dω estimated by BSDF sampling == estimate by uniform sphere."""
    B = 1 << 15
    rngs = np.random.default_rng(0)
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.4, 0.2, 0.8]], (B, 1)), jnp.float32))
    kw = dict(
        k_g=(1.0, 1.0, 1.0), eta=(1.0, 1.0, 1.0), k=(2.0, 2.0, 2.0),
        roughness_x=0.4, roughness_y=0.4,
    )
    ctx = _ctx_single(T.BSDF_GGX_CONDUCTOR, n, **kw)
    state = prng.seed(5, jnp.arange(B))
    out, _ = bsdf_eval.sample_bsdf(ctx, wo, state)
    est_is = np.asarray(out["weight"]).mean(axis=0)  # E[f cos / pdf]

    # uniform-sphere estimate of the same integral via eval
    u = rngs.uniform(size=(B, 2)).astype(np.float32)
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    wi = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    f_cos, _ = bsdf_eval.eval_bsdf(ctx, wo, wi)
    est_un = np.asarray(f_cos).mean(axis=0) * 4.0 * np.pi
    np.testing.assert_allclose(est_is, est_un, rtol=0.08)


def test_lambert_sample_weight_is_albedo():
    B = 4096
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.1, 0.0, 1.0]], (B, 1)), jnp.float32))
    ctx = _ctx_single(T.BSDF_LAMBERTIAN, n, k_d=(0.25, 0.5, 0.75))
    out, _ = bsdf_eval.sample_bsdf(ctx, wo, prng.seed(1, jnp.arange(B)))
    w = np.asarray(out["weight"])
    np.testing.assert_allclose(w.mean(axis=0), [0.25, 0.5, 0.75], atol=1e-5)
    wi = np.asarray(out["wi"])
    assert (wi[:, 2] > 0).all()  # same hemisphere as the normal
    pdf = np.asarray(out["pdf"])
    np.testing.assert_allclose(pdf, wi[:, 2] / np.pi, atol=1e-5)


@pytest.mark.parametrize("ior", [1.33, 1.5, 2.4])
def test_fresnel_dielectric_limits(ior):
    from cuda_pt_tpu.bsdf.fresnel import fresnel_dielectric

    # normal incidence: ((n-1)/(n+1))^2
    f0 = float(fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([ior]))[0])
    assert abs(f0 - ((ior - 1) / (ior + 1)) ** 2) < 1e-4
    # grazing → 1
    fg = float(fresnel_dielectric(jnp.asarray([0.001]), jnp.asarray([ior]))[0])
    assert fg > 0.98


def test_dispersion_b0_reduces_to_translucent():
    """Cauchy B=0 ⇒ wavelength-independent IoR ⇒ the dispersion BSDF must
    match the plain smooth dielectric in expectation (spectral machinery
    collapses to white)."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene import testscenes as ts
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder

    def slab_scene(btype, **kw):
        b = SceneBuilder()
        dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
        mat = b.add_bsdf(BSDFSpec(btype=btype, k_s=(1, 1, 1), **kw))
        em = b.add_emitter(
            EmitterSpec(etype=T.EMITTER_AREA, emission=(1, 1, 1), scaler=2.0)
        )
        b.add_mesh(ts.quad([-3, -3, 2], [-3, 3, 2], [3, 3, 2], [3, -3, 2]),
                   dark, emitter_id=em)
        b.add_mesh(ts.quad([-3, -3, 0.5], [3, -3, 0.5], [3, 3, 0.5], [-3, 3, 0.5]), mat)
        b.add_mesh(ts.quad([-3, -3, 0.9], [-3, 3, 0.9], [3, 3, 0.9], [3, -3, 0.9]), mat)
        return b.compile()

    cam = cam_mod.make_camera((0, 0, -1), (0, 0, 2), fov=8, width=8, height=8)
    md = MaxDepthParams(max_depth=10, max_transmit=10, max_specular=10)
    s_glass = slab_scene(T.BSDF_TRANSLUCENT, ior=1.5)
    s_disp = slab_scene(T.BSDF_DISPERSION, cauchy_a=1.5, cauchy_b=0.0)
    a = np.asarray(pt.render(s_glass, cam, md, spp=192, seed=8, use_bvh=False))
    b = np.asarray(pt.render(s_disp, cam, md, spp=192, seed=9, use_bvh=False))
    # same IoR everywhere → same transmission; channels stay white
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)
    ch = b.reshape(-1, 3).mean(axis=0)
    assert ch.max() / max(ch.min(), 1e-6) < 1.1, ch  # no channel tint


def test_ggx_anisotropic_eval_sample_consistency():
    """Same integral check as the isotropic case, with ax ≠ ay."""
    B = 1 << 15
    rngs = np.random.default_rng(2)
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    wo = vm.normalize(jnp.asarray(np.tile([[0.3, -0.5, 0.9]], (B, 1)), jnp.float32))
    kw = dict(
        k_g=(1.0, 1.0, 1.0), eta=(1.5, 1.0, 0.5), k=(3.0, 2.5, 2.0),
        roughness_x=0.12, roughness_y=0.55,
    )
    ctx = _ctx_single(T.BSDF_GGX_CONDUCTOR, n, **kw)
    out, _ = bsdf_eval.sample_bsdf(ctx, wo, prng.seed(6, jnp.arange(B)))
    est_is = np.asarray(out["weight"]).mean(axis=0)
    u = rngs.uniform(size=(B, 2)).astype(np.float32)
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    wi = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    f_cos, _ = bsdf_eval.eval_bsdf(ctx, wo, wi)
    est_un = np.asarray(f_cos).mean(axis=0) * 4.0 * np.pi
    np.testing.assert_allclose(est_is, est_un, rtol=0.1)


def test_cie_xyz_fit_matches_published_tables():
    """The analytic CMF fit (bsdf/spectral.py, Wyman-Sloan-Shirley 2013)
    must track the CIE 1931 2-degree standard-observer tables the reference
    ships as data (src/impl/xyz.cu). Sampled values below are the published
    CIE table entries (public physical constants)."""
    import numpy as np

    from cuda_pt_tpu.bsdf import spectral

    # wl(nm): (xbar, ybar, zbar) — CIE 1931 2° standard observer
    table = {
        400.0: (0.01431, 0.000396, 0.06785),
        450.0: (0.33620, 0.038000, 1.77211),
        470.0: (0.19536, 0.090980, 1.28764),
        500.0: (0.00490, 0.323000, 0.27200),
        520.0: (0.06327, 0.710000, 0.07825),
        550.0: (0.43345, 0.994950, 0.00875),
        580.0: (0.91630, 0.870000, 0.00165),
        600.0: (1.06220, 0.631000, 0.00080),
        650.0: (0.28350, 0.107000, 0.00000),
        700.0: (0.01136, 0.004102, 0.00000),
    }
    wl = jnp.asarray(sorted(table), jnp.float32)
    fx, fy, fz = (np.asarray(v) for v in spectral.xyz_fit(wl))
    ref = np.array([table[float(w)] for w in sorted(table)])
    err = np.abs(np.stack([fx, fy, fz], axis=-1) - ref)
    assert err.max() < 0.035, err.max()  # multi-lobe fit abs-error bound

    # peak wavelengths of the fit agree with the observer (±5 nm)
    dense = jnp.linspace(380.0, 780.0, 2001)
    gx, gy, gz = (np.asarray(v) for v in spectral.xyz_fit(dense))
    dn = np.asarray(dense)
    assert abs(dn[gx.argmax()] - 599.0) < 6.0
    assert abs(dn[gy.argmax()] - 555.0) < 6.0
    assert abs(dn[gz.argmax()] - 446.0) < 6.0


def test_furnace_oren_nayar_bounded():
    """ON is not exactly energy conserving; bounded near 1 in a furnace."""
    m = _furnace_mean(T.BSDF_OREN_NAYAR, k_d=(1.0, 1.0, 1.0),
                      roughness_x=0.5, roughness_y=0.5, spp=48)
    assert 0.85 < m < 1.1, m


def test_furnace_rough_dielectric_smoothish():
    """Low roughness: near-unit furnace like the smooth translucent."""
    m = _furnace_mean(T.BSDF_GGX_DIELECTRIC, k_s=(1.0, 1.0, 1.0), ior=1.5,
                      roughness_x=0.05, roughness_y=0.05, spp=48)
    assert 0.85 < m < 1.06, m
