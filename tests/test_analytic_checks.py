"""Closed-form checks: absorbing-slab transmittance, thin-lens/ortho camera."""

import numpy as np

from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.models import volume_pt
from cuda_pt_tpu.scene import testscenes, types as T
from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, MediumSpec, SceneBuilder


def test_absorbing_slab_beer_lambert():
    """Camera → 1-unit absorbing slab → emissive wall: pixel = Le·exp(-σa·L)."""
    b = SceneBuilder()
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA, emission=(1, 1, 1), scaler=2.0))
    sigma_a = np.array([0.3, 0.7, 1.2], np.float32)
    med = b.add_medium(MediumSpec(sigma_a=tuple(sigma_a), sigma_s=(0, 0, 0), scale=1.0))
    # emissive wall at z=2 facing the camera (normal -z)
    b.add_mesh(testscenes.quad([-2, -2, 2], [-2, 2, 2], [2, 2, 2], [2, -2, 2]),
               dark, emitter_id=em)
    # slab: two parallel null planes at z=0.5 and z=1.5 (1 unit thick)
    b.add_mesh(testscenes.quad([-2, -2, 0.5], [2, -2, 0.5], [2, 2, 0.5], [-2, 2, 0.5]),
               fwd, medium_in=med, cullable=True)
    b.add_mesh(testscenes.quad([-2, -2, 1.5], [2, -2, 1.5], [2, 2, 1.5], [-2, 2, 1.5]),
               fwd, medium_in=med, cullable=True)
    scene = b.compile()
    cam = cam_mod.make_camera((0, 0, -1), (0, 0, 2), fov=10, width=8, height=8)
    md = MaxDepthParams(max_depth=6, max_volume=2, max_transmit=6)
    img = np.asarray(volume_pt.render(scene, cam, md, spp=48, seed=3, use_bvh=False))
    expect = 2.0 * np.exp(-sigma_a * 1.0)
    got = img.reshape(-1, 3).mean(axis=0)
    # near-axis rays: path length ≈ slab thickness (fov 10° → cos ≥ 0.996)
    np.testing.assert_allclose(got, expect, rtol=0.06)


def test_thin_lens_zero_aperture_equals_pinhole():
    scene, _, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    pin = cam_mod.make_camera((0.5, 0.5, -1.35), (0.5, 0.5, 0.5), fov=40,
                              width=16, height=16)
    lens0 = cam_mod.make_camera((0.5, 0.5, -1.35), (0.5, 0.5, 0.5), fov=40,
                                width=16, height=16, aperture=0.0, focal_dist=1.85)
    a = np.asarray(pt.render(scene, pin, md, spp=4, seed=1, use_bvh=False))
    b = np.asarray(pt.render(scene, lens0, md, spp=4, seed=1, use_bvh=False))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_thin_lens_aperture_blurs():
    """Out-of-focus emissive quad: its silhouette spreads over more pixels
    under a wide aperture (near-zero-variance direct-emission feature)."""
    b = SceneBuilder()
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA, emission=(1, 1, 1), scaler=4.0))
    b.add_mesh(testscenes.quad([-0.3, -0.3, 2.0], [-0.3, 0.3, 2.0],
                               [0.3, 0.3, 2.0], [0.3, -0.3, 2.0]),
               dark, emitter_id=em)
    scene = b.compile()
    md = MaxDepthParams(max_depth=1)
    pin = cam_mod.make_camera((0, 0, 0), (0, 0, 2), fov=40, width=32, height=32)
    # focus far behind the quad → the quad is strongly defocused
    lens = cam_mod.make_camera((0, 0, 0), (0, 0, 2), fov=40, width=32, height=32,
                               aperture=0.25, focal_dist=8.0)
    a = np.asarray(pt.render(scene, pin, md, spp=64, seed=1, use_bvh=False)).mean(-1)
    bl = np.asarray(pt.render(scene, lens, md, spp=64, seed=1, use_bvh=False)).mean(-1)
    mx = a.max()
    partial_a = ((a > 0.05 * mx) & (a < 0.8 * mx)).sum()
    partial_b = ((bl > 0.05 * mx) & (bl < 0.8 * mx)).sum()
    assert partial_b > partial_a * 1.5, (partial_a, partial_b)
    # similar total energy (defocus redistributes, doesn't create/destroy)
    assert abs(a.sum() - bl.sum()) / a.sum() < 0.15


def test_orthographic_camera_parallel_rays():
    import jax.numpy as jnp

    from cuda_pt_tpu.core import rng as prng

    cam = cam_mod.make_camera((0, 0, -2), (0, 0, 0), fov=30, width=16, height=16,
                              focal_dist=0.0)  # 0 → orthographic
    idx = jnp.arange(16 * 16, dtype=jnp.int32)
    o, d, _ = cam_mod.generate_rays(cam, idx, prng.seed(0, idx))
    d = np.asarray(d)
    # all rays share the forward direction
    assert np.abs(d - d[0]).max() < 1e-5
    # origins spread across the film plane
    o = np.asarray(o)
    assert o[:, 0].std() > 0.01 and o[:, 1].std() > 0.01


def test_glass_slab_fresnel_transmittance():
    """Camera → glass slab → emissive wall at near-normal incidence:
    total transmission = (1-F)/(1+F) with F = ((n-1)/(n+1))² (all internal
    reflection orders). Validates dielectric Fresnel + η² transport round
    trip and TIR-free refraction."""
    ior = 1.5
    b = SceneBuilder()
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    glass = b.add_bsdf(BSDFSpec(btype=T.BSDF_TRANSLUCENT, ior=ior,
                                k_s=(1.0, 1.0, 1.0)))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA, emission=(1, 1, 1), scaler=2.0))
    b.add_mesh(testscenes.quad([-3, -3, 2], [-3, 3, 2], [3, 3, 2], [3, -3, 2]),
               dark, emitter_id=em)
    # slab faces with outward-facing authored normals (front -z, back +z)
    b.add_mesh(testscenes.quad([-3, -3, 0.5], [3, -3, 0.5], [3, 3, 0.5], [-3, 3, 0.5]),
               glass)  # normal -z (toward camera)
    b.add_mesh(testscenes.quad([-3, -3, 0.9], [-3, 3, 0.9], [3, 3, 0.9], [3, -3, 0.9]),
               glass)  # normal +z (away)
    scene = b.compile()
    cam = cam_mod.make_camera((0, 0, -1), (0, 0, 2), fov=8, width=8, height=8)
    md = MaxDepthParams(max_depth=10, max_transmit=10, max_specular=10)
    img = np.asarray(pt.render(scene, cam, md, spp=256, seed=5, use_bvh=False))
    f0 = ((ior - 1) / (ior + 1)) ** 2
    expect = 2.0 * (1 - f0) / (1 + f0)
    got = img.mean()
    np.testing.assert_allclose(got, expect, rtol=0.05)
