"""Fused Pallas megakernel vs the composed XLA path tracer.

The kernel mirrors pt_bounce's estimator and pcg draw order exactly, so on
the same seeds the images agree up to fp reassociation (which can flip a
rare borderline RR decision) — asserted as near-total per-pixel agreement
plus tight mean agreement. Runs in interpret mode on CPU; the AOT lowering
gate (test_tpu_export.py) covers the Mosaic compile path.
"""

import numpy as np

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.ops.pallas import megakernel as mk
from cuda_pt_tpu.scene import testscenes


def test_envelope_check():
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    assert mk.megakernel_ok(scene)
    fscene, _, _ = testscenes.furnace(width=8, height=8)
    assert mk.megakernel_ok(fscene)  # envmap joined the envelope (round 4)
    kscene, kcam, _ = testscenes.kitchen_stress(width=8, height=8, grid=2,
                                                ns=6, nt=4)
    # round 4: textures (diffuse) + envmap + dispersion all joined the
    # envelope — the kitchen-class config is now fused-eligible
    assert mk.megakernel_ok(kscene)


def test_megakernel_matches_composed_pt():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=3,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=3, use_bvh=True))
    assert np.isfinite(img_k).all()
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    assert abs(img_k.mean() - img_x.mean()) < 5e-3, (
        img_k.mean(), img_x.mean())


def test_megakernel_point_light():
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.core import camera as cam_mod

    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.7, 0.7, 0.7)))
    b.add_emitter(EmitterSpec(etype=T.EMITTER_POINT, emission=(1, 1, 1),
                              scaler=6.0, pos=(0.5, 0.9, 0.5)))
    b.add_mesh(testscenes.quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]),
               white)
    b.add_mesh(testscenes.quad([0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]),
               white)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0.5, 0.5, -1.2), target=(0.5, 0.2, 0.5),
                              fov=45.0, width=12, height=12)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=3)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=1,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=1, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match


def test_megakernel_nonsquare_batch_pad():
    """B not a multiple of the tile: padding lanes must not corrupt output."""
    scene, cam, _ = testscenes.cornell_box(width=10, height=7)
    md = MaxDepthParams(max_depth=2)
    img = np.asarray(mk.render_megakernel(scene, cam, md, spp=1, seed=0,
                                          interpret=True))
    assert img.shape == (7, 10, 3)
    assert np.isfinite(img).all()
    ref = np.asarray(pt.render(scene, cam, md, spp=1, seed=0, use_bvh=True))
    match = np.isclose(img, ref, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match


def test_megakernel_specular_mirror():
    """Specular mirror box inside the envelope: matches the composed PT."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    scene, cam, _ = testscenes.cornell_box(
        width=16, height=16,
        tall_box_bsdf=BSDFSpec(btype=T.BSDF_SPECULAR, k_d=(0.9, 0.9, 0.9)))
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=5,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=5, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    assert abs(img_k.mean() - img_x.mean()) < 6e-3


def test_megakernel_ggx_conductor():
    """GGX conductor box: matches the composed PT (VNDF sampling, Smith G2,
    spectral conductor Fresnel all replicated in-kernel)."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    scene, cam, _ = testscenes.cornell_box(
        width=16, height=16,
        tall_box_bsdf=BSDFSpec(btype=T.BSDF_GGX_CONDUCTOR,
                               eta=(0.143, 0.375, 1.444),
                               k=(3.983, 2.386, 1.603),
                               roughness_x=0.2, roughness_y=0.35))
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=7,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=7, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    assert abs(img_k.mean() - img_x.mean()) < 6e-3


def test_megakernel_translucent_glass():
    """Smooth dielectric box (Fresnel reflect/refract + eta^2 transport)."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    scene, cam, _ = testscenes.cornell_box(
        width=16, height=16,
        tall_box_bsdf=BSDFSpec(btype=T.BSDF_TRANSLUCENT,
                               k_s=(0.98, 0.98, 0.98), ior=1.5))
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=5)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=11,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=11, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.94, match
    assert abs(img_k.mean() - img_x.mean()) < 8e-3


def test_megakernel_plastic():
    """Coated plastic (Fresnel lobe choice + absorbing substrate)."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    scene, cam, _ = testscenes.cornell_box(
        width=16, height=16,
        tall_box_bsdf=BSDFSpec(btype=T.BSDF_PLASTIC, k_d=(0.2, 0.4, 0.7),
                               k_s=(1.0, 1.0, 1.0), ior=1.5, thickness=0.3,
                               k=(0.5, 0.3, 0.1)))
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=9,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=9, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    assert abs(img_k.mean() - img_x.mean()) < 6e-3


def test_megakernel_rough_dielectric():
    """GGX rough glass (Walter 2007): reflect/refract through the sampled
    microfacet, smooth-lobe MIS on both surface sides."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    scene, cam, _ = testscenes.cornell_box(
        width=16, height=16,
        tall_box_bsdf=BSDFSpec(btype=T.BSDF_GGX_DIELECTRIC,
                               k_s=(0.95, 0.95, 0.95), ior=1.5,
                               roughness_x=0.25, roughness_y=0.25))
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=5)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=13,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=13, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.94, match
    assert abs(img_k.mean() - img_x.mean()) < 8e-3


def test_megakernel_oren_nayar_and_forward():
    """Oren-Nayar rough diffuse + null-interface forward BSDFs."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder, EmitterSpec
    from cuda_pt_tpu.core import camera as cam_mod

    b = SceneBuilder()
    on = b.add_bsdf(BSDFSpec(btype=T.BSDF_OREN_NAYAR, k_d=(0.6, 0.5, 0.4),
                             roughness_x=0.5))
    fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    white = b.add_bsdf(BSDFSpec(k_d=(0.73, 0.73, 0.73)))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                   emission=(1, 1, 1), scaler=10.0))
    b.add_mesh(testscenes.quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]), on)
    b.add_mesh(testscenes.quad([0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]),
               white)
    # a forward "window" pane in front of the floor
    b.add_mesh(testscenes.quad([0.2, 0.3, 0.2], [0.8, 0.3, 0.2],
                               [0.8, 0.3, 0.8], [0.2, 0.3, 0.8]), fwd)
    b.add_mesh(
        testscenes.quad([0.35, 0.95, 0.35], [0.65, 0.95, 0.35],
                        [0.65, 0.95, 0.65], [0.35, 0.95, 0.65]),
        white, emitter_id=em)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0.5, 0.6, -1.2), target=(0.5, 0.2, 0.5),
                              fov=45.0, width=14, height=14)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=17,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=17, use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    assert abs(img_k.mean() - img_x.mean()) < 6e-3


def test_megakernel_ris_nee():
    """RIS NEE (M=4) in-kernel matches the composed RIS estimator."""
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    pack = mk.make_pack(scene)
    ml = int(scene.bvh.max_leaf)
    img_k = np.asarray(mk.render_pack(pack, cam, md, spp=4, seed=21,
                                      max_leaf=ml, interpret=True,
                                      nee_candidates=4))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=21,
                                 use_bvh=True, nee_candidates=4))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    assert abs(img_k.mean() - img_x.mean()) < 6e-3
