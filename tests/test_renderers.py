"""Renderer-family tests: wavefront == megakernel, light tracer ≈ PT,
volumetric PT sanity, depth + BVH-cost debug outputs."""

import numpy as np
import pytest

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import debug_renderers, light_tracer, path_tracer as pt
from cuda_pt_tpu.models import volume_pt, wavefront
from cuda_pt_tpu.scene import testscenes, types as T
from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, MediumSpec, SceneBuilder


@pytest.fixture(scope="module")
def cbox():
    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    return scene, cam, MaxDepthParams(max_depth=4)


def test_wavefront_matches_megakernel(cbox):
    """Sorting is a pure permutation; per-lane RNG travels with the lane, so
    the wavefront image must match the megakernel almost exactly."""
    scene, cam, md = cbox
    a = np.asarray(pt.render(scene, cam, md, spp=4, seed=3, use_bvh=False))
    b = np.asarray(wavefront.render(scene, cam, md, spp=4, seed=3, use_bvh=False))
    match = np.isclose(a, b, atol=1e-4).mean()
    assert match > 0.95, match
    assert abs(a.mean() - b.mean()) < 0.02


def test_wavefront_nosort_matches_exactly(cbox):
    scene, cam, md = cbox
    a = np.asarray(pt.render(scene, cam, md, spp=2, seed=3, use_bvh=False))
    b = np.asarray(
        wavefront.render(scene, cam, md, spp=2, seed=3, use_bvh=False, sort_rays=False)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_light_tracer_matches_pt_brightness(cbox):
    """LT and PT estimate the same measurement: means must agree."""
    scene, cam, md = cbox
    img_pt = np.asarray(pt.render(scene, cam, md, spp=96, seed=5, use_bvh=False))
    img_lt = np.asarray(
        light_tracer.render(scene, cam, md, spp=96, seed=6, use_bvh=False)
    )
    assert np.isfinite(img_lt).all()
    assert img_lt.max() > 0.0
    ratio = img_lt.mean() / img_pt.mean()
    assert 0.8 < ratio < 1.25, ratio


def test_depth_renderer(cbox):
    scene, cam, _ = cbox
    img, info = debug_renderers.render_depth(scene, cam, use_bvh=True)
    img = np.asarray(img)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert float(info["t_max"]) > float(info["t_min"]) > 0.0


def test_bvh_cost_renderer(cbox):
    scene, cam, _ = cbox
    img, info = debug_renderers.render_bvh_cost(scene, cam)
    assert np.isfinite(np.asarray(img)).all()
    assert float(info["max_cost"]) >= float(info["mean_cost"]) > 0.0


def _volume_cbox(sigma_s=1.5, sigma_a=0.02):
    """Cornell box with a homogeneous scattering slab bounded by a forward
    (null) box — the medium-cbox.xml analogue."""
    scene0, cam, b = testscenes.cornell_box(width=20, height=20)
    # rebuild with a medium box
    b2 = SceneBuilder()
    b2.bsdfs = list(b.bsdfs)
    b2.emitters = list(b.emitters)
    fwd = b2.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    med = b2.add_medium(
        MediumSpec(sigma_a=(sigma_a,) * 3, sigma_s=(sigma_s,) * 3, scale=1.0)
    )
    for ob in b.objects:
        b2.objects.append(ob)
    # medium bound: a cube in the middle of the box
    cube = testscenes.quad([0.2, 0.25, 0.2], [0.8, 0.25, 0.2], [0.8, 0.25, 0.8], [0.2, 0.25, 0.8])
    import numpy as np_

    def box_quads(lo, hi):
        lo = np_.asarray(lo, np_.float32); hi = np_.asarray(hi, np_.float32)
        c = lambda x, y, z: np_.array([
            lo[0] + x * (hi[0] - lo[0]), lo[1] + y * (hi[1] - lo[1]),
            lo[2] + z * (hi[2] - lo[2])], np_.float32)
        qs = [
            testscenes.quad(c(0,0,0), c(1,0,0), c(1,1,0), c(0,1,0)),
            testscenes.quad(c(1,0,1), c(0,0,1), c(0,1,1), c(1,1,1)),
            testscenes.quad(c(0,0,1), c(0,0,0), c(0,1,0), c(0,1,1)),
            testscenes.quad(c(1,0,0), c(1,0,1), c(1,1,1), c(1,1,0)),
            testscenes.quad(c(0,1,0), c(1,1,0), c(1,1,1), c(0,1,1)),
            testscenes.quad(c(0,0,1), c(1,0,1), c(1,0,0), c(0,0,0)),
        ]
        return np_.concatenate(qs, axis=0)

    b2.add_mesh(box_quads([0.25, 0.05, 0.25], [0.75, 0.55, 0.75]), fwd,
                medium_in=med, cullable=True)
    scene = b2.compile()
    return scene, cam


def test_volume_pt_scattering_medium():
    scene, cam = _volume_cbox()
    md = MaxDepthParams(max_depth=8, max_volume=6)
    img = np.asarray(volume_pt.render(scene, cam, md, spp=12, seed=2, use_bvh=False))
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # absorbing medium: image darker than the vacuum cornell box
    scene_v, cam_v, _ = testscenes.cornell_box(width=20, height=20)
    img_v = np.asarray(volume_pt.render(scene_v, cam_v, md, spp=12, seed=2, use_bvh=False))
    assert np.isfinite(img_v).all()


def test_volume_pt_no_media_matches_pt():
    """With no media bound, VPT must agree with plain PT."""
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=4)
    a = np.asarray(pt.render(scene, cam, md, spp=8, seed=4, use_bvh=False))
    b = np.asarray(volume_pt.render(scene, cam, md, spp=8, seed=4, use_bvh=False))
    # estimators share seeds but consume RNG differently; compare means
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.12


def test_volume_pt_grid_smoke():
    """Dense emissive smoke ball renders something volumetric."""
    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.7, 0.7, 0.7)))
    fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA, emission=(1, 1, 1), scaler=6.0))
    b.add_mesh(testscenes.quad([-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]),
               white, emitter_id=em)
    # smoke density: soft sphere
    n = 16
    g = np.linspace(-1, 1, n)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    dens = np.maximum(0.0, 1.0 - np.sqrt(xx**2 + yy**2 + zz**2)) * 4.0
    gid = b.add_grid(dens.astype(np.float32), (-1, -1, -1), (1, 1, 1))
    med = b.add_medium(MediumSpec(mtype=T.MEDIUM_GRID, grid_id=gid,
                                  sigma_s=(0.9, 0.9, 0.9), scale=1.0))
    cube = np.concatenate([
        testscenes.quad([-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]),
        testscenes.quad([1, -1, 1], [-1, -1, 1], [-1, 1, 1], [1, 1, 1]),
        testscenes.quad([-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]),
        testscenes.quad([1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]),
        testscenes.quad([-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]),
        testscenes.quad([-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]),
    ], axis=0)
    b.add_mesh(cube, fwd, medium_in=med, cullable=True)
    scene = b.compile()
    from cuda_pt_tpu.core import camera as cam_mod

    cam = cam_mod.make_camera((0, 0.2, -4), (0, 0, 0), fov=35, width=16, height=16)
    md = MaxDepthParams(max_depth=6, max_volume=5)
    img = np.asarray(volume_pt.render(scene, cam, md, spp=8, seed=1, use_bvh=False))
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_wavefront_compaction_matches(cbox):
    """Bucketed live-prefix compaction is a pure reorganization: same
    estimator as the uncompacted wavefront."""
    scene, cam, md = cbox
    md8 = MaxDepthParams(max_depth=8, max_diffuse=8)
    a = np.asarray(wavefront.render(scene, cam, md8, spp=4, seed=11, use_bvh=False))
    b = np.asarray(
        wavefront.render(scene, cam, md8, spp=4, seed=11, use_bvh=False, compact=True)
    )
    match = np.isclose(a, b, atol=1e-4).mean()
    assert match > 0.93, match
    assert abs(a.mean() - b.mean()) < 0.02


def test_vpt_compaction_matches():
    scene, cam = _volume_cbox()
    md = MaxDepthParams(max_depth=6, max_volume=5)
    a = np.asarray(volume_pt.render(scene, cam, md, spp=6, seed=9, use_bvh=False))
    b = np.asarray(
        volume_pt.render(scene, cam, md, spp=6, seed=9, use_bvh=False, compact=True)
    )
    match = np.isclose(a, b, atol=1e-4).mean()
    assert match > 0.93, match
    assert abs(a.mean() - b.mean()) < 0.02
