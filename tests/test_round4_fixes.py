"""Regression tests for the round-4 VERDICT/ADVICE fixes.

Covers: the auto-fused gate keeping RIS (nee_candidates>1) on the fused
path, banding keyed to the TPU backend only, the distributed fused+sobol
guard, the fused-kernel throughput NaN guard, and the fused VMEM envelope
accounting that includes the attrs/emitter/bsdf tables.
"""

import jax
import numpy as np
import pytest

from cuda_pt_tpu import api
from cuda_pt_tpu.api import Renderer
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.ops.pallas import megakernel as mk
from cuda_pt_tpu.scene import testscenes


def _as_parsed(scene, cam):
    from cuda_pt_tpu.core.config import RenderingConfig
    from cuda_pt_tpu.scene.xml_parser import ParsedScene

    return ParsedScene(scene, cam,
                       RenderingConfig(width=cam.width, height=cam.height),
                       None)


def test_auto_fused_keeps_ris(monkeypatch):
    """nee_candidates=4 must stay on the fused path: RIS runs in-kernel and
    is ~free there; the old M==1 gate silently cost 400× (VERDICT r3 weak
    #3). Construction only — no device work on the faked backend."""
    monkeypatch.setattr(api.jax, "default_backend", lambda: "tpu")
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    r = Renderer(_as_parsed(scene, cam), nee_candidates=4)
    assert r.info()["traversal"] == "fused"
    assert r.info()["nee_candidates"] == 4


def test_banding_default_tpu_only(monkeypatch):
    """The per-call lane budget was measured on the TPU tunnel; non-TPU
    accelerators must not silently band (ADVICE r3)."""
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    monkeypatch.setattr(api.jax, "default_backend", lambda: "gpu")
    monkeypatch.delenv("CUDA_PT_MAX_LANES_PER_CALL", raising=False)
    assert Renderer(_as_parsed(scene, cam)).max_lanes_per_call == 0
    monkeypatch.setattr(api.jax, "default_backend", lambda: "tpu")
    assert (Renderer(_as_parsed(scene, cam)).max_lanes_per_call
            == api.DEFAULT_ACCEL_LANES_PER_CALL)


def test_distributed_fused_rejects_sobol():
    """Sobol state truncated into pcg2d lanes would correlate every lane
    image-wide (ADVICE r3, medium) — must raise, like api.Renderer does."""
    import jax

    from cuda_pt_tpu.parallel import distributed as dist

    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    mesh = dist.make_mesh(jax.devices()[:2], sp=1)
    pack = mk.make_pack(scene)
    with pytest.raises(ValueError, match="pcg"):
        dist.render_distributed(scene, cam, MaxDepthParams(max_depth=2),
                                spp=1, mesh=mesh, renderer="fused",
                                sampler="sobol", fused_pack=pack)


def test_fused_nan_guard():
    """A non-finite BSDF SAMPLE weight (NaN mirror tint) must zero the
    lane's throughput, not poison its radiance — parity with the composed
    path's isfinite blend (path_tracer.py:359), which guards exactly the
    post-sample throughput (NEE f for a delta mirror is structurally 0, so
    the weight is the only NaN route here)."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder

    b = SceneBuilder()
    bad = b.add_bsdf(BSDFSpec(btype=T.BSDF_SPECULAR,
                              k_d=(float("nan"), 0.5, 0.5)))
    lit = b.add_bsdf(BSDFSpec(k_d=(0.0, 0.0, 0.0)))
    b.add_mesh(testscenes.quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]),
               bad)
    e = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA, emission=(5, 5, 5)))
    b.add_mesh(testscenes.quad([0.3, 0.99, 0.3], [0.7, 0.99, 0.3],
                               [0.7, 0.99, 0.7], [0.3, 0.99, 0.7]),
               lit, emitter_id=e)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0.5, 0.5, -1.2),
                              target=(0.5, 0.0, 0.5),
                              fov=45.0, width=8, height=8)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img = np.asarray(mk.render_megakernel(scene, cam, md, spp=2, seed=0,
                                          interpret=True))
    assert np.isfinite(img).all()


def test_envelope_counts_full_pack(monkeypatch):
    """megakernel_ok must account for the attrs/eprims/brows tables, not
    just nodes+prims (ADVICE r3): shrink the budget below the full pack
    size (but above nodes+prims) and the envelope must reject."""
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    pack = mk.make_pack(scene)
    total = sum(int(np.prod(v.shape)) * 4 for v in pack.values())
    assert mk.fused_pack_bytes(scene) >= total * 0.9
    assert mk.megakernel_ok(scene)
    nodes_prims = (scene.bvh.num_nodes + scene.geom.num_prims) * 64
    assert mk.fused_pack_bytes(scene) > nodes_prims  # attrs etc. counted
    monkeypatch.setattr(mk, "FUSED_VMEM_BUDGET_BYTES",
                        mk.fused_pack_bytes(scene) - 1)
    assert not mk.megakernel_ok(scene)


def _torus_scene():
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.testscenes import _torus_mesh, quad

    b = SceneBuilder()
    grey = b.add_bsdf(BSDFSpec(k_d=(0.6, 0.6, 0.6)))
    gold = b.add_bsdf(BSDFSpec(btype=T.BSDF_GGX_CONDUCTOR,
                               eta=(0.143, 0.375, 1.444),
                               k=(3.983, 2.386, 1.603),
                               roughness_x=0.2, roughness_y=0.2))
    panel = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                      emission=(1, 1, 1), scaler=15.0))
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]), grey)
    b.add_mesh(quad([-0.5, 1.8, -0.5], [0.5, 1.8, -0.5],
                    [0.5, 1.8, 0.5], [-0.5, 1.8, 0.5]), grey,
               emitter_id=panel)
    p, n, uv = _torus_mesh((0, 0.5, 0), R=0.5, r=0.2, ns=16, nt=12)
    b.add_mesh(p, gold, n=n, uv=uv)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.2, -2.4), target=(0, 0.4, 0),
                              fov=45.0, width=12, height=12)
    return scene, cam


def test_pack_formats():
    """bf16 nodes are conservatively rounded -> bit-identical hits/images;
    bf16 attrs quantize shading normals only -> close images. tri_only is
    auto-detected; the auto-compaction threshold picks formats."""
    from cuda_pt_tpu.core.config import MaxDepthParams

    scene, cam = _torus_scene()
    md = MaxDepthParams(max_depth=3)

    p_f32 = mk.make_pack(scene, node_fmt="f32", attr_fmt="f32")
    assert p_f32.tri_only  # all-triangle scene
    img0 = np.asarray(mk.render_pack(p_f32, cam, md, spp=2, seed=5,
                                     interpret=True))

    p_nb = mk.make_pack(scene, node_fmt="bf16", attr_fmt="f32")
    img1 = np.asarray(mk.render_pack(p_nb, cam, md, spp=2, seed=5,
                                     interpret=True))
    np.testing.assert_array_equal(img0, img1)

    # t9 prims keep f32 positions — intersections (and images) bit-identical
    p_t9 = mk.make_pack(scene, node_fmt="f32", attr_fmt="f32",
                        prim_fmt="t9")
    img_t9 = np.asarray(mk.render_pack(p_t9, cam, md, spp=2, seed=5,
                                       interpret=True))
    np.testing.assert_array_equal(img0, img_t9)

    p_ab = mk.make_pack(scene, node_fmt="bf16", attr_fmt="bf16")
    img2 = np.asarray(mk.render_pack(p_ab, cam, md, spp=2, seed=5,
                                     interpret=True))
    assert np.isfinite(img2).all()
    match = np.isclose(img2, img0, atol=3e-2, rtol=2e-2).mean()
    assert match > 0.9, match

    # auto-compaction: tiny threshold forces bf16, resident bytes shrink
    assert mk.make_pack(scene).node_fmt == "f32"  # small scene stays exact
    import cuda_pt_tpu.ops.pallas.megakernel as mkm
    old = mkm.AUTO_COMPACT_BYTES
    try:
        mkm.AUTO_COMPACT_BYTES = 1
        assert mk.make_pack(scene).node_fmt == "bf16"
        assert (mkm.resident_pack_bytes(scene)
                < mkm.fused_pack_bytes(scene))
    finally:
        mkm.AUTO_COMPACT_BYTES = old


def test_pack_sphere_scene_not_tri_only():
    """Sphere-bearing scenes keep the sphere leaf path and stay correct."""
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt

    scene, cam, _ = testscenes.cornell_box(width=12, height=12)
    pack = mk.make_pack(scene)
    md = MaxDepthParams(max_depth=3)
    img_k = np.asarray(mk.render_pack(pack, cam, md, spp=2, seed=2,
                                      interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=2, seed=2,
                                 use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match


def test_fused_envmap_furnace():
    """White furnace through the fused path: constant unit envmap + lambert
    sphere must converge to 1.0 (energy conservation), resolved by the
    in-kernel miss record + XLA epilogue."""
    scene, cam, _ = testscenes.furnace(width=12, height=12)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=16, max_diffuse=16)
    img = np.asarray(mk.render_megakernel(scene, cam, md, spp=24, seed=1,
                                          interpret=True))
    assert np.isfinite(img).all()
    # background pixels (direct env hits) are exactly 1; sphere pixels
    # converge to 1 in the mean
    assert abs(float(img.mean()) - 1.0) < 0.05, img.mean()


def test_fused_envmap_hdr_matches_composed():
    """Textured (lat-long HDR) envmap + geometry: fused means must agree
    with the composed path (env NEE there vs BSDF-only here — same
    expectation, different variance)."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.testscenes import _sky_hdr, quad

    b = SceneBuilder()
    sky = b.add_texture(_sky_hdr(h=16, w=32, sun_lum=4.0))
    grey = b.add_bsdf(BSDFSpec(k_d=(0.5, 0.5, 0.5)))
    b.add_emitter(EmitterSpec(etype=T.EMITTER_ENVMAP, emission=(1, 1, 1),
                              scaler=1.0, tex_id=sky,
                              extra=(1.0, 0.4, 0.1, 0.0)))
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]), grey)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.0, -2.5), target=(0, 0.3, 0),
                              fov=50.0, width=10, height=10)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=64, seed=3,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=64, seed=3,
                                 use_bvh=True))
    assert np.isfinite(img_k).all()
    # MC means agree (different NEE strategies -> different variance)
    rel = abs(img_k.mean() - img_x.mean()) / img_x.mean()
    assert rel < 0.05, (img_k.mean(), img_x.mean())


def test_fused_dispersion_matches_composed():
    """Dispersion glass in-kernel: wavelength-locked Cauchy ior + CIE tint
    must match the composed estimator in the mean (the composed path uses
    a golden-ratio wl stratum; both marginals are uniform)."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.testscenes import quad

    b = SceneBuilder()
    glass = b.add_bsdf(BSDFSpec(btype=T.BSDF_DISPERSION,
                                k_s=(0.98, 0.98, 0.98),
                                cauchy_a=1.5046, cauchy_b=0.0042))
    grey = b.add_bsdf(BSDFSpec(k_d=(0.6, 0.6, 0.6)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0.0, 0.0, 0.0)))
    panel = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                      emission=(1, 1, 1), scaler=20.0))
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]), grey)
    # glass slab between camera and floor
    b.add_mesh(quad([-1, 0.6, -1], [1, 0.6, -1], [1, 0.6, 1], [-1, 0.6, 1]),
               glass)
    b.add_mesh(quad([-0.4, 1.9, -0.4], [0.4, 1.9, -0.4],
                    [0.4, 1.9, 0.4], [-0.4, 1.9, 0.4]), dark,
               emitter_id=panel)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.3, -2.2), target=(0, 0.2, 0),
                              fov=45.0, width=6, height=6)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=5)
    # glass-slab paths are heavy-tailed; compare seed-averaged means
    # (measured: fused 0.1221±0.0128 vs composed 0.1257±0.0090 over 8
    # seeds — consistent; single seeds can differ by 40%)
    mk_m, pt_m = [], []
    for seed in range(4):
        img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=32,
                                                seed=seed, interpret=True))
        assert np.isfinite(img_k).all()
        mk_m.append(img_k.mean())
        pt_m.append(np.asarray(pt.render(scene, cam, md, spp=32, seed=seed,
                                         use_bvh=True)).mean())
    rel = abs(np.mean(mk_m) - np.mean(pt_m)) / max(np.mean(pt_m), 1e-6)
    assert rel < 0.2, (np.mean(mk_m), np.mean(pt_m))


def test_fused_spot_matches_composed():
    """AREA_SPOT cone gate (NEE + hit side) must agree with the composed
    path per-pixel: the gate is deterministic, so agreement is tight."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.testscenes import quad

    b = SceneBuilder()
    grey = b.add_bsdf(BSDFSpec(k_d=(0.6, 0.6, 0.6)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0.0, 0.0, 0.0)))
    spot = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA_SPOT,
                                     emission=(1, 1, 1), scaler=30.0,
                                     extra=(0.8, 0.0, 0.0, 0.0)))
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]), grey)
    b.add_mesh(quad([-0.3, 1.6, -0.3], [0.3, 1.6, -0.3],
                    [0.3, 1.6, 0.3], [-0.3, 1.6, 0.3]), dark,
               emitter_id=spot)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.0, -2.4), target=(0, 0.2, 0),
                              fov=50.0, width=12, height=12)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=3)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=4, seed=2,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=2,
                                 use_bvh=True))
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match


def test_fused_textured_lambert_matches_composed():
    """Deferred-texture fused path: checker-textured lambert floor must
    match the composed estimator per-pixel tightly on direct lighting and
    in the mean on bounces (RR uses the untextured base throughput, so
    survival differs on deep paths — unbiased either way)."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.testscenes import _checker_texture, quad

    b = SceneBuilder()
    checker = b.add_texture(_checker_texture(n=32, tiles=4))
    floor_m = b.add_bsdf(BSDFSpec(k_d=(0.9, 0.8, 0.7),
                                  tex_ids=(checker, -1, -1, -1, -1)))
    wall_m = b.add_bsdf(BSDFSpec(k_d=(0.5, 0.5, 0.6)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0.0, 0.0, 0.0)))
    panel = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                      emission=(1, 1, 1), scaler=18.0))
    uv = np.array([[[0, 0], [2, 0], [2, 2]], [[0, 0], [2, 2], [0, 2]]],
                  np.float32)
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]),
               floor_m, uv=uv)
    b.add_mesh(quad([-2, 0, 2], [2, 0, 2], [2, 2, 2], [-2, 2, 2]), wall_m)
    b.add_mesh(quad([-0.4, 1.9, -0.4], [0.4, 1.9, -0.4],
                    [0.4, 1.9, 0.4], [-0.4, 1.9, 0.4]), dark,
               emitter_id=panel)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.4, -2.6), target=(0, 0.1, 0),
                              fov=50.0, width=12, height=12)
    assert mk.megakernel_ok(scene)
    pack = mk.make_pack(scene)
    assert pack.textured
    md = MaxDepthParams(max_depth=2)  # depth 2: no RR -> exact parity
    img_k = np.asarray(mk.render_pack(pack, cam, md, spp=4, seed=4,
                                      interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=4, seed=4,
                                 use_bvh=True))
    assert np.isfinite(img_k).all()
    match = np.isclose(img_k, img_x, atol=2e-2, rtol=1e-3).mean()
    assert match > 0.95, match
    # deeper: RR schedules differ (textured vs base throughput) -> compare
    # means
    md5 = MaxDepthParams(max_depth=5)
    img_k5 = np.asarray(mk.render_pack(pack, cam, md5, spp=16, seed=4,
                                       interpret=True))
    img_x5 = np.asarray(pt.render(scene, cam, md5, spp=16, seed=4,
                                  use_bvh=True))
    rel = abs(img_k5.mean() - img_x5.mean()) / img_x5.mean()
    assert rel < 0.05, (img_k5.mean(), img_x5.mean())


def test_fused_textured_plus_envmap():
    """Textured floor + HDR envmap together (kitchen-class envelope):
    finite and mean-consistent with composed."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.testscenes import (_checker_texture, _sky_hdr,
                                              quad)

    b = SceneBuilder()
    checker = b.add_texture(_checker_texture(n=16, tiles=4))
    sky = b.add_texture(_sky_hdr(h=16, w=32, sun_lum=3.0))
    floor_m = b.add_bsdf(BSDFSpec(k_d=(0.8, 0.8, 0.8),
                                  tex_ids=(checker, -1, -1, -1, -1)))
    b.add_emitter(EmitterSpec(etype=T.EMITTER_ENVMAP, emission=(1, 1, 1),
                              scaler=1.0, tex_id=sky,
                              extra=(1.0, 0.0, 0.0, 0.0)))
    uv = np.array([[[0, 0], [2, 0], [2, 2]], [[0, 0], [2, 2], [0, 2]]],
                  np.float32)
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]),
               floor_m, uv=uv)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.0, -2.4), target=(0, 0.2, 0),
                              fov=50.0, width=10, height=10)
    assert mk.megakernel_ok(scene)
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_megakernel(scene, cam, md, spp=48, seed=9,
                                            interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=48, seed=9,
                                 use_bvh=True))
    assert np.isfinite(img_k).all()
    rel = abs(img_k.mean() - img_x.mean()) / img_x.mean()
    assert rel < 0.06, (img_k.mean(), img_x.mean())


def test_fused_kitchen_class_smoke():
    """The full kitchen-class combination (diffuse textures + envmap +
    dispersion + GGX/plastic/translucent + area panel) runs fused and is
    mean-consistent with the composed path."""
    from cuda_pt_tpu.models import path_tracer as pt

    scene, cam, _ = testscenes.kitchen_stress(width=10, height=10, grid=2,
                                              ns=6, nt=4)
    assert mk.megakernel_ok(scene)
    pack = mk.make_pack(scene)
    assert pack.textured and pack.has_env and pack.has_disp
    md = MaxDepthParams(max_depth=4)
    img_k = np.asarray(mk.render_pack(pack, cam, md, spp=24, seed=6,
                                      interpret=True))
    img_x = np.asarray(pt.render(scene, cam, md, spp=24, seed=6,
                                 use_bvh=True))
    assert np.isfinite(img_k).all()
    rel = abs(img_k.mean() - img_x.mean()) / img_x.mean()
    assert rel < 0.12, (img_k.mean(), img_x.mean())


def _medium_box_scene(w=10):
    """Cornell-style box with a homogeneous scattering slab behind a
    forward (null) interface — the fused-VPT envelope."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import (BSDFSpec, EmitterSpec,
                                           MediumSpec, SceneBuilder)
    from cuda_pt_tpu.scene.testscenes import quad

    b = SceneBuilder()
    med = b.add_medium(MediumSpec(sigma_a=(0.05, 0.08, 0.05),
                                  sigma_s=(0.6, 0.5, 0.4), scale=1.5,
                                  phase_type=T.PHASE_HG,
                                  phase_g=(0.3, 0.0)))
    fog = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    grey = b.add_bsdf(BSDFSpec(k_d=(0.6, 0.55, 0.5)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0.0, 0.0, 0.0)))
    panel = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                      emission=(1, 1, 1), scaler=25.0))
    b.add_mesh(quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]), grey)
    b.add_mesh(quad([-2, 0, 2], [2, 0, 2], [2, 2, 2], [-2, 2, 2]), grey)
    # medium box: all six faces, forward interface, medium inside
    lo, hi = (-0.8, 0.15, -0.8), (0.8, 1.1, 0.8)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    faces = [
        ([x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0]),
        ([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]),
        ([x0, y0, z0], [x0, y1, z0], [x0, y1, z1], [x0, y0, z1]),
        ([x1, y0, z0], [x1, y1, z0], [x1, y1, z1], [x1, y0, z1]),
        ([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1]),
        ([x0, y1, z0], [x1, y1, z0], [x1, y1, z1], [x0, y1, z1]),
    ]
    for f4 in faces:
        b.add_mesh(quad(*f4), fog, medium_in=med)
    b.add_mesh(quad([-0.4, 1.9, -0.4], [0.4, 1.9, -0.4],
                    [0.4, 1.9, 0.4], [-0.4, 1.9, 0.4]), dark,
               emitter_id=panel)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0, 1.1, -2.8), target=(0, 0.5, 0),
                              fov=50.0, width=w, height=w)
    return scene, cam


def test_fused_vpt_matches_composed():
    """Fused homogeneous-media VPT (free-flight channel MIS + HG phase +
    interface-walked shadow transmittance in-kernel) must agree with the
    composed volumetric path tracer in the mean."""
    from cuda_pt_tpu.models import volume_pt

    scene, cam = _medium_box_scene(8)
    md = MaxDepthParams(max_depth=6, max_volume=8)
    assert not mk.megakernel_ok(scene, md)  # media: pt-renderer excluded
    assert mk.megakernel_ok(scene, md, renderer="vpt")
    pack = mk.make_pack(scene, vpt=True)
    assert pack.has_media
    mk_m, pt_m = [], []
    for seed in range(3):
        img_k = np.asarray(mk.render_pack(pack, cam, md, spp=24, seed=seed,
                                          interpret=True))
        assert np.isfinite(img_k).all()
        mk_m.append(img_k.mean())
        pt_m.append(np.asarray(volume_pt.render(
            scene, cam, md, spp=24, seed=seed, use_bvh=True)).mean())
    rel = abs(np.mean(mk_m) - np.mean(pt_m)) / max(np.mean(pt_m), 1e-6)
    assert rel < 0.08, (np.mean(mk_m), np.mean(pt_m))


def test_fused_vpt_medium_cbox_smoke():
    """The reference's medium-cbox (nested media: HG box + iso glass bunny)
    enters the fused-VPT envelope and renders finite, mean-consistent with
    the composed VPT."""
    from cuda_pt_tpu.models import volume_pt
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml("/root/reference/scene/xml/medium-cbox.xml",
                  override_res=(8, 8))
    scene = ps.scene
    md = MaxDepthParams(max_depth=5, max_volume=6)
    assert mk.megakernel_ok(scene, md, renderer="vpt")
    pack = mk.make_pack(scene, vpt=True)
    img_k = np.asarray(mk.render_pack(pack, ps.camera, md, spp=12, seed=2,
                                      interpret=True))
    assert np.isfinite(img_k).all()
    img_x = np.asarray(volume_pt.render(scene, ps.camera, md, spp=12,
                                        seed=2, use_bvh=True))
    rel = abs(img_k.mean() - img_x.mean()) / img_x.mean()
    assert rel < 0.15, (img_k.mean(), img_x.mean())


def test_fused_vpt_camera_in_medium():
    """cornell_vpt config: the CAMERA sits in the scattering medium
    (scene.cam_medium ambient). The fused VPT resolves the empty stack to
    the ambient medium; means must match the composed VPT."""
    import jax.numpy as jnp

    from cuda_pt_tpu.models import volume_pt
    from cuda_pt_tpu.scene.builder import MediumSpec

    scene, cam, b = testscenes.cornell_box(width=8, height=8)
    b.add_medium(MediumSpec(sigma_a=(0.05, 0.05, 0.05),
                            sigma_s=(0.25, 0.25, 0.25)))
    scene = b.compile()
    scene = scene.replace(cam_medium=jnp.int32(0))
    md = MaxDepthParams(max_depth=5, max_volume=8)
    assert mk.megakernel_ok(scene, md, renderer="vpt")
    pack = mk.make_pack(scene, vpt=True)
    assert pack.has_media and pack.ambient_med == 0.0
    mk_m, pt_m = [], []
    for seed in range(3):
        img_k = np.asarray(mk.render_pack(pack, cam, md, spp=16, seed=seed,
                                          interpret=True))
        assert np.isfinite(img_k).all()
        mk_m.append(img_k.mean())
        pt_m.append(np.asarray(volume_pt.render(
            scene, cam, md, spp=16, seed=seed, use_bvh=True)).mean())
    rel = abs(np.mean(mk_m) - np.mean(pt_m)) / max(np.mean(pt_m), 1e-6)
    assert rel < 0.08, (np.mean(mk_m), np.mean(pt_m))


def test_fused_hybrid_sobol_sampler():
    """sampler='sobol' on the fused path runs hybrid QMC (Owen-Sobol pixel
    jitter + pcg paths): mean-consistent with pcg and lower MSE at low
    spp (the stratification where QMC pays most)."""
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    parsed = _as_parsed(scene, cam)
    import cuda_pt_tpu.ops.pallas.megakernel as mkm

    old = mkm.INTERPRET
    mkm.INTERPRET = True
    try:
        ref = Renderer(parsed, max_lanes_per_call=0, traversal="fused")
        ref_img = ref.render(48)
        errs = {}
        for smp in ("pcg", "sobol"):
            accs = []
            for so in range(3):
                r = Renderer(parsed, sampler=smp, traversal="fused",
                             seed_offset=100 + so, max_lanes_per_call=0)
                accs.append(((r.render(4) - ref_img) ** 2).mean())
            errs[smp] = np.mean(accs)
        assert np.isfinite(errs["sobol"])
        # hybrid must not be worse; typically clearly better
        assert errs["sobol"] < errs["pcg"] * 1.05, errs
    finally:
        mkm.INTERPRET = old


def test_host_count_matches_direct():
    """timing.host_count pins counts to the CPU backend (TUNNEL.md §5: the
    composed counting kernel on big meshes ran past the tunnel's ~60 s
    per-call budget and killed the TPU worker — misattributed for two
    rounds as fused-kernel instability). Counts must match the direct
    jitted count bit-exactly on the same backend."""
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.utils import timing

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=4)

    def counter(s):
        return pt.count_rays(s, cam, md, spp=2, seed=1, use_bvh=True)

    direct = int(jax.jit(counter)(scene))
    hosted = timing.host_count(counter, scene)
    assert hosted == direct, (hosted, direct)
