"""Regression tests for the round-4 VERDICT/ADVICE fixes.

Covers: the auto-fused gate keeping RIS (nee_candidates>1) on the fused
path, banding keyed to the TPU backend only, the distributed fused+sobol
guard, the fused-kernel throughput NaN guard, and the fused VMEM envelope
accounting that includes the attrs/emitter/bsdf tables.
"""

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
