"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops.pallas.traverse_kernel import scene_fits_vmem, traverse_pallas
from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder


@pytest.fixture(scope="module")
def scene_and_rays():
    rng = np.random.default_rng(2)
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    center = rng.uniform(-1, 1, size=(300, 1, 3))
    b.add_mesh(
        (center + rng.normal(scale=0.1, size=(300, 3, 3))).astype(np.float32), mat
    )
    for _ in range(5):
        b.add_sphere(rng.uniform(-1, 1, size=3), 0.15, mat)
    scene = b.compile()
    B = 1000  # deliberately not a multiple of the tile size (padding path)
    o = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    return scene, o, d


def test_fits_vmem(scene_and_rays):
    scene, _, _ = scene_and_rays
    assert scene_fits_vmem(scene.geom, scene.bvh)


def test_packet_closest_hit_matches_brute(scene_and_rays):
    scene, o, d = scene_and_rays
    brute = isect.closest_hit_brute(scene.geom, o, d)
    pk = traverse_pallas(scene.geom, scene.bvh, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(pk["hit"]))
    hm = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hm], np.asarray(pk["t"])[hm], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(brute["prim"])[hm], np.asarray(pk["prim"])[hm]
    )


def test_packet_occlusion_matches_brute(scene_and_rays):
    scene, o, d = scene_and_rays
    rng = np.random.default_rng(3)
    t_far = jnp.asarray(rng.uniform(0.5, 4.0, size=(o.shape[0],)), jnp.float32)
    occ_b = isect.occlusion_brute(scene.geom, o, d, t_far)
    occ_p = traverse_pallas(
        scene.geom, scene.bvh, o, d, t_far, occlusion=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_p["occluded"]))


def test_forest_multichunk_matches_brute(scene_and_rays):
    """Chunked streaming path (grid = tiles x chunks): tiny chunk size
    forces C > 1; results must match brute force exactly."""
    from cuda_pt_tpu.ops.pallas.traverse_kernel import build_forest, traverse_forest

    scene, o, d = scene_and_rays
    forest = build_forest(scene.geom, chunk_prims=64)
    assert forest.num_chunks > 3
    brute = isect.closest_hit_brute(scene.geom, o, d)
    pk = traverse_forest(forest, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(pk["hit"]))
    hm = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hm], np.asarray(pk["t"])[hm], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(brute["prim"])[hm], np.asarray(pk["prim"])[hm]
    )


def test_forest_multichunk_occlusion(scene_and_rays):
    from cuda_pt_tpu.ops.pallas.traverse_kernel import build_forest, traverse_forest

    scene, o, d = scene_and_rays
    forest = build_forest(scene.geom, chunk_prims=64)
    rng = np.random.default_rng(5)
    t_far = jnp.asarray(rng.uniform(0.5, 4.0, size=(o.shape[0],)), jnp.float32)
    occ_b = isect.occlusion_brute(scene.geom, o, d, t_far)
    occ_p = traverse_forest(forest, o, d, t_far, occlusion=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_p["occluded"]))


def test_forest_render_end_to_end():
    """Megakernel render through the streaming forest (TRAVERSAL_IMPL=pallas,
    interpret mode on CPU; real TPU compiles the same kernel) matches the
    XLA gather-loop render — exercises scene.forest through
    closest_hit/occluded inside the full bounce loop."""
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
    from cuda_pt_tpu.scene import testscenes

    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    scene_f = scene.replace(forest=tk.build_forest(scene.geom, chunk_prims=8))
    assert scene_f.forest.num_chunks > 2
    md = MaxDepthParams(max_depth=3)

    ref = np.asarray(pt.render(scene, cam, md, spp=2, seed=1, use_bvh=True))
    tk.INTERPRET = True
    pt.TRAVERSAL_IMPL = "pallas"
    try:
        img = np.asarray(pt.render(scene_f, cam, md, spp=2, seed=1, use_bvh=True))
    finally:
        pt.TRAVERSAL_IMPL = "xla"
        tk.INTERPRET = False
    np.testing.assert_allclose(img, ref, rtol=1e-4, atol=1e-5)


def test_whiskey_forest_traversal_matches_xla():
    """Real mesh scene (whiskey.xml, ~68k prims, reference assets) through
    the chunked Pallas path: forest build integrity + packet traversal vs
    the XLA gather traversal on coherent camera rays (VERDICT r2 item 3).
    Interpret mode on CPU; the same kernel compiles on TPU."""
    import os

    xml = "/root/reference/scene/xml/whiskey.xml"
    if not os.path.exists(xml):
        pytest.skip("reference scenes not mounted")
    import jax.numpy as jnp

    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import rng as prng
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas.traverse_kernel import build_forest, traverse_forest
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml(xml, override_res=(32, 16))
    scene = ps.scene
    assert scene.geom.num_prims > 60_000
    assert scene.bvh.max_leaf == 8  # whiskey.xml max_node_num=32 → clamp 8

    forest = build_forest(scene.geom, chunk_prims=32768)
    assert forest.nodes.shape[0] >= 2  # actually exercises chunk streaming
    # integrity: every global prim id appears exactly once across chunks
    gids = np.asarray(forest.prims[..., 10::16]).reshape(-1)
    gids = gids[gids >= 0].astype(np.int64)
    assert len(gids) == scene.geom.num_prims
    assert len(np.unique(gids)) == scene.geom.num_prims

    lane = jnp.arange(512, dtype=jnp.int32)
    o, d, _ = cam_mod.generate_rays(ps.camera, lane, prng.seed(1, lane))
    pk = traverse_forest(forest, o, d, interpret=True)
    ref = pt.closest_hit(scene, o, d, use_bvh=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]), np.asarray(pk["hit"]))
    hm = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(ref["t"])[hm], np.asarray(pk["t"])[hm], rtol=1e-3
    )
