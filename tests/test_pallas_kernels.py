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


def test_bf16_directed_rounding_conservative():
    """Round-down stays <= x, round-up stays >= x, over the full float range
    including negatives and values near bf16 rounding boundaries."""
    from cuda_pt_tpu.ops.pallas.traverse_kernel import _bf16_directed

    rng = np.random.default_rng(7)
    x = np.concatenate([
        rng.normal(scale=10.0 ** rng.uniform(-6, 6, 20000), size=20000),
        [0.0, -0.0, 1.0, -1.0, 1e30, -1e30, 3.14159, -2.71828],
    ]).astype(np.float32)
    dn = _bf16_directed(x, up=False)
    up = _bf16_directed(x, up=True)
    assert (dn <= x).all()
    assert (up >= x).all()
    # tight: within one bf16 ulp (relative 2^-7) for normal magnitudes
    m = np.abs(x) > 1e-30
    assert (np.abs(dn - x)[m] <= np.abs(x)[m] * 2.0 ** -6).all()
    assert (np.abs(up - x)[m] <= np.abs(x)[m] * 2.0 ** -6).all()


def test_bf16_forest_matches_brute(scene_and_rays):
    """bf16 node format: conservative boxes must yield EXACTLY the same hits
    as brute force (leaf prim tests stay f32-exact; boxes only grow)."""
    from cuda_pt_tpu.ops.pallas.traverse_kernel import build_forest, traverse_forest

    scene, o, d = scene_and_rays
    forest = build_forest(scene.geom, chunk_prims=64, node_fmt="bf16")
    assert forest.node_fmt == "bf16"
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
    # occlusion variant through the same format
    t_far = jnp.full((o.shape[0],), 2.0)
    occ_b = isect.occlusion_brute(scene.geom, o, d, t_far)
    occ_p = traverse_forest(forest, o, d, t_far, occlusion=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_p["occluded"]))


def test_streaming_forest_beyond_vmem_wall():
    """~300k-prim scene (past the 10 MB VMEM budget that capped round 1):
    bf16 chunked forest vs the XLA gather traversal on coherent rays."""
    import dataclasses

    from cuda_pt_tpu.accel import bvh_build, traverse
    from cuda_pt_tpu.ops.pallas.traverse_kernel import (
        VMEM_BUDGET_BYTES,
        build_forest,
        scene_fits_vmem,
        traverse_forest,
    )
    from cuda_pt_tpu.scene.types import BVHArrays, Geometry

    rng = np.random.default_rng(21)
    N = 300_000
    center = rng.uniform(-10, 10, size=(N, 1, 3)).astype(np.float32)
    tri = center + rng.normal(scale=0.05, size=(N, 3, 3)).astype(np.float32)
    p0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    zeros2 = np.zeros((N, 2), np.float32)
    geom = Geometry(
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=jnp.asarray(e1), n1=jnp.asarray(e1), n2=jnp.asarray(e1),
        uv0=jnp.asarray(zeros2), uv1=jnp.asarray(zeros2), uv2=jnp.asarray(zeros2),
        obj_idx=jnp.zeros(N, jnp.int32), is_sphere=jnp.zeros(N, bool),
    )
    lo, hi, cent = bvh_build.prim_bounds(p0, e1, e2, np.zeros(N, bool))
    nodes = bvh_build.build_bvh(lo, hi, cent, max_leaf=4)
    order = np.asarray(nodes["order"])
    geom_r = dataclasses.replace(
        geom, p0=geom.p0[order], e1=geom.e1[order], e2=geom.e2[order],
        is_sphere=geom.is_sphere[order],
    )
    bvh = BVHArrays(
        node_min=jnp.asarray(nodes["node_min"]),
        node_max=jnp.asarray(nodes["node_max"]),
        node_skip=jnp.asarray(nodes["node_skip"]),
        node_base=jnp.asarray(nodes["node_base"]),
        node_count=jnp.asarray(nodes["node_count"]),
    )
    assert not scene_fits_vmem(geom, bvh)  # genuinely past the wall

    forest = build_forest(geom, chunk_prims=65536, node_fmt="bf16")
    assert forest.num_chunks >= 4
    per_chunk_bytes = (forest.nodes.shape[1] + forest.prims.shape[1]) * 128 * 4
    assert per_chunk_bytes < VMEM_BUDGET_BYTES  # each streamed block fits

    B = 512
    o = np.broadcast_to(np.array([0.0, 0.0, -30.0], np.float32), (B, 3))
    tgt = rng.uniform(-10, 10, size=(B, 3)).astype(np.float32)
    d = tgt - o
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(o.copy())

    ref = traverse.closest_hit_bvh(geom_r, bvh, o, d)
    pk = traverse_forest(forest, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]), np.asarray(pk["hit"]))
    hm = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(ref["t"])[hm], np.asarray(pk["t"])[hm], rtol=1e-3
    )


def test_packet_iter_counter(scene_and_rays):
    """count_iters: per-tile node-fetch counts are positive, bounded by the
    padded node count, and coherent rays fetch no more nodes than the same
    rays shuffled (the packet-divergence metric scripts/packet_divergence.py
    sweeps; results identical interpret vs compiled — pure loop counts)."""
    from cuda_pt_tpu.ops.pallas.traverse_kernel import (
        SLOTS,
        build_forest,
        traverse_forest,
    )

    scene, o, d = scene_and_rays
    # coherent bundle: all rays aimed at one octant from one origin
    rng = np.random.default_rng(11)
    B = 1024
    oc = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -3.0]), (B, 3)).astype(jnp.float32)
    tgt = jnp.asarray(rng.uniform(0.2, 0.9, size=(B, 3)), jnp.float32)
    dc = vm.normalize(tgt - oc)

    forest = build_forest(scene.geom, chunk_prims=64)
    res = traverse_forest(forest, oc, dc, interpret=True, count_iters=True)
    iters = np.asarray(res["tile_iters"])
    assert iters.shape == (B // 512,)
    m_pad = forest.nodes.shape[0] * forest.nodes.shape[1] * SLOTS
    assert np.all(iters > 0) and np.all(iters <= m_pad)

    # same rays, shuffled across tiles: never cheaper than coherent order
    perm = jnp.asarray(rng.permutation(B))
    res_s = traverse_forest(forest, oc[perm], dc[perm], interpret=True,
                            count_iters=True)
    assert int(np.sum(np.asarray(res_s["tile_iters"]))) >= int(np.sum(iters))

    # counting must not change the traversal result
    base = traverse_forest(forest, oc, dc, interpret=True)
    np.testing.assert_array_equal(np.asarray(base["prim"]), np.asarray(res["prim"]))
