"""Geometry tests: primitive intersection, BVH build + traversal vs brute force."""

import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.accel import bvh_build, traverse
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder


def _random_tri_scene(n_tris=200, seed=0, with_spheres=True):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    center = rng.uniform(-1, 1, size=(n_tris, 1, 3))
    tris = center + rng.normal(scale=0.1, size=(n_tris, 3, 3))
    b.add_mesh(tris.astype(np.float32), mat)
    if with_spheres:
        for i in range(5):
            b.add_sphere(rng.uniform(-1, 1, size=3), 0.15, mat)
    return b.compile()


def test_triangle_intersect_basic():
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    tri = np.array([[[0, 0, 1], [1, 0, 1], [0, 1, 1]]], np.float32)
    b.add_mesh(tri, mat)
    scene = b.compile()
    o = jnp.asarray([[0.2, 0.2, 0.0], [0.9, 0.9, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2, jnp.float32)
    hit = isect.closest_hit_brute(scene.geom, o, d)
    assert bool(hit["hit"][0]) and not bool(hit["hit"][1])
    np.testing.assert_allclose(float(hit["t"][0]), 1.0, atol=1e-5)


def test_sphere_intersect():
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    b.add_sphere((0, 0, 2), 0.5, mat)
    scene = b.compile()
    o = jnp.zeros((2, 3), jnp.float32)
    d = jnp.asarray([[0, 0, 1.0], [0, 1.0, 0]], jnp.float32)
    hit = isect.closest_hit_brute(scene.geom, o, d)
    assert bool(hit["hit"][0]) and not bool(hit["hit"][1])
    np.testing.assert_allclose(float(hit["t"][0]), 1.5, atol=1e-4)
    p = o[0] + hit["t"][0] * d[0]
    inter = isect.surface_interaction(
        scene.geom, hit["prim"][:1], hit["b1"][:1], hit["b2"][:1], p[None], d[:1]
    )
    np.testing.assert_allclose(np.asarray(inter["n_s"][0]), [0, 0, -1], atol=1e-4)


def test_bvh_structure():
    rng = np.random.default_rng(1)
    n = 500
    lo = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 0.1, size=(n, 3)).astype(np.float32)
    cent = 0.5 * (lo + hi)
    nodes = bvh_build.build_bvh(lo, hi, cent, max_leaf=4)
    m = nodes["node_min"].shape[0]
    # every prim appears exactly once in the reordering
    assert sorted(nodes["order"].tolist()) == list(range(n))
    # leaves cover all prims exactly once, in order
    leaf = nodes["node_count"] > 0
    total = nodes["node_count"][leaf].sum()
    assert total == n
    bases = nodes["node_base"][leaf]
    counts = nodes["node_count"][leaf]
    seg = np.argsort(bases)
    covered = np.concatenate(
        [np.arange(b, b + c) for b, c in zip(bases[seg], counts[seg])]
    )
    assert (covered == np.arange(n)).all()
    # skip encoding: skip[i] > i, skip[root] == m
    assert (nodes["node_skip"] > np.arange(m)).all()
    assert nodes["node_skip"][0] == m
    assert bvh_build.sah_cost(nodes) > 0


def test_bvh_traversal_matches_brute_force():
    scene = _random_tri_scene(300, seed=2)
    rng = np.random.default_rng(3)
    B = 512
    o = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    d = vm.normalize(d)
    brute = isect.closest_hit_brute(scene.geom, o, d)
    bvh = traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d)
    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(bvh["hit"]))
    hitm = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hitm], np.asarray(bvh["t"])[hitm], rtol=1e-4
    )
    # prim ids may differ only for exactly-tied t; check hit points agree
    np.testing.assert_array_equal(
        np.asarray(brute["prim"])[hitm], np.asarray(bvh["prim"])[hitm]
    )


def test_occlusion_matches_brute_force():
    scene = _random_tri_scene(300, seed=4)
    rng = np.random.default_rng(5)
    B = 512
    o = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    t_far = jnp.asarray(rng.uniform(0.5, 4.0, size=(B,)), jnp.float32)
    a = isect.occlusion_brute(scene.geom, o, d, t_far)
    b = traverse.occlusion_bvh(scene.geom, scene.bvh, o, d, t_far)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bvh_cost_counters():
    scene = _random_tri_scene(300, seed=6)
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-2, 2, size=(64, 3)), jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    out = traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d, count_cost=True)
    assert int(jnp.min(out["node_cnt"])) >= 1
    assert int(jnp.max(out["node_cnt"])) < scene.bvh.num_nodes + 1


def test_native_builder_matches_numpy_semantics():
    """C++ builder output satisfies the same structural invariants and
    traversal equivalence as the NumPy builder."""
    from cuda_pt_tpu.accel import native

    if not native.available():
        import pytest

        pytest.skip("no g++ / native builder unavailable")
    rng = np.random.default_rng(8)
    n = 700
    lo = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 0.1, size=(n, 3)).astype(np.float32)
    cent = 0.5 * (lo + hi)
    nat = native.build_bvh_native(lo, hi, cent, max_leaf=4, overlap_w=0.5)
    m = nat["node_min"].shape[0]
    assert sorted(nat["order"].tolist()) == list(range(n))
    leaf = nat["node_count"] > 0
    assert nat["node_count"][leaf].sum() == n
    assert (nat["node_skip"] > np.arange(m)).all()
    assert nat["node_skip"][0] == m
    # SAH cost in the same ballpark as the NumPy builder
    ref = bvh_build.build_bvh(lo, hi, cent, max_leaf=4, overlap_w=0.5,
                              use_native=False)
    c_nat = bvh_build.sah_cost(nat)
    c_ref = bvh_build.sah_cost(ref)
    assert c_nat < c_ref * 1.3, (c_nat, c_ref)


def test_native_builder_traversal_equivalence():
    from cuda_pt_tpu.accel import native

    if not native.available():
        import pytest

        pytest.skip("native builder unavailable")
    scene = _random_tri_scene(250, seed=12)  # compiled via native by default
    rng = np.random.default_rng(13)
    B = 256
    o = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    brute = isect.closest_hit_brute(scene.geom, o, d)
    bvh = traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d)
    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(bvh["hit"]))
    hitm = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hitm], np.asarray(bvh["t"])[hitm], rtol=1e-4
    )


def test_sbvh_traversal_equivalence():
    """SBVH (duplicated refs) produces the same closest hits as brute force,
    and the renderer image matches the plain-BVH scene."""
    from cuda_pt_tpu.accel import native
    from cuda_pt_tpu.core.config import BVHConfig

    if not native.sbvh_available():
        import pytest

        pytest.skip("sbvh native builder unavailable")
    rng = np.random.default_rng(21)
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    # long thin triangles — the case SBVH is built for
    p0 = rng.uniform(-1, 1, size=(300, 3))
    d1 = rng.normal(size=(300, 3)) * np.array([2.0, 0.05, 0.05])
    d2 = rng.normal(size=(300, 3)) * 0.08
    tris = np.stack([p0, p0 + d1, p0 + d2], axis=1).astype(np.float32)
    b.add_mesh(tris, mat)
    b.add_sphere((0.0, 0.0, 0.0), 0.3, mat)
    scene = b.compile(BVHConfig(use_sbvh=True))
    n_prims = scene.geom.num_prims
    assert n_prims >= 301  # duplicates allowed

    B = 512
    o = jnp.asarray(rng.uniform(-3, 3, size=(B, 3)), jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    brute = isect.closest_hit_brute(scene.geom, o, d)
    bvh = traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d)
    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(bvh["hit"]))
    hitm = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hitm], np.asarray(bvh["t"])[hitm], rtol=1e-4
    )


def test_sbvh_scene_render_matches_bvh():
    from cuda_pt_tpu.accel import native
    from cuda_pt_tpu.core.config import BVHConfig, MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import testscenes

    if not native.sbvh_available():
        import pytest

        pytest.skip("sbvh native builder unavailable")
    md = MaxDepthParams(max_depth=3)
    scene_a, cam, bld = testscenes.cornell_box(width=16, height=16)
    scene_b = bld.compile(BVHConfig(use_sbvh=True))
    a = np.asarray(pt.render(scene_a, cam, md, spp=16, seed=3, use_bvh=True))
    bimg = np.asarray(pt.render(scene_b, cam, md, spp=16, seed=3, use_bvh=True))
    # same estimator modulo prim index order → identical when seeds align
    match = np.isclose(a, bimg, atol=1e-4).mean()
    assert match > 0.93, match
    assert abs(a.mean() - bimg.mean()) < 0.02


def test_wide_leaf_bvh_traversal_matches_brute():
    """Regression: trees built with max_node_num > 4 (whiskey.xml uses 8)
    must unroll the FULL leaf in traversal — with the old hardcoded
    max_leaf=4 default, prims 5..8 of each leaf were never intersected and
    ~15% of whiskey camera rays returned a farther hit."""
    from cuda_pt_tpu.core.config import BVHConfig
    from cuda_pt_tpu.models import path_tracer as pt

    rng = np.random.default_rng(11)
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    center = rng.uniform(-1, 1, size=(400, 1, 3))
    tris = center + rng.normal(scale=0.08, size=(400, 3, 3))
    b.add_mesh(tris.astype(np.float32), mat)
    scene = b.compile(BVHConfig(max_prims_per_leaf=8))
    assert scene.bvh.max_leaf > 4, scene.bvh.max_leaf

    B = 1024
    o = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    brute = isect.closest_hit_brute(scene.geom, o, d)
    out = pt.closest_hit(scene, o, d, use_bvh=True)  # must pick up bvh.max_leaf
    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(out["hit"]))
    hm = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hm], np.asarray(out["t"])[hm], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(brute["prim"])[hm], np.asarray(out["prim"])[hm]
    )
    # occlusion side of the same bug
    t_far = jnp.asarray(rng.uniform(0.5, 3.0, size=(B,)), jnp.float32)
    occ_b = isect.occlusion_brute(scene.geom, o, d, t_far)
    occ = pt.occluded(scene, o, d, t_far, use_bvh=True)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ))
