"""8-wide BVH: collapse invariants, traversal parity, render parity.

The wide path must agree with the brute-force oracle exactly (same
intersect_gather core, different visit order), and the ordered stack must
stay within its build-time bound. Reference behavior being matched: the
SIMT per-thread ordered descent of src/renderer/tracing_func.cuh:117-181.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuda_pt_tpu.accel import traverse, wide_build, wide_traverse
from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.scene import testscenes

REF = "/root/reference/scene/xml"


def _rand_rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh.node_min)[0]
    hi = np.asarray(scene.bvh.node_max)[0]
    o = rng.uniform(lo - 0.05 * (hi - lo), hi + 0.05 * (hi - lo), (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_collapse_invariants_cornell():
    scene, _, _ = testscenes.cornell_box(width=8, height=8)
    wb = wide_build.from_bvharrays(scene.bvh)
    cnode = np.asarray(wb.child_node)
    # every leaf referenced exactly through valid ids; prim coverage complete
    covered = set()
    lb, lc = np.asarray(wb.leaf_base), np.asarray(wb.leaf_count)
    for e in cnode.ravel():
        if e == wide_build.EMPTY or e >= 0:
            continue
        lid = -int(e) - 1
        covered.update(range(lb[lid], lb[lid] + lc[lid]))
    nb, nc = np.asarray(scene.bvh.node_base), np.asarray(scene.bvh.node_count)
    expect = set()
    for b, c in zip(nb, nc):
        expect.update(range(b, b + c))
    assert covered == expect
    # interior child ids in range and acyclic (child id > parent id, BFS)
    for w in range(wb.num_nodes):
        for e in cnode[w]:
            if e >= 0:
                assert w < e < wb.num_nodes


def test_wide_matches_brute_cornell():
    scene, _, _ = testscenes.cornell_box(width=8, height=8)
    wb = wide_build.from_bvharrays(scene.bvh)
    o, d = _rand_rays(scene, 2048)
    ref = isect.closest_hit_brute(scene.geom, o, d)
    got = wide_traverse.closest_hit_wide(scene.geom, wb, o, d, count_cost=True)
    np.testing.assert_array_equal(np.asarray(ref["hit"]), np.asarray(got["hit"]))
    np.testing.assert_allclose(
        np.asarray(ref["t"]), np.asarray(got["t"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(ref["prim"]), np.asarray(got["prim"]))
    assert int(np.asarray(got["max_sp"]).max()) <= wb.max_stack


def test_wide_occlusion_matches_brute_cornell():
    scene, _, _ = testscenes.cornell_box(width=8, height=8)
    wb = wide_build.from_bvharrays(scene.bvh)
    o, d = _rand_rays(scene, 2048, seed=3)
    t_hit = isect.closest_hit_brute(scene.geom, o, d)["t"]
    t_far = jnp.where(jnp.isfinite(t_hit), t_hit * 0.7, 5.0)
    ref = isect.occlusion_brute(scene.geom, o, d, t_far)
    got = wide_traverse.occlusion_wide(scene.geom, wb, o, d, t_far)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_wide_matches_binary_whiskey_camera():
    """Real-mesh tree (max_leaf=8, 22k nodes) with camera primaries: the
    ordered wide walk and the skip walk must find identical hits."""
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml(os.path.join(REF, "whiskey.xml"), override_res=(48, 48))
    scene, cam = ps.scene, ps.camera
    wb = wide_build.from_bvharrays(scene.bvh)
    B = 48 * 48
    st = prng.seed(jnp.uint32(7), jnp.arange(B, dtype=jnp.uint32))
    o, d, _ = cam_mod.generate_rays(cam, jnp.arange(B, dtype=jnp.int32), st)
    rb = traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d)
    rw = wide_traverse.closest_hit_wide(scene.geom, wb, o, d, count_cost=True)
    tb, tw = np.asarray(rb["t"]), np.asarray(rw["t"])
    both_miss = np.isinf(tb) & np.isinf(tw)
    assert (np.isclose(tb, tw, rtol=1e-4, atol=1e-5) | both_miss).all()
    np.testing.assert_array_equal(np.asarray(rb["prim"]), np.asarray(rw["prim"]))
    assert int(np.asarray(rw["max_sp"]).max()) <= wb.max_stack
    # the point of the wide tree: far fewer serial steps than the skip walk
    cb = traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d, count_cost=True)
    assert int(np.asarray(rw["pop_cnt"]).max()) < int(np.asarray(cb["node_cnt"]).max())


def test_render_parity_wide_vs_xla():
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=4)
    img_x = jax.jit(
        lambda s: pt.render(s, cam, md, spp=4, seed=0, use_bvh=True)
    )(scene.replace(traversal="xla"))
    img_w = jax.jit(
        lambda s: pt.render(s, cam, md, spp=4, seed=0, use_bvh=True)
    )(wide_build.with_wide(scene))
    np.testing.assert_allclose(
        np.asarray(img_x), np.asarray(img_w), rtol=2e-4, atol=2e-5
    )


def test_degenerate_single_leaf_tree():
    """A scene small enough that the root is a leaf still traverses."""
    from cuda_pt_tpu.accel import bvh_build

    rng = np.random.default_rng(5)
    p0 = rng.uniform(0, 1, (3, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (3, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (3, 3)).astype(np.float32)
    lo, hi, cent = bvh_build.prim_bounds(p0, e1, e2, np.zeros(3, bool))
    nodes = bvh_build.build_bvh(lo, hi, cent, max_leaf=4)
    wb = wide_build.collapse_wide(nodes, max_leaf=4)
    from cuda_pt_tpu.scene.types import Geometry

    z3 = jnp.zeros((3, 3), jnp.float32)
    z2 = jnp.zeros((3, 2), jnp.float32)
    geom = Geometry(
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
        obj_idx=jnp.zeros(3, jnp.int32), is_sphere=jnp.zeros(3, bool),
    )
    o = jnp.asarray(np.full((64, 3), -2.0, np.float32))
    d_np = rng.normal(size=(64, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    d = jnp.asarray(d_np)
    ref = isect.closest_hit_brute(geom, o, d)
    got = wide_traverse.closest_hit_wide(geom, wb, o, d)
    np.testing.assert_allclose(
        np.asarray(ref["t"]), np.asarray(got["t"]), rtol=1e-5, atol=1e-5
    )


def test_wide_scale_quarter_million_prims():
    """Capacity + correctness at scale (reference design point is tens of
    millions of prims, src/impl/scene.cu:28-29): native SAH build -> wide
    collapse -> traversal parity vs the binary walk on aimed rays, with the
    serial-step reduction that motivates the 8-ary layout."""
    from cuda_pt_tpu.accel import bvh_build, native
    from cuda_pt_tpu.scene.types import BVHArrays, Geometry

    if not native.available():
        pytest.skip("native builder unavailable")
    n = 250_000
    rng = np.random.default_rng(0)
    p0 = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.02, 0.02, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.02, 0.02, (n, 3)).astype(np.float32)
    lo, hi, cent = bvh_build.prim_bounds(p0, e1, e2, np.zeros(n, bool))
    nodes = native.build_bvh_native(lo, hi, cent, max_leaf=8)
    order = np.asarray(nodes["order"])  # leaves index *reordered* prims
    p0, e1, e2 = p0[order], e1[order], e2[order]
    wb = wide_build.collapse_wide(nodes, max_leaf=8)
    bvh = BVHArrays(
        node_min=jnp.asarray(nodes["node_min"]),
        node_max=jnp.asarray(nodes["node_max"]),
        node_skip=jnp.asarray(nodes["node_skip"]),
        node_base=jnp.asarray(nodes["node_base"]),
        node_count=jnp.asarray(nodes["node_count"]),
        max_leaf=8,
    )
    z3 = jnp.zeros((n, 3), jnp.float32)
    z2 = jnp.zeros((n, 2), jnp.float32)
    geom = Geometry(
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
        obj_idx=jnp.zeros(n, jnp.int32), is_sphere=jnp.zeros(n, bool),
    )
    B = 1024
    o_np = np.full((B, 3), -1.0, np.float32)
    idx = rng.integers(0, n, B)
    tgt = p0[idx] + 0.25 * e1[idx] + 0.25 * e2[idx]  # a point ON prim idx
    dn = tgt - o_np
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    o, d = jnp.asarray(o_np), jnp.asarray(dn.astype(np.float32))

    rw = wide_traverse.closest_hit_wide(geom, wb, o, d, count_cost=True)
    rb = traverse.closest_hit_bvh(geom, bvh, o, d, count_cost=True)
    tb, tw = np.asarray(rb["t"]), np.asarray(rw["t"])
    assert np.isfinite(tb).mean() > 0.95  # aimed rays really hit
    ok = np.isclose(tb, tw, rtol=1e-4, atol=1e-5) | (np.isinf(tb) & np.isinf(tw))
    assert ok.all()
    np.testing.assert_array_equal(np.asarray(rb["prim"]), np.asarray(rw["prim"]))
    assert int(np.asarray(rw["max_sp"]).max()) <= wb.max_stack
    bin_steps = int(np.asarray(rb["node_cnt"]).max())
    wide_steps = int(np.asarray(rw["pop_cnt"]).max())
    assert wide_steps * 2 < bin_steps, (wide_steps, bin_steps)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_wide_bf16_boxes_conservative_and_exact_hits():
    """bf16 child boxes are rounded outward, so they can only ADMIT extra
    node visits — closest hits must be bit-identical to the f32 wide walk
    (prim intersection math stays f32 either way)."""
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml(os.path.join(REF, "bunny.xml"), override_res=(32, 32))
    scene = ps.scene
    wf = wide_build.from_bvharrays(scene.bvh)
    wh = wide_build.from_bvharrays(scene.bvh, box_dtype="bf16")
    assert wh.child_min.dtype == jnp.bfloat16
    # containment: bf16 box ⊇ f32 box on every real slot
    fin = np.isfinite(np.asarray(wf.child_min, np.float32))
    lo16 = np.asarray(wh.child_min, np.float32)
    hi16 = np.asarray(wh.child_max, np.float32)
    lo32 = np.asarray(wf.child_min, np.float32)
    hi32 = np.asarray(wf.child_max, np.float32)
    assert (lo16[fin] <= lo32[fin]).all()
    assert (hi16[fin] >= hi32[fin]).all()

    B = 32 * 32
    st = prng.seed(jnp.uint32(11), jnp.arange(B, dtype=jnp.uint32))
    o, d, _ = cam_mod.generate_rays(ps.camera, jnp.arange(B, dtype=jnp.int32), st)
    rf = wide_traverse.closest_hit_wide(scene.geom, wf, o, d)
    rh = wide_traverse.closest_hit_wide(scene.geom, wh, o, d)
    # t is bit-identical (prim math is f32 both ways; conservative boxes can
    # only ADD candidate prims, never drop the true closest). prim may differ
    # only on exact-t ties (shared mesh edges) where visit order breaks the
    # tie — assert those lanes really are ties.
    np.testing.assert_array_equal(np.asarray(rf["t"]), np.asarray(rh["t"]))
    pf, ph = np.asarray(rf["prim"]), np.asarray(rh["prim"])
    tie = pf != ph
    assert ((np.asarray(rf["t"]) == np.asarray(rh["t"])) | ~tie).all()
    assert tie.mean() < 0.02, f"{tie.sum()} differing prims is not a tie tail"
    occf = wide_traverse.occlusion_wide(scene.geom, wf, o, d, rf["t"] * 0.9)
    occh = wide_traverse.occlusion_wide(scene.geom, wh, o, d, rf["t"] * 0.9)
    np.testing.assert_array_equal(np.asarray(occf), np.asarray(occh))


def test_autotune_includes_wide():
    from cuda_pt_tpu.accel import autotune

    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    res = autotune.autotune_traversal(scene, cam, n_rays=256, reps=1)
    assert "wide" in res["timings_ms"]
    assert np.isfinite(res["timings_ms"]["wide"])
    tuned = autotune.with_tuned_traversal(scene, cam, n_rays=256, reps=1)
    if tuned.traversal == "wide":
        assert tuned.wide is not None


def test_api_renderer_wide():
    from cuda_pt_tpu.api import Renderer
    from cuda_pt_tpu.scene.xml_parser import load_xml

    if not os.path.isdir(REF):
        pytest.skip("reference scenes not mounted")
    # bunny: 7.3k prims, well above BRUTE_FORCE_MAX_PRIMS, so the render
    # really goes through the wide traversal
    ps = load_xml(os.path.join(REF, "bunny.xml"), override_res=(16, 16))
    r = Renderer(ps, traversal="wide")
    img = np.asarray(r.render(spp=2))
    assert np.isfinite(img).all() and img.max() > 0
    assert r.scene.traversal == "wide" and r.scene.wide is not None
