"""8-wide ordered stack walk (node_fmt="w8") in the fused megakernel.

Parity contract: the w8 walk visits subtrees near-first instead of the
binary skip walk's fixed DFS order. Per-lane results are identical up to
the documented ULP-fragility of f32 slab culling (see
trace_megakernel_swf's docstring); on these fixed scenes/seeds the
interpret-mode images are in fact bit-identical, asserted exactly —
if a future seed trips the 1-ulp tie case, relax to the tolerant
contract with a note.

Reference analogue: per-thread ordered descent in
src/renderer/tracing_func.cuh:117-181 — the wide node + shared SMEM
stack is the vector-machine redesign (SURVEY.md §2.3).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import qmc
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.ops.pallas import megakernel as mk
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene.xml_parser import load_xml

REF = "/root/reference/scene/xml"


def _rays(cam):
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    rng = qmc.make_state("pcg", 0, lane, 0)
    o, d, rng = cam_mod.generate_rays(cam, lane, rng)
    return o, d, rng


def _pair(scene, cam, md, vpt=False):
    p0 = mk.make_pack(scene, vpt=vpt)
    p8 = mk.make_pack(scene, node_fmt="w8", vpt=vpt)
    assert p8.max_stack > 8
    o, d, rng = _rays(cam)
    ml = int(scene.bvh.max_leaf)
    L0 = np.asarray(mk.trace_megakernel(p0, md, o, d, rng, max_leaf=ml,
                                        interpret=True))
    L8 = np.asarray(mk.trace_megakernel(p8, md, o, d, rng, max_leaf=ml,
                                        interpret=True))
    return L0, L8


def test_w8_cornell_parity():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    L0, L8 = _pair(scene, cam, MaxDepthParams(max_depth=4))
    assert np.array_equal(L0, L8)
    assert L0.mean() > 0.01


def test_w8_bunny_parity():
    ps = load_xml(f"{REF}/bunny.xml", override_res=(16, 16))
    L0, L8 = _pair(ps.scene, ps.camera, MaxDepthParams(max_depth=4))
    assert np.array_equal(L0, L8)


def test_w8_whiskey_compact_prims_parity():
    # w8 nodes compose with the compact t9/bf16 prim+attr formats
    ps = load_xml(f"{REF}/whiskey.xml", override_res=(12, 12))
    p8 = mk.make_pack(ps.scene, node_fmt="w8")
    assert p8.prim_fmt in ("t9", "f32")
    L0, L8 = _pair(ps.scene, ps.camera, MaxDepthParams(max_depth=4))
    assert np.array_equal(L0, L8)


def test_w8_media_vpt_parity():
    # interface-walk shadow transmittance + free flight ride the w8 walk
    ps = load_xml(f"{REF}/medium-cbox.xml", override_res=(10, 10))
    L0, L8 = _pair(ps.scene, ps.camera, ps.config.md, vpt=True)
    assert np.array_equal(L0, L8)
    assert L0.mean() > 0.01


def test_w8_env_furnace():
    scene, cam, _ = testscenes.furnace(width=8, height=8)
    L0, L8 = _pair(scene, cam, MaxDepthParams(max_depth=3))
    assert np.array_equal(L0, L8)
    assert abs(L0.mean() - 1.0) < 0.05  # furnace closes through w8 too


def test_w8_textured_kitchen_parity():
    scene, cam, _ = testscenes.kitchen_stress(width=8, height=8, grid=2,
                                              ns=6, nt=4)
    L0, L8 = _pair(scene, cam, MaxDepthParams(max_depth=3))
    assert np.array_equal(L0, L8)


def test_w8_count_stats_pruning():
    # ordered descent must not INCREASE leaf entries; node iterations are
    # pops (1 per expanded node) and must shrink vs binary touches
    ps = load_xml(f"{REF}/bunny.xml", override_res=(16, 16))
    md = MaxDepthParams(max_depth=3)
    o, d, rng = _rays(ps.camera)
    ml = int(ps.scene.bvh.max_leaf)
    p0 = mk.make_pack(ps.scene)
    p8 = mk.make_pack(ps.scene, node_fmt="w8")
    s0 = jax.device_get(mk.trace_megakernel(
        p0, md, o, d, rng, max_leaf=ml, interpret=True,
        count_stats=True)[1])
    s8 = jax.device_get(mk.trace_megakernel(
        p8, md, o, d, rng, max_leaf=ml, interpret=True,
        count_stats=True)[1])
    assert s8["node_iters"] < s0["node_iters"]
    # leaf entries may drift a few % either way at tiny ray counts (the
    # visit ORDER changes which leaves the per-lane t-cull skips); on-chip
    # at render scale ordering CUTS them on deep trees (EXP_W8.json:
    # whiskey 90.5k -> 54k)
    assert s8["leaf_entries"] <= s0["leaf_entries"] * 1.15


def test_w8_swf_seg_mode():
    # the sorted-wavefront driver threads the w8 scratch through its
    # per-bounce pallas_call
    scene, cam, _ = testscenes.cornell_box(width=12, height=12)
    p8 = mk.make_pack(scene, node_fmt="w8")
    o, d, rng = _rays(cam)
    md = MaxDepthParams(max_depth=3)
    ml = int(scene.bvh.max_leaf)
    L0 = np.asarray(mk.trace_megakernel(p8, md, o, d, rng, max_leaf=ml,
                                        interpret=True))
    L1 = np.asarray(mk.trace_megakernel_swf(p8, md, o, d, rng,
                                            max_leaf=ml, interpret=True,
                                            key_mode="none"))
    assert np.array_equal(L0, L1)


def test_w8_lowers_for_tpu():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    p8 = mk.make_pack(scene, node_fmt="w8")
    o, d, rng = _rays(cam)
    md = MaxDepthParams(max_depth=3)
    ml = int(scene.bvh.max_leaf)
    fn = lambda p: mk.trace_megakernel(p, md, o, d, rng, max_leaf=ml,
                                       interpret=False)
    exp = jexport.export(jax.jit(fn), platforms=["tpu"])(p8)
    assert "tpu_custom_call" in exp.mlir_module()


def test_w8_pack_roundtrip_jit():
    # MKPack.max_stack rides aux_data through jit boundaries
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    p8 = mk.make_pack(scene, node_fmt="w8")

    @jax.jit
    def f(p):
        return p["nodes"].sum()

    f(p8)  # must not raise on flatten/unflatten
    leaves, treedef = jax.tree_util.tree_flatten(p8)
    p2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert p2.max_stack == p8.max_stack
    assert p2.node_fmt == "w8"
