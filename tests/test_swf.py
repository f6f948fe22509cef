"""Sorted-wavefront fused path (trace_megakernel_swf) parity + keys.

The swf driver re-sorts the ray population between bounces and runs the
megakernel's bounce_body one bounce per pallas_call. Per-lane walk
results are independent of tile grouping (the shared-walk box culling is
conservative per lane: a subtree is skipped only when NO lane hits its
box), and all shading/RNG state is per-lane, so swf radiance must be
BIT-IDENTICAL to trace_megakernel — asserted exactly below. Analogue of
the reference's per-bounce wavefront ray sorting
(src/pt_impl/wf_path_tracer.cu:133-139), keyed on traversal locality.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import qmc
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.ops.pallas import megakernel as mk
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene.xml_parser import load_xml

REF = "/root/reference/scene/xml"


def _trace_pair(scene, cam, md, key_mode="dir_pos", vpt=False):
    pack = mk.make_pack(scene, vpt=vpt)
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    rng = qmc.make_state("pcg", 0, lane, 0)
    o, d, rng = cam_mod.generate_rays(cam, lane, rng)
    L0 = np.asarray(mk.trace_megakernel(pack, md, o, d, rng,
                                        interpret=True))
    L1 = np.asarray(mk.trace_megakernel_swf(pack, md, o, d, rng,
                                            interpret=True,
                                            key_mode=key_mode))
    return L0, L1


def test_swf_bit_identical_cornell():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    L0, L1 = _trace_pair(scene, cam, MaxDepthParams(max_depth=4))
    assert np.array_equal(L0, L1)


def test_swf_bit_identical_env_scene():
    # furnace: envmap records ride the seg state (mdx..mtb)
    scene, cam, _ = testscenes.furnace(width=8, height=8)
    L0, L1 = _trace_pair(scene, cam, MaxDepthParams(max_depth=3))
    assert np.array_equal(L0, L1)
    assert L0.mean() > 0.01  # env actually contributes


def test_swf_bit_identical_bunny_posdir_key():
    ps = load_xml(f"{REF}/bunny.xml", override_res=(16, 16))
    L0, L1 = _trace_pair(ps.scene, ps.camera, MaxDepthParams(max_depth=4),
                         key_mode="pos_dir")
    assert np.array_equal(L0, L1)


def test_swf_media_scene_exact_unsorted():
    # renderer="vpt" + vpt pack: media scenes are ALWAYS outside the "pt"
    # envelope, so the old megakernel_ok(scene) gate made this test a
    # permanent skip and the has_media seg-state packing (media rows
    # appended after env in the sorted-state layout) had zero coverage
    # (ADVICE r4). key_mode="none" keeps the megakernel's tile grouping,
    # so the seg-state round-trip must be BIT-identical.
    ps = load_xml(f"{REF}/medium-cbox.xml", override_res=(12, 12))
    assert mk.megakernel_ok(ps.scene, renderer="vpt"), \
        "medium-cbox must be inside the fused VPT envelope"
    L0, L1 = _trace_pair(ps.scene, ps.camera, ps.config.md, vpt=True,
                         key_mode="none")
    assert np.array_equal(L0, L1)
    assert L0.mean() > 0.01  # media path actually contributes


def test_swf_media_scene_sorted_near_exact():
    # Under SORTED tile regrouping, per-lane bit-identity is ULP-fragile:
    # the walk's per-lane (tn < t_best) box culling uses rounded f32 slab
    # arithmetic, so a lane dragged into a leaf by its tilemates can find
    # a hit whose box its solo walk rounds away (measured: 1 lane in 144
    # differs by 1 ulp at depth 10 on medium-cbox). The estimator is
    # unbiased either way; the contract here is near-exactness.
    ps = load_xml(f"{REF}/medium-cbox.xml", override_res=(12, 12))
    L0, L1 = _trace_pair(ps.scene, ps.camera, ps.config.md, vpt=True)
    assert np.allclose(L0, L1, rtol=1e-4, atol=1e-5)
    ndiff = int((L0 != L1).any(axis=-1).sum())
    assert ndiff <= max(2, L0.shape[0] // 50), ndiff  # <=2% of lanes


def test_swf_textured_inline_matches_deferred_mean():
    # Inline texturing (round 5): the kernel records per-bounce NEE
    # contribution pre-texel + (bid, uv); the driver resolves the kd
    # texel between segment calls. Per-lane results legitimately differ
    # from the deferred-epilogue whole-path mode (the RR schedule sees
    # the texel at a different time), so the contract is mean agreement.
    scene, cam, _ = testscenes.kitchen_stress(width=16, height=16, grid=2,
                                              ns=8, nt=6)
    pack = mk.make_pack(scene)
    assert pack.textured and pack.has_env
    md = MaxDepthParams(max_depth=4)
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    rng = qmc.make_state("pcg", 0, lane, 0)
    o, d, rng = cam_mod.generate_rays(cam, lane, rng)
    L0 = np.asarray(mk.trace_megakernel(pack, md, o, d, rng,
                                        interpret=True))
    L1 = np.asarray(mk.trace_megakernel_swf(pack, md, o, d, rng,
                                            interpret=True,
                                            key_mode="none"))
    L2 = np.asarray(mk.trace_megakernel_swf(pack, md, o, d, rng,
                                            interpret=True,
                                            key_mode="pos_dir"))
    assert np.isfinite(L1).all()
    # sorted vs unsorted swf is per-lane deterministic (same estimator)
    assert np.allclose(L1, L2, rtol=1e-4, atol=1e-5)
    rel = abs(L1.mean() - L0.mean()) / max(L0.mean(), 1e-6)
    assert rel < 0.05, (L0.mean(), L1.mean())


def test_swf_treelet_key_parity_and_fallback():
    # tl_* keys need the w8 pack's treelet boxes; per-lane radiance under
    # treelet regrouping matches the unsorted walk (conservative culling)
    ps = load_xml(f"{REF}/bunny.xml", override_res=(12, 12))
    md = MaxDepthParams(max_depth=3)
    pack = mk.make_pack(ps.scene, node_fmt="w8")
    tl = np.asarray(pack["tlbox"])
    used = (tl[:, 0] < 1e29).sum()
    assert 8 <= used <= 64
    # every used box is a real box
    assert (tl[:used, 3:6] >= tl[:used, 0:3]).all()
    B = ps.camera.width * ps.camera.height
    lane = jnp.arange(B, dtype=jnp.int32)
    rng = qmc.make_state("pcg", 0, lane, 0)
    o, d, rng = cam_mod.generate_rays(ps.camera, lane, rng)
    L0 = np.asarray(mk.trace_megakernel(pack, md, o, d, rng,
                                        interpret=True))
    L1 = np.asarray(mk.trace_megakernel_swf(pack, md, o, d, rng,
                                            interpret=True,
                                            key_mode="tl_pos"))
    assert np.allclose(L0, L1, rtol=1e-4, atol=1e-5)
    # non-w8 packs have no treelet boxes: tl keys must raise, not crash
    pack_f32 = mk.make_pack(ps.scene)
    with pytest.raises(ValueError, match="treelet"):
        mk.trace_megakernel_swf(pack_f32, md, o, d, rng, interpret=True,
                                key_mode="tl_pos")


def test_morton_key_orders_by_octant_then_cell():
    # live lanes first; same-octant lanes contiguous under dir_pos
    n = 64
    rs = np.random.default_rng(0)
    st = [None] * 21
    st[2] = jnp.asarray(rs.uniform(-1, 1, n), jnp.float32)
    st[3] = jnp.asarray(rs.uniform(-1, 1, n), jnp.float32)
    st[4] = jnp.asarray(rs.uniform(-1, 1, n), jnp.float32)
    st[5] = jnp.asarray(rs.normal(size=n), jnp.float32)
    st[6] = jnp.asarray(rs.normal(size=n), jnp.float32)
    st[7] = jnp.asarray(rs.normal(size=n), jnp.float32)
    act = np.ones(n, np.float32)
    act[::7] = 0.0
    st[14] = jnp.asarray(act)
    key = np.asarray(mk.swf_sort_key(tuple(st)))
    order = np.argsort(key, kind="stable")
    live_sorted = act[order]
    # all dead lanes sort to the tail
    n_live = int(act.sum())
    assert live_sorted[:n_live].all() and not live_sorted[n_live:].any()
    # within live prefix, octants are contiguous
    d = np.stack([np.asarray(st[5]), np.asarray(st[6]),
                  np.asarray(st[7])], 1)
    oct_ = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2
            + (d[:, 2] < 0)).astype(int)
    seq = oct_[order][:n_live]
    changes = (np.diff(seq) != 0).sum()
    assert changes <= 7  # at most one run per octant
