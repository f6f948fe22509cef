"""Fused grid-media VPT (round 5): the split swf driver delta-tracks
free flight and ratio-tracks NEE transmittance in XLA around the shade
kernel (grid sigmas are zeroed in mrow so every in-kernel analytic exp
factor is exactly 1 for grid lanes).

Parity contract is MEAN agreement vs the composed VPT: the fused path
draws its tracking randomness from a side pcg stream (xor-derived), so
per-lane results differ by construction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import qmc
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import volume_pt
from cuda_pt_tpu.ops.pallas import megakernel as mk
from cuda_pt_tpu.scene import testscenes


@pytest.fixture(scope="module")
def smoke():
    scene, cam, _ = testscenes.grid_smoke(width=12, height=12)
    return scene, cam


def _fused_mean(scene, cam, md, seeds=6):
    pack = mk.make_pack(scene, node_fmt="w8", vpt=True)
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    ml = int(scene.bvh.max_leaf)
    f = jax.jit(lambda o, d, r: mk.trace_megakernel_swf(
        pack, md, o, d, r, max_leaf=ml, interpret=True, key_mode="none"))
    acc = 0.0
    for sd in range(seeds):
        rs = qmc.make_state("pcg", sd, lane, 0)
        o, d, rs2 = cam_mod.generate_rays(cam, lane, rs)
        L = np.asarray(f(o, d, rs2))
        assert np.isfinite(L).all()
        acc = acc + L
    return acc / seeds


def test_grid_smoke_inside_envelope(smoke):
    scene, _ = smoke
    assert mk.megakernel_ok(scene, renderer="vpt")
    # grid packs force the split swf driver
    pack = mk.make_pack(scene, node_fmt="w8", vpt=True)
    assert pack.has_grid
    with pytest.raises(ValueError, match="split"):
        mk.trace_megakernel(pack, MaxDepthParams(max_depth=2),
                            jnp.zeros((128, 3)), jnp.zeros((128, 3)),
                            jnp.zeros((128, 2), jnp.uint32),
                            interpret=True)


def test_grid_smoke_fused_matches_composed_mean(smoke):
    scene, cam = smoke
    md = MaxDepthParams(max_depth=6, max_volume=5)
    fused = _fused_mean(scene, cam, md, seeds=6)
    comp = 0.0
    for sd in range(3):
        comp = comp + np.asarray(volume_pt.render(
            scene, cam, md, spp=8, seed=sd, use_bvh=True))
    comp = comp / 3
    rel = abs(fused.mean() - comp.mean()) / max(comp.mean(), 1e-6)
    assert rel < 0.2, (fused.mean(), comp.mean())


def _absorber_scene(kind, sig=2.0):
    """Floor + ceiling area light + an absorber slab BETWEEN them but OUT
    of the camera frustum (cube y in [0.2, 1.2]; every camera ray stays
    below y=0): the only medium interaction is the NEE shadow segment, so
    with kind='hom' the fused image is deterministic (analytic interface
    walk) and with kind='grid' residual ratio tracking is EXACT on a
    constant grid (tr stays 1, control = exp(-sigma*len)) — both renders
    are noise-free per seed and must agree tightly. kind='vac' keeps the
    null interfaces but a sigma=0 medium (regression: NEE through null
    crossings must not be blocked — the round-5 rem-vs-advance bug)."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import (BSDFSpec, EmitterSpec,
                                           MediumSpec, SceneBuilder)

    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.7, 0.7, 0.7)))
    fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                   emission=(1, 1, 1), scaler=6.0))
    q = testscenes.quad
    b.add_mesh(q([-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]),
               white, emitter_id=em)
    y0, y1 = 0.2, 1.2
    if kind == "none":
        # no slab, no medium: the surface-PT reference scene
        b.add_mesh(q([-3, -1.2, -3], [3, -1.2, -3], [3, -1.2, 3],
                     [-3, -1.2, 3]), white)
        s = b.compile()
        cam = cam_mod.make_camera((0, -0.2, -4.0), (0, -1.2, -0.3),
                                  fov=22, width=12, height=12)
        return s, cam
    if kind == "grid":
        dens = np.full((8, 8, 8), sig, np.float32)
        gid = b.add_grid(dens, (-1, y0, -1), (1, y1, 1))
        med = b.add_medium(MediumSpec(
            mtype=T.MEDIUM_GRID, grid_id=gid, sigma_s=(0, 0, 0),
            scale=1.0))
    else:
        sa = sig if kind == "hom" else 0.0
        med = b.add_medium(MediumSpec(
            mtype=T.MEDIUM_HOMOGENEOUS, sigma_s=(0, 0, 0),
            sigma_a=(sa, sa, sa), scale=1.0))
    cube = np.concatenate([
        q([-1, y0, -1], [1, y0, -1], [1, y1, -1], [-1, y1, -1]),
        q([1, y0, 1], [-1, y0, 1], [-1, y1, 1], [1, y1, 1]),
        q([-1, y0, 1], [-1, y0, -1], [-1, y1, -1], [-1, y1, 1]),
        q([1, y0, -1], [1, y0, 1], [1, y1, 1], [1, y1, -1]),
        q([-1, y1, -1], [1, y1, -1], [1, y1, 1], [-1, y1, 1]),
        q([-1, y0, 1], [1, y0, 1], [1, y0, -1], [-1, y0, -1]),
    ], axis=0)
    b.add_mesh(cube, fwd, medium_in=med, cullable=True)
    b.add_mesh(q([-3, -1.2, -3], [3, -1.2, -3], [3, -1.2, 3],
                 [-3, -1.2, 3]), white)
    s = b.compile()
    # aimed so every floor hit's shadow ray crosses the slab
    cam = cam_mod.make_camera((0, -0.2, -4.0), (0, -1.2, -0.3), fov=22,
                              width=12, height=12)
    return s, cam


def test_grid_absorber_transmittance_exact():
    """Zero-albedo constant grid vs the EQUIVALENT homogeneous slab, NEE
    segment only (slab out of frustum): per seed both fused renders are
    deterministic — hom applies the analytic interface-walk exp, grid
    applies residual ratio tracking whose stochastic factor is exactly 1
    on a constant grid — so they must agree to geometry epsilon."""
    md = MaxDepthParams(max_depth=1, max_volume=8)
    means = {}
    for kind in ("hom", "grid"):
        scene, cam = _absorber_scene(kind)
        means[kind] = _fused_mean(scene, cam, md, seeds=3).mean()
    assert means["hom"] > 1e-4, means  # NEE must actually contribute
    rel = abs(means["hom"] - means["grid"]) / max(means["hom"], 1e-6)
    assert rel < 0.02, means


def test_nee_through_null_interface_not_blocked():
    """Round-5 regression (found by the grid A/B): the interface-walked
    shadow transmittance decremented `remaining` by the hit distance but
    advanced the origin by hit+1e-3 per crossing, so after two crossings
    the destination light fell inside the (1-1e-3) blocker gate and the
    light occluded its own shadow ray — NEE through ANY null interface
    was silently zero in both the composed and the fused VPT.

    With a sigma=0 medium the null slab is physically nothing: the NEE
    contribution behind it must match a slab-free render of the same
    scene. Checks the composed estimator (volume_pt.transmittance_
    estimate) and the fused kernel walk (megakernel walk_transmittance)
    against the no-medium composed surface PT."""
    from cuda_pt_tpu.models import path_tracer as pt_mod

    md = MaxDepthParams(max_depth=1, max_volume=8)
    scene, cam = _absorber_scene("vac")
    fused = _fused_mean(scene, cam, md, seeds=3).mean()
    comp = np.mean([np.asarray(volume_pt.render(
        scene, cam, md, spp=16, seed=sd, use_bvh=True))
        for sd in range(3)])
    # slab-free reference: same floor/light geometry, no cube, no medium
    ref_scene, ref_cam = _absorber_scene("none")
    ref = np.mean([np.asarray(pt_mod.render_sample(
        ref_scene, ref_cam, md, seed=sd, sample_idx=si, use_bvh=True))
        for sd in range(3) for si in range(16)])
    assert ref > 1e-3
    assert abs(comp - ref) / ref < 0.12, (comp, ref)
    assert abs(fused - ref) / ref < 0.12, (fused, ref)
