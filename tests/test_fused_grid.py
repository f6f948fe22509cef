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
    assert pack.has_grid
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


def test_grid_absorber_transmittance_exact():
    """Zero-albedo constant grid vs the EQUIVALENT homogeneous medium:
    pure absorption makes the image deterministic up to light sampling,
    and residual tracking is exact on a constant grid, so the two fused
    renders must agree tightly."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import (BSDFSpec, EmitterSpec,
                                           MediumSpec, SceneBuilder)

    def build(hom, sig=2.0):
        b = SceneBuilder()
        white = b.add_bsdf(BSDFSpec(k_d=(0.7, 0.7, 0.7)))
        fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
        em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                       emission=(1, 1, 1), scaler=6.0))
        q = testscenes.quad
        b.add_mesh(q([-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]),
                   white, emitter_id=em)
        if hom:
            med = b.add_medium(MediumSpec(
                mtype=T.MEDIUM_HOMOGENEOUS, sigma_s=(0, 0, 0),
                sigma_a=(sig, sig, sig), scale=1.0))
        else:
            dens = np.full((8, 8, 8), sig, np.float32)
            gid = b.add_grid(dens, (-1, -1, -1), (1, 1, 1))
            med = b.add_medium(MediumSpec(
                mtype=T.MEDIUM_GRID, grid_id=gid, sigma_s=(0, 0, 0),
                scale=1.0))
        cube = np.concatenate([
            q([-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]),
            q([1, -1, 1], [-1, -1, 1], [-1, 1, 1], [1, 1, 1]),
            q([-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]),
            q([1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]),
            q([-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]),
            q([-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]),
        ], axis=0)
        b.add_mesh(cube, fwd, medium_in=med, cullable=True)
        b.add_mesh(q([-3, -1.2, -3], [3, -1.2, -3], [3, -1.2, 3],
                     [-3, -1.2, 3]), white)
        s = b.compile()
        cam = cam_mod.make_camera((0, -0.6, -3.5), (0, -1.0, 0), fov=30,
                                  width=12, height=12)
        return s, cam

    md = MaxDepthParams(max_depth=4, max_volume=8)
    means = {}
    for name, hom in (("hom", True), ("grid", False)):
        scene, cam = build(hom)
        means[name] = _fused_mean(scene, cam, md, seeds=4).mean()
    rel = abs(means["hom"] - means["grid"]) / max(means["hom"], 1e-6)
    assert rel < 0.06, means
