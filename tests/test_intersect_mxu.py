"""MXU matmul-form intersection vs the elementwise brute-force oracle.

ops/intersect_mxu.py factors every Möller-Trumbore / sphere test into one
(B, 12) @ (12, 4P) contraction (see its module docstring); these tests pin
it to ops/intersect.py's closest_hit_brute on mixed triangle+sphere scenes,
including t_max clipping, chunked scan execution, occlusion parity, the
renderer integration (traversal="mxu"), and gradient flow to vertices.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops import intersect_mxu as mxu
from cuda_pt_tpu.scene.builder import BSDFSpec, SceneBuilder


def _random_scene(n_tris=150, n_sph=6, seed=3):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec())
    center = rng.uniform(-1, 1, size=(n_tris, 1, 3))
    tris = center + rng.normal(scale=0.15, size=(n_tris, 3, 3))
    b.add_mesh(tris.astype(np.float32), mat)
    for _ in range(n_sph):
        b.add_sphere(rng.uniform(-1, 1, size=3), 0.2, mat)
    return b.compile()


def _random_rays(n=512, seed=11):
    # origins outside the cloud, directions AT it — keeps the hit rate high
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
    o = jnp.asarray(2.5 * u, jnp.float32)
    tgt = rng.uniform(-0.8, 0.8, size=(n, 3))
    d = vm.normalize(jnp.asarray(tgt - np.asarray(o), jnp.float32))
    return o, d


def _assert_matches(out, ref, atol=2e-3):
    hit_m = np.asarray(out["hit"])
    hit_b = np.asarray(ref["hit"])
    np.testing.assert_array_equal(hit_m, hit_b)
    h = hit_b
    # same hit distance; prim may differ only at exact ties, so compare t
    np.testing.assert_allclose(
        np.asarray(out["t"])[h], np.asarray(ref["t"])[h], rtol=1e-3, atol=atol
    )
    same_prim = np.asarray(out["prim"])[h] == np.asarray(ref["prim"])[h]
    assert same_prim.mean() > 0.99, f"prim mismatch {1 - same_prim.mean():.3%}"
    np.testing.assert_allclose(
        np.asarray(out["b1"])[h][same_prim],
        np.asarray(ref["b1"])[h][same_prim], atol=5e-3,
    )


def test_mxu_matches_brute_mixed_scene():
    scene = _random_scene()
    o, d = _random_rays()
    out = jax.jit(lambda o, d: mxu.closest_hit_mxu(scene.geom, o, d))(o, d)
    ref = isect.closest_hit_brute(scene.geom, o, d)
    assert np.asarray(ref["hit"]).mean() > 0.2  # the scene is actually hit
    _assert_matches(out, ref)


def test_mxu_chunked_scan_matches_single_chunk():
    scene = _random_scene(n_tris=100, n_sph=4)
    o, d = _random_rays(256, seed=5)
    whole = mxu.closest_hit_mxu(scene.geom, o, d, chunk=4096)
    chunked = mxu.closest_hit_mxu(scene.geom, o, d, chunk=32)  # pads + scans
    np.testing.assert_array_equal(np.asarray(whole["hit"]), np.asarray(chunked["hit"]))
    np.testing.assert_allclose(
        np.asarray(whole["t"])[np.asarray(whole["hit"])],
        np.asarray(chunked["t"])[np.asarray(whole["hit"])], rtol=1e-5,
    )


def test_mxu_t_max_clips():
    scene = _random_scene(n_tris=80)
    o, d = _random_rays(256, seed=9)
    ref = isect.closest_hit_brute(scene.geom, o, d)
    t_ref = np.asarray(ref["t"])
    finite = np.isfinite(t_ref)
    t_max = jnp.asarray(np.where(finite, t_ref * 0.5, 1e-3), jnp.float32)
    out = mxu.closest_hit_mxu(scene.geom, o, d, t_max=t_max)
    # clipping at half the closest distance: the previous best must be gone
    t_out = np.asarray(out["t"])
    assert np.all(t_out[np.asarray(out["hit"])] < np.asarray(t_max)[np.asarray(out["hit"])])
    ref_clip = isect.closest_hit_brute(scene.geom, o, d, t_max=t_max)
    np.testing.assert_array_equal(np.asarray(out["hit"]), np.asarray(ref_clip["hit"]))


def test_mxu_occlusion_matches_brute():
    scene = _random_scene()
    o, d = _random_rays(512, seed=21)
    t_far = jnp.full((512,), 1.2, jnp.float32)
    occ_m = np.asarray(mxu.occlusion_mxu(scene.geom, o, d, t_far))
    occ_b = np.asarray(isect.occlusion_brute(scene.geom, o, d, t_far))
    # the MXU form reorders the FMA chain: allow epsilon-edge flips only
    assert (occ_m == occ_b).mean() > 0.995
    occ_c = np.asarray(mxu.occlusion_mxu(scene.geom, o, d, t_far, chunk=32))
    np.testing.assert_array_equal(occ_m, occ_c)


def test_renderer_traversal_mxu_matches_brute_image():
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import testscenes

    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    md = MaxDepthParams(max_depth=3)
    ref = pt.render(scene, cam, md, spp=2, seed=4, use_bvh=False)
    img = pt.render(scene.replace(traversal="mxu"), cam, md, spp=2, seed=4,
                    use_bvh=False)
    # identical RNG streams; only intersection arithmetic differs (epsilon
    # reorders can flip a ray at a triangle edge, so near-equal not equal)
    diff = np.abs(np.asarray(img) - np.asarray(ref))
    assert np.quantile(diff, 0.99) < 2e-2, float(diff.max())
    assert float(np.abs(np.asarray(img).mean() - np.asarray(ref).mean())) < 1e-3


def test_mxu_gradients_flow_to_vertices():
    scene = _random_scene(n_tris=40, n_sph=2)
    o, d = _random_rays(128, seed=2)

    def loss(p0):
        g = scene.geom.replace(p0=p0)
        out = mxu.closest_hit_mxu(g, o, d)
        t = jnp.where(jnp.isfinite(out["t"]), out["t"], 0.0)
        return jnp.sum(t)

    grad = jax.grad(loss)(scene.geom.p0)
    assert bool(jnp.all(jnp.isfinite(grad)))
    assert float(jnp.abs(grad).sum()) > 0.0
