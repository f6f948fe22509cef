"""Round-3 regression tests: advisor r2 findings + chunked-call rendering.

1. medium — differentiable render with traversal='pallas' must not silently
   detach geometry gradients (models/path_tracer.trace_paths_final).
2. low — intersect_gather sphere-miss NaN in the VJP (ops/intersect.py).
3. low — MXU intersect catastrophic cancellation far from the origin
   (ops/intersect_mxu re-centering).
4. VERDICT item 7 — banded (chunked-call) rendering is bit-identical to the
   single-call render at any fake per-call budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pt_tpu.api import Renderer
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops import intersect_mxu
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene.types import Geometry


def _sphere_geom(center, r):
    c = jnp.asarray(center, jnp.float32)[None]
    z3 = jnp.zeros((1, 3), jnp.float32)
    z2 = jnp.zeros((1, 2), jnp.float32)
    return Geometry(
        p0=c, e1=jnp.array([[r, 0.0, 0.0]], jnp.float32), e2=z3,
        n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
        obj_idx=jnp.zeros((1,), jnp.int32),
        is_sphere=jnp.ones((1,), bool),
    )


def test_gather_sphere_miss_grads_finite():
    """Rays that MISS the sphere (disc <= 0) must not NaN vertex grads
    through intersect_gather (advisor r2: the double-where fix existed in
    intersect_mxu but not here)."""
    geom = _sphere_geom([0.0, 0.0, 5.0], 1.0)
    o = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)  # 2nd misses

    def loss(p0):
        g = geom.replace(p0=p0)
        hit = isect.closest_hit_brute(g, o, d)
        t = jnp.where(jnp.isfinite(hit["t"]), hit["t"], 0.0)
        return jnp.sum(t)

    grad = jax.grad(loss)(geom.p0)
    assert np.all(np.isfinite(np.asarray(grad))), grad


def test_mxu_far_from_origin_precision():
    """A scene translated 1e4 from the origin must intersect identically
    (advisor r2: |o|^2 / o.c cancellation) — re-centering fix."""
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    geom = scene.geom
    off = jnp.asarray([1e4, -2e4, 3e4], jnp.float32)
    geom_far = geom.replace(p0=geom.p0 + off)

    B = 64
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (B, 3), minval=0.5, maxval=2.0)
    d_raw = jax.random.normal(jax.random.PRNGKey(1), (B, 3))
    d = d_raw / jnp.linalg.norm(d_raw, axis=-1, keepdims=True)

    near = isect.closest_hit_brute(geom, o, d)
    far = intersect_mxu.closest_hit_mxu(geom_far, o + off, d)
    hit_agree = np.mean(np.asarray(near["hit"] == far["hit"]))
    assert hit_agree >= 0.97, hit_agree
    both = np.asarray(near["hit"] & far["hit"])
    t_err = np.abs(np.asarray(near["t"] - far["t"]))[both]
    assert t_err.size and np.percentile(t_err, 90) < 2e-2, t_err.max()


def test_pallas_differentiable_falls_back_with_warning():
    """differentiable=True + traversal='pallas' must WARN and fall back to
    the differentiable XLA traversal (advisor r2 medium: silent detach).
    The fallback's gradients must match a traversal='xla' render exactly."""
    scene, cam, _ = testscenes.cornell_box(width=6, height=6)
    md = MaxDepthParams(max_depth=3)

    def loss(a, trav):
        kd = scene.bsdfs.k_d.at[0].set(jnp.stack([a, a, a]))
        sc = scene.replace(bsdfs=scene.bsdfs.replace(k_d=kd),
                           traversal=trav)
        return jnp.mean(pt.render(sc, cam, md, spp=2, seed=3, use_bvh=True,
                                  differentiable=True))

    with pytest.warns(UserWarning, match="pallas"):
        g_pal = float(jax.grad(lambda a: loss(a, "pallas"))(jnp.float32(0.5)))
    g_xla = float(jax.grad(lambda a: loss(a, "xla"))(jnp.float32(0.5)))
    assert np.isfinite(g_pal) and g_pal != 0.0
    np.testing.assert_allclose(g_pal, g_xla, rtol=0, atol=0)


def test_banded_render_bit_identical():
    """Chunked-call rendering (fake tiny budget) == single-call rendering,
    bitwise (VERDICT r2 item 7)."""
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    parsed = _as_parsed(scene, cam)
    r_whole = Renderer(parsed, max_lanes_per_call=0)
    r_band = Renderer(parsed, max_lanes_per_call=48)  # 3 rows per call
    a = r_whole.render(2)
    b = r_band.render(2)
    np.testing.assert_array_equal(a, b)
    assert r_band.counter() == 2


def test_banded_render_vpt_bit_identical():
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    parsed = _as_parsed(scene, cam)
    from cuda_pt_tpu.core.config import RendererType

    r_whole = Renderer(parsed, renderer=RendererType.VOLUME_PT,
                       max_lanes_per_call=0)
    r_band = Renderer(parsed, renderer=RendererType.VOLUME_PT,
                      max_lanes_per_call=24)
    np.testing.assert_array_equal(r_whole.render(1), r_band.render(1))


def _as_parsed(scene, cam):
    from cuda_pt_tpu.scene.xml_parser import ParsedScene
    from cuda_pt_tpu.core.config import RenderingConfig

    return ParsedScene(scene, cam,
                       RenderingConfig(width=cam.width, height=cam.height),
                       None)


def test_api_fused_renderer():
    """Renderer(traversal='fused') drives the in-kernel Pallas megakernel
    (interpret on CPU) and matches the composed renderer, including banded."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk

    old = mk.INTERPRET
    mk.INTERPRET = True
    try:
        scene, cam, _ = testscenes.cornell_box(width=16, height=16)
        parsed = _as_parsed(scene, cam)
        r_f = Renderer(parsed, traversal="fused", max_lanes_per_call=0)
        assert r_f.info()["traversal"] == "fused"
        r_x = Renderer(parsed, max_lanes_per_call=0)
        a, b = r_f.render(2), r_x.render(2)
        match = np.isclose(a, b, atol=2e-2, rtol=1e-3).mean()
        assert match > 0.95, match
        # banded fused render: bit-identical to unbanded fused
        r_fb = Renderer(parsed, traversal="fused", max_lanes_per_call=64)
        np.testing.assert_array_equal(r_fb.render(2), a)
    finally:
        mk.INTERPRET = old


def test_api_fused_rejects_out_of_envelope():
    # round 4 admitted envmaps, diffuse textures, dispersion and spots —
    # participating media remain composed-only
    from cuda_pt_tpu.scene.builder import (BSDFSpec, EmitterSpec,
                                           MediumSpec, SceneBuilder)
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.core import camera as cam_mod

    b = SceneBuilder()
    med = b.add_medium(MediumSpec(sigma_a=(0.2, 0.2, 0.2),
                                  sigma_s=(0.5, 0.5, 0.5)))
    fog = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    grey = b.add_bsdf(BSDFSpec(k_d=(0.5, 0.5, 0.5)))
    e = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA, emission=(4, 4, 4)))
    b.add_mesh(testscenes.quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]),
               grey)
    b.add_mesh(testscenes.quad([0.3, 0.9, 0.3], [0.7, 0.9, 0.3],
                               [0.7, 0.9, 0.7], [0.3, 0.9, 0.7]),
               grey, emitter_id=e)
    b.add_mesh(testscenes.quad([0, 0.4, 0], [1, 0.4, 0],
                               [1, 0.4, 1], [0, 0.4, 1]),
               fog, medium_in=med)
    scene = b.compile()
    cam = cam_mod.make_camera(origin=(0.5, 0.5, -1.2),
                              target=(0.5, 0.2, 0.5), fov=45.0,
                              width=8, height=8)
    parsed = _as_parsed(scene, cam)
    with pytest.raises(ValueError, match="envelope"):
        Renderer(parsed, traversal="fused")
