"""Pixel-gradient correctness vs finite differences (BASELINE.json target:
"image + pixel-grad allclose").

Uses common random numbers: the detached-sampling estimator renders with
identical RNG streams for perturbed parameters, so central finite
differences converge to the analytic gradient without MC-noise floors for
parameters the detached estimator treats smoothly (emission, albedo,
medium sigma)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.models import volume_pt
from cuda_pt_tpu.scene import testscenes, types as T
from cuda_pt_tpu.scene.builder import BSDFSpec, MediumSpec, SceneBuilder


def _fd_check(render_with, p0, eps, rtol, atol=1e-4):
    """Compare d(mean image)/dp at p0 via AD vs central differences."""
    f = lambda p: jnp.mean(render_with(p))
    g_ad = float(jax.grad(f)(jnp.float32(p0)))
    g_fd = float((f(jnp.float32(p0 + eps)) - f(jnp.float32(p0 - eps))) / (2 * eps))
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    assert g_fd != 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol)
    return g_ad, g_fd


@pytest.fixture(scope="module")
def cbox():
    scene, cam, _ = testscenes.cornell_box(width=12, height=12)
    return scene, cam, MaxDepthParams(max_depth=3)


def test_grad_emitter_scaler_matches_fd(cbox):
    scene, cam, md = cbox

    def render_with(s):
        sc = scene.replace(
            emitters=scene.emitters.replace(scaler=scene.emitters.scaler.at[1].set(s))
        )
        return pt.render(sc, cam, md, spp=4, seed=3, use_bvh=False, differentiable=True)

    # radiance is LINEAR in the emitter scaler → FD is exact up to fp error
    _fd_check(render_with, 12.0, eps=0.5, rtol=2e-3)


def test_grad_albedo_matches_fd(cbox):
    scene, cam, md = cbox

    def render_with(a):
        kd = scene.bsdfs.k_d.at[0].set(jnp.stack([a, a, a]))
        sc = scene.replace(bsdfs=scene.bsdfs.replace(k_d=kd))
        return pt.render(sc, cam, md, spp=4, seed=5, use_bvh=False, differentiable=True)

    # polynomial in albedo; small eps + CRN → tight agreement
    _fd_check(render_with, 0.73, eps=1e-3, rtol=2e-2)


def test_grad_homogeneous_sigma_matches_fd():
    """Differentiable medium density (BASELINE volumetric target)."""
    scene0, cam, bld = testscenes.cornell_box(width=10, height=10)
    b = SceneBuilder()
    b.bsdfs = list(bld.bsdfs)
    b.emitters = list(bld.emitters)
    fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    med = b.add_medium(
        MediumSpec(sigma_a=(0.1, 0.1, 0.1), sigma_s=(0.8, 0.8, 0.8), scale=1.0)
    )
    for ob in bld.objects:
        b.objects.append(ob)
    cube = np.concatenate(
        [
            testscenes.quad([0.2, 0.05, 0.2], [0.8, 0.05, 0.2], [0.8, 0.65, 0.2], [0.2, 0.65, 0.2]),
            testscenes.quad([0.8, 0.05, 0.8], [0.2, 0.05, 0.8], [0.2, 0.65, 0.8], [0.8, 0.65, 0.8]),
            testscenes.quad([0.2, 0.05, 0.8], [0.2, 0.05, 0.2], [0.2, 0.65, 0.2], [0.2, 0.65, 0.8]),
            testscenes.quad([0.8, 0.05, 0.2], [0.8, 0.05, 0.8], [0.8, 0.65, 0.8], [0.8, 0.65, 0.2]),
            testscenes.quad([0.2, 0.65, 0.2], [0.8, 0.65, 0.2], [0.8, 0.65, 0.8], [0.2, 0.65, 0.8]),
            testscenes.quad([0.2, 0.05, 0.8], [0.8, 0.05, 0.8], [0.8, 0.05, 0.2], [0.2, 0.05, 0.2]),
        ],
        axis=0,
    )
    b.add_mesh(cube, fwd, medium_in=med, cullable=True)
    scene = b.compile()
    md = MaxDepthParams(max_depth=4, max_volume=3)

    def render_with(scale):
        sc = scene.replace(media=scene.media.replace(scale=scene.media.scale.at[0].set(scale)))
        return volume_pt.render(sc, cam, md, spp=4, seed=2, use_bvh=False, differentiable=True)

    g_ad, g_fd = _fd_check(render_with, 1.0, eps=2e-3, rtol=0.15, atol=5e-3)
    # denser medium should darken the view (absorption + scattering out)
    assert g_ad != 0.0


def test_remat_gradients_match(cbox):
    """differentiable="remat" (jax.checkpoint per bounce) is the SAME
    estimator: identical primal image, gradients equal to the non-remat
    path up to fp reassociation."""
    scene, cam, md = cbox

    def make(diff):
        def f(s):
            sc = scene.replace(
                emitters=scene.emitters.replace(
                    scaler=scene.emitters.scaler.at[1].set(s))
            )
            return jnp.mean(
                pt.render(sc, cam, md, spp=2, seed=3, use_bvh=False,
                          differentiable=diff))
        return f

    s0 = jnp.float32(12.0)
    v_plain, g_plain = jax.value_and_grad(make(True))(s0)
    v_remat, g_remat = jax.value_and_grad(make("remat"))(s0)
    np.testing.assert_array_equal(np.asarray(v_plain), np.asarray(v_remat))
    np.testing.assert_allclose(float(g_plain), float(g_remat), rtol=1e-6)


def test_remat_gradients_match_vpt():
    scene0, cam, bld = testscenes.cornell_box(width=8, height=8)
    md = MaxDepthParams(max_depth=3)

    def make(diff):
        def f(s):
            sc = scene0.replace(
                emitters=scene0.emitters.replace(
                    scaler=scene0.emitters.scaler.at[1].set(s))
            )
            return jnp.mean(
                volume_pt.render(sc, cam, md, spp=2, seed=4, use_bvh=False,
                                 differentiable=diff))
        return f

    s0 = jnp.float32(10.0)
    v_plain, g_plain = jax.value_and_grad(make(True))(s0)
    v_remat, g_remat = jax.value_and_grad(make("remat"))(s0)
    np.testing.assert_array_equal(np.asarray(v_plain), np.asarray(v_remat))
    np.testing.assert_allclose(float(g_plain), float(g_remat), rtol=1e-6)


def test_remat_cuts_backward_memory():
    """The point of "remat": XLA's own accounting shows the backward pass
    needs a fraction of the activation memory (measured 29.7 MB → 4.1 MB at
    64² depth 8 spp 4) AND that the remat grad memory is independent of spp
    (the per-pass checkpoint; plain grows ~linearly: 93 MB at spp 16)."""
    scene, cam, _ = testscenes.cornell_box(width=64, height=64)
    md = MaxDepthParams(max_depth=8)

    def loss(diff, spp):
        def f(s):
            sc = scene.replace(emitters=scene.emitters.replace(
                scaler=scene.emitters.scaler.at[1].set(s)))
            return jnp.mean(pt.render(sc, cam, md, spp=spp, seed=3,
                                      use_bvh=True, differentiable=diff))
        return f

    def temp_bytes(diff, spp):
        c = jax.jit(jax.grad(loss(diff, spp))).lower(jnp.float32(12.0)).compile()
        ma = c.memory_analysis()
        return None if ma is None else ma.temp_size_in_bytes

    plain = temp_bytes(True, 4)
    if not plain:  # backend without memory analysis
        pytest.skip("memory_analysis unavailable on this backend")
    remat4 = temp_bytes("remat", 4)
    remat16 = temp_bytes("remat", 16)
    assert remat4 * 2 < plain, (remat4, plain)
    assert remat16 < remat4 * 1.5, (remat16, remat4)  # spp-independent


def test_grad_env_scale_matches_fd():
    scene, cam, _ = testscenes.furnace(width=10, height=10, albedo=0.6)
    md = MaxDepthParams(max_depth=4, max_diffuse=4)
    eid = int(scene.env_emitter)

    def render_with(s):
        sc = scene.replace(
            emitters=scene.emitters.replace(scaler=scene.emitters.scaler.at[eid].set(s))
        )
        return pt.render(sc, cam, md, spp=4, seed=1, use_bvh=False, differentiable=True)

    _fd_check(render_with, 1.0, eps=0.05, rtol=2e-3)


def test_grad_through_pallas_traversal_detached(cbox):
    """differentiable render with traversal="pallas": the packet kernel has
    no VJP, so path_tracer._detached runs it outside AD — emitter/BSDF
    gradients must still flow (through shading gathers) and match the
    brute-traversal gradients, since the SAME hits feed the same shading."""
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

    scene, cam, md = cbox
    old = tk.INTERPRET
    tk.INTERPRET = True  # no Mosaic on the CPU test backend
    try:
        sc_p = scene.replace(traversal="pallas")

        def render_with(traversal_scene, s):
            sc = traversal_scene.replace(
                emitters=traversal_scene.emitters.replace(
                    scaler=traversal_scene.emitters.scaler.at[1].set(s))
            )
            return pt.render(sc, cam, md, spp=2, seed=3, use_bvh=True,
                             differentiable=True)

        f_pal = lambda s: jnp.mean(render_with(sc_p, s))
        g_pal = float(jax.grad(f_pal)(jnp.float32(12.0)))
        f_ref = lambda s: jnp.mean(render_with(scene, s))
        g_ref = float(jax.grad(f_ref)(jnp.float32(12.0)))
        assert np.isfinite(g_pal) and g_pal != 0.0
        np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4)
    finally:
        tk.INTERPRET = old
