"""Texture atlas sampling + inverse-rendering (gradient descent) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes, types as T
from cuda_pt_tpu.scene import textures as tex
from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder


def test_atlas_bilinear_sampling():
    b = SceneBuilder()
    img0 = np.zeros((2, 2, 3), np.float32)
    img0[0, 0] = [1, 0, 0]
    img0[1, 1] = [0, 0, 1]
    t0 = b.add_texture(img0)
    img1 = np.full((4, 4, 3), 0.5, np.float32)
    t1 = b.add_texture(img1)
    b.add_bsdf(BSDFSpec())
    b.add_sphere((0, 0, 0), 1.0, 0)
    scene = b.compile()

    # texel centers return exact values
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.75]], jnp.float32)
    tid = jnp.asarray([t0, t0], jnp.int32)
    out = np.asarray(tex.sample_texture(scene.textures, tid, uv))
    np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1, :3], [0, 0, 1], atol=1e-5)
    # second texture unaffected by first (offset correctness)
    out1 = np.asarray(
        tex.sample_texture(scene.textures, jnp.asarray([t1]), jnp.asarray([[0.5, 0.5]]))
    )
    np.testing.assert_allclose(out1[0, :3], [0.5, 0.5, 0.5], atol=1e-5)
    # tex_id -1 → ones
    none = np.asarray(
        tex.sample_texture(scene.textures, jnp.asarray([-1]), jnp.asarray([[0.3, 0.7]]))
    )
    np.testing.assert_allclose(none[0], 1.0)


def test_textured_emitter_changes_render():
    """Area light with an emission texture renders tinted illumination."""
    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.8, 0.8, 0.8)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    red_tex = b.add_texture(np.tile(np.asarray([1.0, 0.05, 0.05], np.float32), (2, 2, 1)))
    em = b.add_emitter(
        EmitterSpec(etype=T.EMITTER_AREA, emission=(1, 1, 1), scaler=10.0, tex_id=red_tex)
    )
    b.add_mesh(testscenes.quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]), white)
    b.add_mesh(
        testscenes.quad([-0.3, 1.0, -0.3], [0.3, 1.0, -0.3], [0.3, 1.0, 0.3], [-0.3, 1.0, 0.3]),
        dark, emitter_id=em,
    )
    scene = b.compile()
    from cuda_pt_tpu.core import camera as cam_mod

    cam = cam_mod.make_camera((0, 0.5, -2.5), (0, 0.2, 0), fov=40, width=12, height=12)
    img = np.asarray(
        pt.render(scene, cam, MaxDepthParams(max_depth=3), spp=32, seed=0, use_bvh=False)
    )
    mean = img.mean(axis=(0, 1))
    assert mean[0] > 4 * mean[1]  # red-tinted bounce light


def test_inverse_rendering_recovers_albedo():
    """Gradient descent on wall albedo converges toward the target image."""
    scene, cam, _ = testscenes.cornell_box(width=12, height=12)
    md = MaxDepthParams(max_depth=3)

    target_kd = scene.bsdfs.k_d
    target = pt.render(
        scene.replace(bsdfs=scene.bsdfs.replace(k_d=target_kd)),
        cam, md, spp=16, seed=42, use_bvh=False,
    )

    # start from wrong albedos
    kd0 = jnp.clip(target_kd * 0.3 + 0.3, 0.0, 1.0)

    def loss_fn(kd, seed):
        s = scene.replace(bsdfs=scene.bsdfs.replace(k_d=kd))
        img = pt.render(s, cam, md, spp=4, seed=seed, use_bvh=False, differentiable=True)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    kd = kd0
    # SGD with momentum; per-step MC noise is large at this resolution so the
    # meaningful metric is parameter-space error, not the noisy image loss.
    vel = jnp.zeros_like(kd)
    for i in range(40):
        _, g = grad_fn(kd, i + 1)
        vel = 0.8 * vel + g
        kd = jnp.clip(kd - 25.0 * vel, 0.0, 1.0)
    # only BSDFs that actually affect the image get gradients; measure the
    # wall/box albedos (ids 0..2 = white/red/green in testscenes)
    err0 = float(jnp.abs(kd0[:3] - target_kd[:3]).mean())
    err1 = float(jnp.abs(kd[:3] - target_kd[:3]).mean())
    assert err1 < 0.6 * err0, (err0, err1)
    # high-spp renders (above the MC noise floor) confirm image improvement
    def render32(kd_):
        s = scene.replace(bsdfs=scene.bsdfs.replace(k_d=kd_))
        return pt.render(s, cam, md, spp=32, seed=7, use_bvh=False)

    d0 = float(jnp.mean(jnp.abs(render32(kd0) - target)))
    d1 = float(jnp.mean(jnp.abs(render32(kd) - target)))
    assert d1 < d0, (d0, d1)
