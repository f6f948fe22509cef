"""End-to-end integrator tests: white furnace + cornell box first light."""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes


def test_white_furnace_lambert():
    """Unit envmap + unit-albedo lambert sphere must converge to 1.0."""
    scene, cam, _ = testscenes.furnace(width=24, height=24, albedo=1.0)
    md = MaxDepthParams(max_depth=32, max_diffuse=32)
    img = jax.jit(
        lambda s: pt.render(s, cam, md, spp=96, seed=1, use_bvh=False)
    )(scene)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # every pixel (sphere or background) sees exactly the furnace radiance
    assert abs(img.mean() - 1.0) < 0.02, img.mean()
    assert np.abs(img - 1.0).max() < 0.25


def test_furnace_absorbing_sphere():
    """albedo 0.5 sphere in unit furnace → interior pixels < 1, > 0.25."""
    scene, cam, _ = testscenes.furnace(width=16, height=16, albedo=0.5)
    md = MaxDepthParams(max_depth=16, max_diffuse=16)
    img = np.asarray(pt.render(scene, cam, md, spp=64, seed=3, use_bvh=False))
    h, w = img.shape[:2]
    center = img[h // 2, w // 2].mean()
    corner = img[0, 0].mean()
    assert abs(corner - 1.0) < 0.05  # background still furnace
    assert 0.2 < center < 0.9  # darkened by absorption


def test_cornell_first_light():
    scene, cam, _ = testscenes.cornell_box(width=48, height=48)
    md = MaxDepthParams(max_depth=5, max_diffuse=5)
    img = np.asarray(pt.render(scene, cam, md, spp=48, seed=2, use_bvh=False))
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # lit
    h, w = img.shape[:2]
    # color bleeding: left third redder than right third; right third greener
    left = img[:, : w // 3].mean(axis=(0, 1))
    right = img[:, -w // 3 :].mean(axis=(0, 1))
    assert left[0] > left[1] * 1.2, left
    assert right[1] > right[0] * 1.2, right
    # energy sane (no fireflies exploding the mean)
    assert img.mean() < 2.0


def test_cornell_bvh_matches_brute():
    """Same seeds ⇒ identical radiance estimates through both intersectors."""
    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    md = MaxDepthParams(max_depth=4)
    a = np.asarray(pt.render(scene, cam, md, spp=8, seed=5, use_bvh=False))
    b = np.asarray(pt.render(scene, cam, md, spp=8, seed=5, use_bvh=True))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_gradients_flow_to_emitter_and_albedo():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)

    def loss(emission, kd):
        s = scene.replace(
            emitters=scene.emitters.replace(emission=emission),
            bsdfs=scene.bsdfs.replace(k_d=kd),
        )
        img = pt.render(s, cam, md, spp=2, seed=0, use_bvh=False, differentiable=True)
        return jnp.mean(img)

    g_em, g_kd = jax.grad(loss, argnums=(0, 1))(
        scene.emitters.emission, scene.bsdfs.k_d
    )
    g_em = np.asarray(g_em)
    g_kd = np.asarray(g_kd)
    assert np.isfinite(g_em).all() and np.isfinite(g_kd).all()
    # brightness increases with emitter radiance and with wall albedo
    assert g_em[1].sum() > 0.0
    assert np.abs(g_kd).sum() > 0.0


def test_batched_passes_match_sequential():
    """samples_per_pass folds k samples per dispatch with identical RNG
    streams → identical image."""
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    a = np.asarray(pt.render(scene, cam, md, spp=4, seed=6, use_bvh=False))
    b = np.asarray(
        pt.render(scene, cam, md, spp=4, seed=6, use_bvh=False, samples_per_pass=4)
    )
    match = np.isclose(a, b, atol=1e-4).mean()
    assert match > 0.95, match
    assert abs(a.mean() - b.mean()) < 0.01


def test_tiled_render_matches_untiled():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    a = np.asarray(pt.render(scene, cam, md, spp=4, seed=2, use_bvh=False))
    b = pt.render_tiled(scene, cam, md, spp=4, seed=2, use_bvh=False, rows_per_tile=5)
    match = np.isclose(a, b, atol=1e-4).mean()
    assert match > 0.95, match
    assert abs(a.mean() - b.mean()) < 0.01
