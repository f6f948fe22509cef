"""Core layer tests: RNG, math, sampling, camera, film."""

import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import film as film_mod
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core import sampling


def test_rng_uniformity_and_decorrelation():
    state = prng.seed(42, jnp.arange(4096))
    total = []
    for _ in range(8):
        u, state = prng.next2d(state)
        total.append(np.asarray(u))
    u = np.concatenate(total, axis=0).ravel()
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(np.var(u) - 1.0 / 12.0) < 5e-3
    # lanes decorrelated: first draws across lanes behave uniformly
    u0, _ = prng.next1d(prng.seed(7, jnp.arange(65536)))
    hist, _ = np.histogram(np.asarray(u0), bins=64, range=(0, 1))
    assert hist.min() > 800  # expectation 1024

    # different seeds give different streams
    a, _ = prng.next1d(prng.seed(1, jnp.arange(128)))
    b, _ = prng.next1d(prng.seed(2, jnp.arange(128)))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_onb_orthonormal():
    n = vm.normalize(jnp.asarray(np.random.default_rng(0).normal(size=(256, 3)), jnp.float32))
    t, b = vm.onb(n)
    for v in (t, b):
        np.testing.assert_allclose(np.asarray(vm.length(v)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(b, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(t, b)), 0.0, atol=1e-5)
    # right-handed: t × b = n
    np.testing.assert_allclose(np.asarray(jnp.cross(t, b)), np.asarray(n), atol=1e-4)


def test_reflect_refract():
    d = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), [[0.70710678, 0.70710678, 0.0]], atol=1e-6)
    # refraction at normal incidence is straight through
    d2 = jnp.asarray([[0.0, -1.0, 0.0]])
    wt, tir = vm.refract(d2, n, jnp.asarray([[1.0 / 1.5]]))
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(wt), np.asarray(d2), atol=1e-6)


def test_cosine_hemisphere_stats():
    state = prng.seed(3, jnp.arange(1 << 16))
    u, _ = prng.next2d(state)
    d, pdf = sampling.cosine_hemisphere(u)
    d = np.asarray(d)
    assert (d[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for cosine-weighted
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3
    np.testing.assert_allclose(
        np.asarray(pdf), d[:, 2] / np.pi, atol=1e-5
    )


def test_camera_ray_and_splat_roundtrip():
    cam = cam_mod.make_camera((0, 0, -2), (0, 0, 0), fov=45, width=64, height=48)
    idx = jnp.arange(64 * 48, dtype=jnp.int32)
    state = prng.seed(0, idx)
    o, d, _ = cam_mod.generate_rays(cam, idx, state)
    assert bool(jnp.all(jnp.isfinite(o))) and bool(jnp.all(jnp.isfinite(d)))
    np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-5)
    # project a point 3 units along each ray back to its pixel
    p = o + 3.0 * d
    px, py, valid = cam_mod.splat_pixel(cam, p)
    valid = np.asarray(valid)
    assert valid.mean() > 0.99  # only boundary-jitter rounding may fall out
    px = np.asarray(px)[valid]
    py = np.asarray(py)[valid]
    ix = (np.asarray(idx) % 64)[valid]
    iy = (np.asarray(idx) // 64)[valid]
    assert np.abs(px - (ix + 0.5)).max() < 1.0
    assert np.abs(py - (iy + 0.5)).max() < 1.0


def test_film_welford():
    f = film_mod.make_film(4, 4)
    rng = np.random.default_rng(0)
    samples = rng.uniform(size=(16, 4, 4, 3)).astype(np.float32)
    for s in samples:
        f = film_mod.accumulate(f, jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(f.mean), samples.mean(0), atol=1e-5)
    lum = (
        0.212671 * samples[..., 0]
        + 0.715160 * samples[..., 1]
        + 0.072169 * samples[..., 2]
    )
    np.testing.assert_allclose(
        np.asarray(film_mod.variance(f)), lum.var(0, ddof=1), atol=1e-4
    )


def test_aces_tonemap_properties():
    """ACES filmic: monotone, bounded, rolls off highlights instead of
    clipping, near-linear in the shadows."""
    import jax.numpy as jnp

    from cuda_pt_tpu.core import film as film_mod

    x = jnp.linspace(0.0, 20.0, 256)[:, None] * jnp.ones((1, 3))
    y = np.asarray(film_mod.to_srgb(x, gamma=False, tonemap="aces"))[:, 0]
    assert (np.diff(y) >= -1e-6).all()
    assert y.min() >= 0.0 and y.max() <= 1.0
    # highlight rolloff: 10x radiance maps inside [0,1), not clipped at 4x
    assert y[-1] < 1.0 + 1e-6 and 0.95 < y[-1]
    g = np.asarray(film_mod.to_srgb(x, gamma=False, tonemap="gamma"))[:, 0]
    # gamma clips well before ACES saturates
    assert (g == 1.0).sum() > (y >= 0.999).sum()
