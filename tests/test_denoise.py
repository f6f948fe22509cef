"""Edge-avoiding à-trous denoiser: quality and invariance checks."""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import debug_renderers, denoise
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes


def _mse(a, b):
    return float(jnp.mean((a - b) ** 2))


def test_denoise_beats_noisy_input():
    scene, cam, _ = testscenes.cornell_box(width=32, height=32)
    md = MaxDepthParams(max_depth=4)
    render = jax.jit(lambda spp, seed: pt.render(
        scene, cam, md, spp=spp, seed=seed, use_bvh=False),
        static_argnums=(0,))
    ref = render(256, 7)
    noisy = render(4, 1)
    # decorrelated AOV seed: an independent emission estimate subtracts/adds
    # back cleanly while the filtered residual smooths (measured better than
    # both seed-aligned AOVs and filtering emission in-place)
    aovs = jax.jit(lambda: debug_renderers.render_aovs(scene, cam, spp=4, seed=0))()
    den = jax.jit(lambda img: denoise.atrous_denoise(img, aovs))(noisy)

    mse_noisy = _mse(noisy, ref)
    mse_den = _mse(den, ref)
    # measured ~2.05x MSE reduction at 4 spp (single-frame a-trous,
    # no temporal accumulation) — guard a ~1.8x floor
    assert mse_den < 0.55 * mse_noisy, (mse_den, mse_noisy)
    # and not shift overall energy by more than a few percent
    assert abs(float(jnp.mean(den)) / float(jnp.mean(ref)) - 1.0) < 0.05
    # the light must not be smeared away: the brightest emission pixel
    # stays within 20% of the converged reference
    e = np.asarray(aovs["emission"]).sum(-1)
    iy, ix = np.unravel_index(np.argmax(e), e.shape)
    np.testing.assert_allclose(np.asarray(den)[iy, ix],
                               np.asarray(ref)[iy, ix], rtol=0.2)


def test_denoise_preserves_albedo_edges():
    """Red/green wall boundary pixels keep their chroma (demodulation:
    texture/albedo detail is divided out before filtering)."""
    scene, cam, _ = testscenes.cornell_box(width=32, height=32)
    md = MaxDepthParams(max_depth=4)
    noisy = jax.jit(lambda: pt.render(
        scene, cam, md, spp=4, seed=1, use_bvh=False))()
    aovs = jax.jit(lambda: debug_renderers.render_aovs(scene, cam, spp=4))()
    den = np.asarray(jax.jit(
        lambda img: denoise.atrous_denoise(img, aovs))(noisy))
    # left wall stays red-dominant, right wall green-dominant after filtering
    assert den[16, 1, 0] > den[16, 1, 1] * 2
    assert den[16, 30, 1] > den[16, 30, 0] * 2


def test_variance_guided_never_loses_to_raw():
    """The shrinkage blend must cap the denoised MSE near/below raw at a
    sample count where plain filtering is badly biased (16 spp), and still
    win decisively at 4 spp."""
    import jax.numpy as jnp

    from cuda_pt_tpu.core import film as film_mod

    scene, cam, _ = testscenes.cornell_box(width=48, height=48)
    md = MaxDepthParams(max_depth=5)
    ref = np.asarray(pt.render(scene, cam, md, spp=768, seed=991,
                               use_bvh=False))
    aovs = debug_renderers.render_aovs(scene, cam, spp=4, seed=7919,
                                       use_bvh=False)

    def film_at(spp):
        film = film_mod.make_film(48, 48)
        for i in range(spp):
            film = film_mod.accumulate(
                film, pt.render_sample(scene, cam, md, 0, i, False))
        return film

    for spp, cap in [(4, 0.95), (16, 1.05)]:
        film = film_at(spp)
        var = film_mod.variance(film) / jnp.maximum(film.count, 1)
        raw = ((np.asarray(film.mean) - ref) ** 2).mean()
        out = np.asarray(denoise.atrous_denoise(film.mean, aovs, variance=var))
        d = ((out - ref) ** 2).mean()
        assert d < cap * raw, (spp, d, raw)
