"""Stratified dispersion-wavelength sampling (roadmap: hero-wavelength).

Through a *delta* dispersive refraction — the only dispersive lobe both here
and in the reference (src/bsdf/dispersion.cuh) — non-hero wavelengths carry
zero MIS weight, so full 4-λ hero-wavelength sampling degenerates to one
wavelength exactly where dispersion noise originates. The obtainable win is
jittered stratification of the single path wavelength across a pixel's
samples, which these tests pin down: coverage, decorrelation, unbiasedness,
and the measured variance reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.bsdf import spectral
from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene import types as T


def test_wl_stratum_coverage():
    """Consecutive samples of one pixel must land in distinct strata."""
    lane = jnp.zeros((1,), jnp.int32)
    K = pt.WL_STRATA
    us = np.array(
        [float(pt.wl_stratum_u(3, s, lane)[0]) for s in range(K)]
    )
    bins = np.floor(us * K).astype(int)
    assert sorted(bins) == list(range(K)), bins
    assert (us >= 0).all() and (us < 1).all()


def test_wl_stratum_decorrelated_across_pixels():
    """The jitter must differ per lane or the whole frame's wavelength is
    correlated per sample (full-image chroma flicker at low spp)."""
    lanes = jnp.arange(256, dtype=jnp.int32)
    u = np.asarray(pt.wl_stratum_u(3, 5, lanes))
    # all in the same stratum, but the jitters must be spread out
    assert np.unique(np.floor(u * pt.WL_STRATA)).size == 1
    frac = u * pt.WL_STRATA - np.floor(u * pt.WL_STRATA)
    assert frac.std() > 0.2, frac.std()


def test_stratified_rgb_mean_variance():
    """Estimating E[rgb(λ)] (=1 per channel) with 16 stratified wavelengths
    must beat 16 independent ones by ~K× in variance."""
    K = pt.WL_STRATA
    trials = jnp.arange(512, dtype=jnp.int32)

    def est_strat(lane):
        us = jnp.stack([pt.wl_stratum_u(9, s, lane[None])[0] for s in range(K)])
        wl = spectral.WL_MIN + us * (spectral.WL_MAX - spectral.WL_MIN)
        return spectral.wavelength_to_rgb(wl).mean(axis=0)

    def est_rand(lane):
        st = prng.seed(17, lane[None].repeat(K) * jnp.int32(K) + jnp.arange(K))
        u, _ = prng.next1d(st)
        wl = spectral.WL_MIN + u * (spectral.WL_MAX - spectral.WL_MIN)
        return spectral.wavelength_to_rgb(wl).mean(axis=0)

    es = np.asarray(jax.vmap(est_strat)(trials))
    er = np.asarray(jax.vmap(est_rand)(trials))
    # both unbiased around (1,1,1)
    assert np.allclose(es.mean(axis=0), 1.0, atol=0.02), es.mean(axis=0)
    assert np.allclose(er.mean(axis=0), 1.0, atol=0.06), er.mean(axis=0)
    v_s, v_r = es.var(axis=0).mean(), er.var(axis=0).mean()
    assert v_s < v_r / 4.0, (v_s, v_r)


def _furnace_mse(stratified: bool, spp: int = 16, seed: int = 21):
    """Per-pixel MSE vs the exact furnace answer (1.0) for a dispersive
    furnace, with the wavelength stratification toggled."""
    scene, cam, _ = testscenes.furnace(
        width=12, height=12, btype=T.BSDF_DISPERSION, k_s=(1.0, 1.0, 1.0)
    )
    md = MaxDepthParams(max_depth=48, max_diffuse=48, max_specular=48,
                        max_transmit=48)
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def render(scene_arg):
        def body(i, acc):
            rng = prng.seed(
                jnp.asarray(seed, jnp.uint32)
                + jnp.asarray(i, jnp.uint32) * jnp.uint32(9781),
                lane,
            )
            o, d, rng = cam_mod.generate_rays(cam, lane, rng)
            wl_u = pt.wl_stratum_u(seed, i, lane) if stratified else None
            return acc + pt.trace_paths(scene_arg, md, o, d, rng,
                                        use_bvh=False, wl_u=wl_u)

        return jax.lax.fori_loop(0, spp, body, jnp.zeros((B, 3))) / spp

    img = np.asarray(render(scene))
    assert np.isfinite(img).all()
    return float(((img - 1.0) ** 2).mean()), float(img.mean())


def test_dispersion_furnace_stratified_lower_mse():
    mse_s, mean_s = _furnace_mse(True)
    mse_r, mean_r = _furnace_mse(False)
    # both unbiased (white furnace)
    assert abs(mean_s - 1.0) < 0.08, mean_s
    assert abs(mean_r - 1.0) < 0.12, mean_r
    # stratification must cut pixel MSE decisively at spp == strata count
    assert mse_s < 0.6 * mse_r, (mse_s, mse_r)
