"""Low-discrepancy dispersion-wavelength sampling (golden-ratio rotation).

Through a *delta* dispersive refraction — the only dispersive lobe both here
and in the reference (src/bsdf/dispersion.cuh) — non-hero wavelengths carry
zero MIS weight, so full 4-λ hero-wavelength sampling degenerates to one
wavelength exactly where dispersion noise originates. The obtainable win is
a low-discrepancy sequence over the single path wavelength; the golden-ratio
rotation frac(u0 + s·φ) is unbiased at EVERY sample count (fixed-K strata
bias any spp that is not a multiple of K — the trap these tests pin).
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


def _seq(lane_val, n, seed=3):
    lane = jnp.full((1,), lane_val, jnp.int32)
    return np.array([float(pt.wl_stratum_u(seed, s, lane)[0])
                     for s in range(n)])


def test_prefix_low_discrepancy():
    """Every prefix must be near-evenly spread (three-distance theorem):
    the max gap of n golden-rotation points stays within ~2/n."""
    us = _seq(0, 64)
    for n in (4, 8, 16, 64):
        pts = np.sort(us[:n])
        gaps = np.diff(np.concatenate([pts, [pts[0] + 1.0]]))
        assert gaps.max() < 2.0 / n + 1e-6, (n, gaps.max())


def test_every_prefix_mean_unbiased():
    """Marginal uniformity at ANY sample count: averaged over many pixels,
    each prefix mean must be ~0.5 (a fixed-K ladder fails this for
    spp < K — its first samples all come from the low strata)."""
    lanes = jnp.arange(2048, dtype=jnp.int32)
    for n in (3, 5, 7):
        us = np.stack([np.asarray(pt.wl_stratum_u(11, s, lanes))
                       for s in range(n)])
        assert abs(us.mean() - 0.5) < 0.02, (n, us.mean())


def test_decorrelated_across_pixels():
    """The rotation offset must differ per lane or the whole frame's
    wavelength is correlated per sample (full-image chroma flicker)."""
    lanes = jnp.arange(256, dtype=jnp.int32)
    u = np.asarray(pt.wl_stratum_u(3, 5, lanes))
    assert u.std() > 0.2, u.std()


def test_stratified_rgb_mean_variance():
    """Estimating E[rgb(λ)] (=1 per channel) with 16 rotation samples must
    beat 16 independent ones decisively in variance."""
    K = 16
    trials = jnp.arange(512, dtype=jnp.int32)

    def est_strat(lane):
        us = jnp.stack([pt.wl_stratum_u(9, s, lane[None])[0]
                        for s in range(K)])
        wl = spectral.WL_MIN + us * (spectral.WL_MAX - spectral.WL_MIN)
        return spectral.wavelength_to_rgb(wl).mean(axis=0)

    def est_rand(lane):
        st = prng.seed(17, lane[None].repeat(K) * jnp.int32(K) + jnp.arange(K))
        u, _ = prng.next1d(st)
        wl = spectral.WL_MIN + u * (spectral.WL_MAX - spectral.WL_MIN)
        return spectral.wavelength_to_rgb(wl).mean(axis=0)

    es = np.asarray(jax.vmap(est_strat)(trials))
    er = np.asarray(jax.vmap(est_rand)(trials))
    assert np.allclose(es.mean(axis=0), 1.0, atol=0.03), es.mean(axis=0)
    assert np.allclose(er.mean(axis=0), 1.0, atol=0.06), er.mean(axis=0)
    v_s, v_r = es.var(axis=0).mean(), er.var(axis=0).mean()
    assert v_s < v_r / 3.0, (v_s, v_r)


def _furnace_mse(stratified: bool, spp: int = 16, seed: int = 21):
    """Per-pixel MSE vs the exact furnace answer (1.0) for a dispersive
    furnace, with the wavelength rotation toggled."""
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
    assert abs(mean_s - 1.0) < 0.08, mean_s
    assert abs(mean_r - 1.0) < 0.12, mean_r
    assert mse_s < 0.6 * mse_r, (mse_s, mse_r)


def test_dispersion_unbiased_at_small_odd_spp():
    """Regression for the fixed-K strata trap: at spp=5 (not a multiple of
    any ladder) the dispersive furnace must still average to 1 — a K=16
    ladder covered only the violet third and drifted the mean."""
    mse_s, mean_s = _furnace_mse(True, spp=5, seed=4)
    assert abs(mean_s - 1.0) < 0.15, mean_s
