"""Owen-scrambled Sobol sampler (core/qmc.py): stratification properties,
uniformity, renderer integration, and the equal-spp error win."""

import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core import qmc
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes


def _pair_points(lane_val, n, pair=0, base_seed=7):
    lane = jnp.full((1,), lane_val, jnp.int32)
    pts = []
    for s in range(n):
        st = qmc.seed(base_seed, lane, s)
        for _ in range(pair):
            _, st = qmc.next2d(st)
        u, _ = qmc.next2d(st)
        pts.append(np.asarray(u)[0])
    return np.array(pts)


def test_elementary_interval_stratification():
    """First 16 samples of any dim pair must fill every elementary-interval
    grid of 16 cells exactly once ((0,2)-sequence property, preserved by
    Owen scrambling + the Laine-Karras index shuffle)."""
    for lane_val in (0, 311):
        for pair in (0, 1, 3):
            p = _pair_points(lane_val, 16, pair)
            for nx, ny in [(4, 4), (16, 1), (1, 16), (8, 2), (2, 8)]:
                cells = {
                    (int(x * nx), int(y * ny)) for x, y in p
                }
                assert len(cells) == 16, (lane_val, pair, nx, ny, len(cells))


def test_progressive_prefixes_stratified():
    """Power-of-two prefixes must also be stratified (progressive QMC)."""
    p = _pair_points(5, 64)
    for m in (4, 16, 64):
        g = int(np.sqrt(m))
        cells = {(int(x * g), int(y * g)) for x, y in p[:m]}
        assert len(cells) == m, (m, len(cells))


def test_lanes_decorrelated():
    """Different pixels must get different scrambles."""
    a = _pair_points(0, 16)
    b = _pair_points(1, 16)
    assert np.abs(a - b).max() > 0.05


def test_uniform_mean():
    """Scrambled Sobol draws are uniform: mean ≈ 1/2, var ≈ 1/12."""
    lanes = jnp.arange(4096, dtype=jnp.int32)
    st = qmc.seed(3, lanes, 0)
    us = []
    for _ in range(8):
        u, st = qmc.next2d(st)
        us.append(np.asarray(u))
    u = np.concatenate(us, axis=-1)
    assert abs(u.mean() - 0.5) < 0.01, u.mean()
    assert abs(u.var() - 1.0 / 12.0) < 0.005, u.var()


def test_dispatch_via_rng_module():
    """prng.next1d/next2d/discrete1d must route (…, 4) states to qmc."""
    lane = jnp.arange(8, dtype=jnp.int32)
    st = qmc.seed(1, lane, 2)
    u1, st1 = prng.next1d(st)
    assert u1.shape == (8,) and st1.shape == (8, 4)
    u2, st2 = prng.next2d(st1)
    # 2D draws align up to a pair boundary (dim 1 -> pair [2,3] -> dim 4)
    assert u2.shape == (8, 2) and int(st2[0, 1]) == 4
    i, _ = prng.discrete1d(st2, 5)
    assert ((np.asarray(i) >= 0) & (np.asarray(i) < 5)).all()


def test_deep_dims_fall_back_but_stay_uniform():
    lane = jnp.arange(2048, dtype=jnp.int32)
    st = qmc.seed(9, lane, 1)
    # push dim past MAX_DIMS
    st = st.at[..., 1].set(jnp.uint32(qmc.MAX_DIMS + 3))
    u, _ = prng.next2d(st)
    u = np.asarray(u)
    assert abs(u.mean() - 0.5) < 0.02 and u.min() >= 0 and u.max() < 1


def test_cornell_sobol_beats_pcg():
    """Equal-spp MSE vs a high-spp reference: Sobol must win decisively
    (measured ~5× at 16 spp) and agree in expectation."""
    scene, cam, _ = testscenes.cornell_box(width=32, height=32)
    md = MaxDepthParams(max_depth=5)
    ref = np.asarray(
        pt.render(scene, cam, md, spp=256, seed=99, use_bvh=False)
    )
    i_p = np.asarray(
        pt.render(scene, cam, md, spp=16, seed=0, use_bvh=False)
    )
    i_s = np.asarray(
        pt.render(scene, cam, md, spp=16, seed=0, use_bvh=False,
                  sampler="sobol")
    )
    assert abs(i_s.mean() - ref.mean()) / ref.mean() < 0.05
    mse_p = ((i_p - ref) ** 2).mean()
    mse_s = ((i_s - ref) ** 2).mean()
    assert mse_s < 0.5 * mse_p, (mse_s, mse_p)


def test_wavefront_sobol_matches_megakernel_sobol():
    """The QMC state must survive wavefront permutation/compaction: WFPT
    with sobol is the same estimator as megakernel with sobol."""
    from cuda_pt_tpu.models import wavefront

    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    md = MaxDepthParams(max_depth=4)
    a = np.asarray(pt.render(scene, cam, md, spp=4, seed=3, use_bvh=False,
                             sampler="sobol"))
    b = np.asarray(wavefront.render(scene, cam, md, spp=4, seed=3,
                                    use_bvh=False, compact=True,
                                    sampler="sobol"))
    # identical estimator up to scatter-add float ordering (lane permutation
    # changes the accumulation order of the final pixel splat)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-4)


def test_sobol_cuts_gradient_variance():
    """QMC also pays in reverse mode: the seed-to-seed variance of a
    differentiable render's parameter gradient drops several-fold at equal
    spp (measured ~14× lower variance on the emitter-scaler gradient)."""
    import jax

    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    md = MaxDepthParams(max_depth=3)
    target = jnp.asarray(np.asarray(
        pt.render(scene, cam, md, spp=128, seed=77, use_bvh=False)))

    def grad_fn(sampler):
        def loss(scaler, seed):
            s = scene.replace(
                emitters=scene.emitters.replace(scaler=scaler))
            img = pt.render(s, cam, md, spp=8, seed=seed, use_bvh=False,
                            differentiable=True, sampler=sampler)
            return jnp.mean((img - target) ** 2)

        return jax.jit(jax.grad(loss))

    def stats(sampler, n_seeds=8):
        g = grad_fn(sampler)
        vals = np.array([
            np.asarray(g(scene.emitters.scaler, 100 + s))[1]
            for s in range(n_seeds)
        ])
        return vals.mean(), vals.var()

    m_p, v_p = stats("pcg")
    m_s, v_s = stats("sobol")
    # same gradient in expectation (MC tolerance: both near each other
    # within the pcg std)
    assert abs(m_s - m_p) < 3.0 * np.sqrt(v_p), (m_s, m_p, v_p)
    # decisive variance cut (measured ~0.07x; assert < 0.4x)
    assert v_s < 0.4 * v_p, (v_s, v_p)
