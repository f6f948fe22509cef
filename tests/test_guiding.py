"""Path-guiding module tests: vMF sampling/pdf consistency + fitting."""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.models import guiding


def test_vmf_pdf_normalized():
    B = 1 << 15
    r = np.random.default_rng(0)
    d = vm.normalize(jnp.asarray(r.normal(size=(B, 3)), jnp.float32))
    axis = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
    for kappa in [1.0, 5.0, 20.0]:
        pdf = guiding.vmf_pdf(axis, jnp.full(B, kappa), d)
        integral = float(jnp.mean(pdf)) * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.05, (kappa, integral)


def test_vmf_sampling_matches_pdf():
    B = 1 << 15
    state = prng.seed(1, jnp.arange(B))
    u2, _ = prng.next2d(state)
    axis = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
    kappa = jnp.full(B, 8.0)
    d = guiding.vmf_sample(axis, kappa, u2)
    np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-4)
    # E[cos] for vMF = coth(k) - 1/k
    k = 8.0
    expect = 1.0 / np.tanh(k) - 1.0 / k
    got = float(jnp.mean(vm.dot(axis, d)))
    assert abs(got - expect) < 0.01, (got, expect)


def test_fit_moves_lobe_toward_bright_direction():
    net, params = guiding.init_guide(jax.random.key(0))
    B = 512
    r = np.random.default_rng(3)
    p = jnp.asarray(r.uniform(0, 1, size=(B, 3)), jnp.float32)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
    bright_dir = vm.normalize(jnp.asarray([[0.6, 0.0, 0.8]]))
    d = vm.normalize(
        jnp.asarray(r.normal(scale=0.15, size=(B, 3)), jnp.float32) + bright_dir
    )
    lum = jnp.ones(B)
    params2, loss = guiding.fit(net, params, p, n, d, lum, steps=150)
    axis, kappa, sel = guiding.lobe_params(net, params2, p, n)
    align = float(jnp.mean(vm.dot(axis, jnp.broadcast_to(bright_dir, (B, 3)))))
    assert align > 0.8, align
    assert np.isfinite(loss)


def _slot_scene():
    """Light visible only through a narrow slot: NEE from the floor is
    mostly occluded and cosine BSDF sampling rarely finds the slot — the
    classic configuration where guided scattering wins."""
    import numpy as np

    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder

    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.75, 0.75, 0.75)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    em = b.add_emitter(EmitterSpec(emission=(1, 1, 1), scaler=60.0))
    q = testscenes.quad
    # floor (normal +y, toward the light)
    b.add_mesh(q([-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1]), white)
    # bright light above a panel with a narrow slot at x in [0.05, 0.25]
    # (normal -y: one-sided emission must face the floor)
    b.add_mesh(q([-1, 1.6, -1], [1, 1.6, -1], [1, 1.6, 1], [-1, 1.6, 1]),
               dark, emitter_id=em)
    # occluder panel at y=1.0 with the slot cut out (two pieces, normals -y)
    b.add_mesh(q([-1, 1.0, -1], [0.05, 1.0, -1], [0.05, 1.0, 1], [-1, 1.0, 1]), white)
    b.add_mesh(q([0.25, 1.0, -1], [1, 1.0, -1], [1, 1.0, 1], [0.25, 1.0, 1]), white)
    scene = b.compile()
    from cuda_pt_tpu.core import camera as cam_mod

    cam = cam_mod.make_camera((0, 0.7, -2.6), (0, 0.3, 0), fov=35,
                              width=20, height=20)
    return scene, cam


def test_guided_wavefront_unbiased_and_lower_variance():
    """Equal-spp comparison on the slot scene: guided scatter must agree
    with the unguided estimator in expectation and reduce seed-to-seed
    variance (VERDICT r1 item 8)."""
    import numpy as np

    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import guiding, wavefront

    scene, cam = _slot_scene()
    md = MaxDepthParams(max_depth=3)
    guide, loss = guiding.train_guide(scene, cam, md, seed=3, use_bvh=False,
                                      spp=6, steps=150)
    assert np.isfinite(loss)

    def stats(g, n_seeds=8, spp=6):
        imgs = [
            np.asarray(wavefront.render(scene, cam, md, spp=spp, seed=50 + s,
                                        use_bvh=False, guide=g))
            for s in range(n_seeds)
        ]
        imgs = np.stack(imgs)
        return imgs.mean(), imgs.var(axis=0).mean()

    m_un, v_un = stats(None)
    m_g, v_g = stats(guide)
    # unbiased: means agree (MC tolerance)
    assert abs(m_g - m_un) / max(m_un, 1e-6) < 0.15, (m_g, m_un)
    # variance reduction on the guided estimator
    assert v_g < v_un, (v_g, v_un)
