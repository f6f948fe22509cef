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
