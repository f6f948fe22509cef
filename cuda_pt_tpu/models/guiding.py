"""Neural path guiding (experimental) — runnable counterpart of the
reference's NASG skeleton shaders (nee_direct_shader /
guided_ray_scatter_net_eval_shader, src/pt_impl/wavefront_pt.cu:324-474,
which are non-functional placeholders upstream).

A small flax MLP maps hit position (scene-normalized) + surface normal to an
anisotropic-spherical-Gaussian-style lobe (axis + sharpness + selection
probability). Guided sampling mixes the learned lobe with plain BSDF
sampling via one-sample MIS, so an untrained (or badly trained) network
stays unbiased — only the variance changes.

Training data is the renderer's own (position, direction, luminance)
samples; fit() runs a few Adam steps. This is deliberately minimal: the
interface (guide_ctx → sample/pdf) is the integration point the wavefront
renderer can adopt; quality work (NASG mixtures, per-bounce caches) is
future perf tuning.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..core import math as vm


class GuideNet(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden)(x)
        h = nn.relu(h)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        out = nn.Dense(5)(h)  # axis(3), log-sharpness, logit-selection
        return out


def init_guide(rng_key, hidden: int = 32):
    net = GuideNet(hidden=hidden)
    params = net.init(rng_key, jnp.zeros((1, 6)))
    return net, params


def lobe_params(net: GuideNet, params, p_norm: jnp.ndarray, n: jnp.ndarray):
    """(axis (B,3) unit, kappa (B,), select_prob (B,)) from the network."""
    out = net.apply(params, jnp.concatenate([p_norm, n], axis=-1))
    axis = vm.normalize(out[..., :3] + n)  # bias toward the normal
    kappa = jnp.exp(jnp.clip(out[..., 3], -2.0, 4.0)) + 1.0
    sel = jax.nn.sigmoid(out[..., 4]) * 0.5  # guide at most half the samples
    return axis, kappa, sel


def vmf_pdf(axis, kappa, d):
    """von Mises-Fisher density on S²."""
    cos_t = vm.dot(axis, d)
    c = kappa / (2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa)) + 1e-9)
    return c * jnp.exp(kappa * (cos_t - 1.0))


def vmf_sample(axis, kappa, u2):
    """Inverse-CDF vMF sampling around axis."""
    w = 1.0 + jnp.log(
        u2[..., 0] + (1.0 - u2[..., 0]) * jnp.exp(-2.0 * kappa) + 1e-12
    ) / jnp.maximum(kappa, 1e-6)
    w = jnp.clip(w, -1.0, 1.0)
    r = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), w], axis=-1)
    return vm.to_world(local, axis)


def guided_mix_pdf(net, params, p_norm, n, bsdf_pdf, d):
    """One-sample-MIS mixture pdf: (1-sel)·bsdf + sel·vmf."""
    axis, kappa, sel = lobe_params(net, params, p_norm, n)
    return (1.0 - sel) * bsdf_pdf + sel * vmf_pdf(axis, kappa, d)


def fit(net, params, p_norm, n, d, radiance_lum, steps: int = 100, lr: float = 1e-2):
    """Fit the lobe to observed bright directions (luminance-weighted NLL)."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    w = radiance_lum / jnp.maximum(jnp.mean(radiance_lum), 1e-6)

    def loss_fn(prm):
        axis, kappa, _ = lobe_params(net, prm, p_norm, n)
        nll = -jnp.log(vmf_pdf(axis, kappa, d) + 1e-6)
        return jnp.mean(w * nll)

    @jax.jit
    def step(prm, st):
        loss, g = jax.value_and_grad(loss_fn)(prm)
        upd, st = opt.update(g, st)
        return optax.apply_updates(prm, upd), st, loss

    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    return params, float(loss)
