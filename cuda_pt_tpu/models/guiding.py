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


# ---------------------------------------------------------------------------
# renderer integration (wavefront/megakernel scatter stage, behind a flag)
# ---------------------------------------------------------------------------

_NET = GuideNet(hidden=32)  # fixed architecture so `guide` is a plain pytree


def make_guide(scene, rng_key):
    """Guide pytree {params, lo, ext} for a scene (scene-normalized inputs).
    Pass as ``guide=`` to wavefront.render / path_tracer.shade_stage."""
    params = _NET.init(rng_key, jnp.zeros((1, 6)))
    lo = jnp.min(scene.bvh.node_min[0:1], axis=0)
    hi = jnp.max(scene.bvh.node_max[0:1], axis=0)
    return {
        "params": params,
        "lo": lo,
        "ext": jnp.maximum(hi - lo, 1e-6),
    }


def guide_lobe(guide, p, n):
    """(axis, kappa, sel) at world positions p with normals n."""
    p_norm = (p - guide["lo"]) / guide["ext"]
    return lobe_params(_NET, guide["params"], p_norm, n)


def collect_samples(scene, cam, md, seed: int, use_bvh: bool, spp: int = 4):
    """Radiance-driven training tuples from the renderer's own paths:
    at each primary hit, scatter one BSDF direction and trace the remaining
    path; the tuple (hit position, normal, direction, path luminance) says
    which directions carried light (reference NASG data flow,
    src/pt_impl/wavefront_pt.cu:324-474)."""
    from ..bsdf import eval as bsdf_eval
    from ..core import camera as cam_mod
    from ..core import rng as prng
    from ..ops import intersect as isect
    from . import path_tracer as pt

    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    outs = []
    for i in range(spp):
        rng = prng.seed(jnp.uint32(seed) + jnp.uint32(i) * jnp.uint32(7919), lane)
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        hit = pt.closest_hit(scene, o, d, use_bvh)
        prim = jnp.maximum(hit["prim"], 0)
        t_safe = jnp.where(hit["hit"], hit["t"], 1.0)
        p = o + t_safe[:, None] * d
        inter = isect.surface_interaction(scene.geom, prim, hit["b1"], hit["b2"], p, d)
        bid = jnp.maximum(scene.objects.bsdf_id[inter["obj"]], 0)
        ctx = bsdf_eval.make_ctx(scene, bid, inter["uv"], inter["n_s"])
        bs, rng = bsdf_eval.sample_bsdf(ctx, -d, rng)
        o2 = p + inter["n_g"] * jnp.sign(
            vm.dot(inter["n_g"], bs["wi"], keepdims=True)
        ) * 1e-3
        import dataclasses

        md2 = dataclasses.replace(md, max_depth=max(md.max_depth - 1, 1))
        L = pt.trace_paths(scene, md2, o2, bs["wi"], rng, use_bvh)
        lum = jnp.sum(L * bs["weight"], axis=-1) / 3.0
        ok = hit["hit"] & ~bs["is_delta"] & (lum > 0.0)
        outs.append((p, ctx["n"], bs["wi"], jnp.where(ok, lum, 0.0)))
    cat = lambda j: jnp.concatenate([o[j] for o in outs])
    return cat(0), cat(1), cat(2), cat(3)


def train_guide(scene, cam, md, seed: int = 0, use_bvh: bool = True,
                spp: int = 6, steps: int = 50, lr: float = 1e-2):
    """Init + collect + fit: the online-fitting entry the viewer/renderer
    calls between accumulation passes. Returns (guide, final_loss).

    Defaults are the measured optimum of the slot-scene schedule sweep
    (scripts/guiding_study.py → GUIDING_STUDY.json): spp=6/steps=50 gives
    0.79× unguided variance with 1.4% mean drift; longer fits overfit the
    sparse luminance samples and erode the win (400 steps → 0.90×)."""
    guide = make_guide(scene, jax.random.PRNGKey(seed))
    p, n, d, lum = collect_samples(scene, cam, md, seed, use_bvh, spp)
    p_norm = (p - guide["lo"]) / guide["ext"]
    params, loss = fit(_NET, guide["params"], p_norm, n, d, lum,
                       steps=steps, lr=lr)
    guide["params"] = params
    return guide, loss


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
