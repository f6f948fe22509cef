"""Worked inverse-rendering example: recover scene parameters by gradient
descent through the differentiable path tracer.

The reference renderer is forward-only; differentiability is this
framework's north-star extension (SURVEY.md §7 item 4). This script is the
end-to-end demo: render a ground-truth image, perturb a chosen parameter
family, then optimize it back with Adam on the Monte-Carlo image loss.

Parameter families:
  albedo    diffuse k_d of every BSDF       (detached-sampling gradients)
  emitter   emission RGB x scale            (linear -> fast convergence)
  sigma     homogeneous medium sigma_t      (volumetric transmittance grads)

Everything runs on CPU by default (--tpu to use the device); resolution is
deliberately small so the demo completes in ~1-2 min.

Usage:
  python scripts/inverse_render.py --param albedo --steps 60 --out /tmp/inv
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--param", choices=["albedo", "emitter", "sigma"],
                    default="albedo")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--res", type=int, default=24)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--out", default="/tmp/inverse_render")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of forcing CPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cuda_pt_tpu.core import film as film_mod
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.models import volume_pt as vpt
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.utils.image import save_png

    # per-family defaults (validated: all three recover with these)
    defaults = {"albedo": (60, 8), "emitter": (30, 8), "sigma": (200, 16)}
    d_steps, d_spp = defaults[args.param]
    if args.steps is None:
        args.steps = d_steps
    if args.spp is None:
        args.spp = d_spp

    os.makedirs(args.out, exist_ok=True)
    scene, cam, bld = testscenes.cornell_box(width=args.res, height=args.res)
    md = MaxDepthParams(max_depth=3)

    # --- parameter family: (true value, perturbed init, apply(scene, theta))
    # which rows of theta the error metric covers (albedo: only materials
    # that are visible in the render get gradients — the light panel's black
    # k_d and any unused slots stay at their init)
    err_rows = slice(None)

    if args.param == "albedo":
        theta_true = scene.bsdfs.k_d
        theta0 = jnp.clip(theta_true * 0.3 + 0.35, 0.0, 1.0)
        lr = args.lr or 0.05
        err_rows = slice(0, 3)  # white/red/green walls (testscenes order)

        def apply(s, th):
            return s.replace(bsdfs=s.bsdfs.replace(k_d=jnp.clip(th, 0.0, 1.0)))

        def render(s, seed, spp, diff):
            return pt.render(s, cam, md, spp=spp, seed=seed, use_bvh=False,
                             differentiable=diff)

    elif args.param == "emitter":
        theta_true = scene.emitters.emission * scene.emitters.scaler[:, None]
        theta0 = theta_true * jnp.asarray([[1.0], [0.25]])  # dim the area light
        lr = args.lr or 0.5

        def apply(s, th):
            e = s.emitters.replace(
                emission=jnp.maximum(th, 0.0),
                scaler=jnp.ones_like(s.emitters.scaler),
            )
            return s.replace(emitters=e)

        def render(s, seed, spp, diff):
            return pt.render(s, cam, md, spp=spp, seed=seed, use_bvh=False,
                             differentiable=diff)

    else:  # sigma: fill the box with a homogeneous medium and recover sigma_t
        from cuda_pt_tpu.scene.builder import MediumSpec

        mid = bld.add_medium(MediumSpec(sigma_a=(0.3, 0.3, 0.3),
                                        sigma_s=(0.4, 0.4, 0.4)))
        bld.cam_medium = mid
        scene = bld.compile()
        theta_true = scene.media.sigma_a[mid] + scene.media.sigma_s[mid]
        theta0 = theta_true * 0.3
        lr = args.lr or 0.04
        md_v = MaxDepthParams(max_depth=3, max_volume=3)

        def apply(s, th):
            # optimize total extinction at fixed single-scattering albedo
            sig_t = jnp.maximum(th, 1e-4)
            alb = 4.0 / 7.0
            m = s.media.replace(
                sigma_a=s.media.sigma_a.at[mid].set(sig_t * (1 - alb)),
                sigma_s=s.media.sigma_s.at[mid].set(sig_t * alb),
            )
            return s.replace(media=m)

        def render(s, seed, spp, diff):
            return vpt.render(s, cam, md_v, spp=spp, seed=seed, use_bvh=False,
                              differentiable=diff)

    # --- ground truth + initial state
    print(json.dumps({"param": args.param, "backend": jax.default_backend(),
                      "res": args.res, "steps": args.steps}), flush=True)
    target = render(apply(scene, theta_true), 1234, max(4 * args.spp, 32), False)
    target.block_until_ready()

    def loss_fn(th, seed):
        img = render(apply(scene, th), seed, args.spp, True)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    opt = optax.adam(lr)
    state = opt.init(theta0)
    theta = theta0

    t0 = time.time()
    for i in range(args.steps):
        l, g = grad_fn(theta, i + 1)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
        if i % 10 == 0 or i == args.steps - 1:
            err = float(jnp.abs((theta - theta_true)[err_rows]).mean())
            print(json.dumps({"step": i, "loss": round(float(l), 6),
                              "param_err": round(err, 5),
                              "elapsed_s": round(time.time() - t0, 1)}),
                  flush=True)

    # --- report: clean renders above the MC noise floor
    spp_eval = max(4 * args.spp, 32)
    img0 = render(apply(scene, theta0), 7, spp_eval, False)
    img1 = render(apply(scene, theta), 7, spp_eval, False)
    d0 = float(jnp.mean(jnp.abs(img0 - target)))
    d1 = float(jnp.mean(jnp.abs(img1 - target)))
    err0 = float(jnp.abs((theta0 - theta_true)[err_rows]).mean())
    err1 = float(jnp.abs((theta - theta_true)[err_rows]).mean())
    for name, img in [("target", target), ("init", img0), ("final", img1)]:
        save_png(os.path.join(args.out, f"{name}.png"),
                 np.asarray(film_mod.to_srgb(img)))
    print(json.dumps({"param_err_init": round(err0, 5),
                      "param_err_final": round(err1, 5),
                      "image_l1_init": round(d0, 5),
                      "image_l1_final": round(d1, 5),
                      "recovered": err1 < 0.5 * err0,
                      "out": args.out}), flush=True)
    return 0 if err1 < 0.5 * err0 else 1


if __name__ == "__main__":
    sys.exit(main())
