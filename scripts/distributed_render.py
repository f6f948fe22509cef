#!/usr/bin/env python
"""Distributed rendering driver — the JAX-native ddp_render.py.

Replaces the reference's torchrun + NCCL flow (scripts/ddp_render.py): one
process per *host* (JAX SPMD), a (sp, dp) device mesh instead of per-GPU
ranks, psum image reduction over ICI instead of NCCL all_reduce, and
periodic PNG/metric dumps instead of TensorBoard (gated on availability).

Usage:
  python scripts/distributed_render.py --xml scene.xml --spp 256 --sp 2
  # multi-host: launched once per host with jax.distributed env configured
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xml", required=True, help="scene xml path")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--sp", type=int, default=1, help="sample-parallel axis size")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="render.png")
    ap.add_argument("--report-interval", type=int, default=16)
    ap.add_argument("--sampler", choices=["pcg", "sobol"], default="pcg",
                    help="sobol = Owen-scrambled QMC (lower equal-spp error)")
    ap.add_argument("--denoise", action="store_true",
                    help="variance-guided à-trous denoise of the final image")
    ap.add_argument("--tensorboard", default="",
                    help="log dir for TensorBoard image/variance curves "
                         "(reference ddp_render.py:59-67,163-211 parity)")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() first")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug; overrides TPU plugin)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        jax.distributed.initialize()

    from cuda_pt_tpu.core import film as film_mod
    from cuda_pt_tpu.parallel import distributed as dist
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils.image import save_png

    res = (args.width, args.height) if args.width and args.height else None
    ps = load_xml(args.xml, override_res=res)
    mesh = dist.make_mesh(sp=args.sp)
    print(f"[DIST] devices={len(jax.devices())} mesh=sp{args.sp}x"
          f"dp{mesh.shape['dp']} scene prims={ps.scene.geom.num_prims}")

    step = jax.jit(
        lambda scene, base: dist.render_distributed(
            scene, ps.camera, ps.config.md, mesh.shape["sp"], mesh,
            seed=args.seed, sampler=args.sampler, sample_base0=base,
        )
    )

    tb = None
    if args.tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tensorboard)

    film = film_mod.make_film(ps.camera.height, ps.camera.width)
    t0 = time.perf_counter()
    passes = max(args.spp // max(args.sp, 1), 1)
    for i in range(passes):
        img = step(ps.scene, i * mesh.shape["sp"])
        film = film_mod.accumulate(film, img)
        if (i + 1) % args.report_interval == 0 or i == passes - 1:
            dt = time.perf_counter() - t0
            var = float(film_mod.variance(film).mean())
            print(json.dumps({
                "pass": i + 1,
                "elapsed_s": round(dt, 2),
                "ms_per_pass": round(dt / (i + 1) * 1e3, 1),
                "mean_variance": var,
            }))
            save_png(args.out, film_mod.export_numpy(film, ps.config.gamma))
            if tb is not None:
                import numpy as np

                tb.add_scalar("render/mean_variance", var, i + 1)
                tb.add_scalar("render/ms_per_pass", dt / (i + 1) * 1e3, i + 1)
                tb.add_image(
                    "render/image",
                    np.transpose(
                        film_mod.export_numpy(film, ps.config.gamma), (2, 0, 1)
                    ),
                    i + 1,
                )
    if tb is not None:
        tb.close()
    if args.denoise:
        import jax.numpy as jnp

        from cuda_pt_tpu.models import debug_renderers
        from cuda_pt_tpu.models import denoise as dn

        from cuda_pt_tpu.models import path_tracer as pt

        aovs = debug_renderers.render_aovs(
            ps.scene, ps.camera, spp=4, seed=args.seed + 7919,
            use_bvh=ps.scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS)
        var = film_mod.variance(film) / jnp.maximum(film.count, 1)
        img = dn.atrous_denoise(film.mean, aovs, variance=var)
        import numpy as np

        out_dn = args.out.rsplit(".", 1)[0] + "_denoised.png"
        save_png(out_dn, (np.asarray(film_mod.to_srgb(img, ps.config.gamma))
                          * 255).astype("uint8"))
        print(f"[DIST] wrote {out_dn}")
    print(f"[DIST] wrote {args.out}")


if __name__ == "__main__":
    main()
