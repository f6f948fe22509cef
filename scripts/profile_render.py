"""Capture a JAX profiler trace of a render (TPU pounce kit).

When the tunnel is healthy, run this to get an xplane trace of the hot
loop — the data that decides which of the queued on-chip A/B experiments
(docs/ROADMAP.md #5) to run first. Works on CPU too (for harness testing),
but the interesting numbers are the on-chip ones: traversal vs shading vs
gather time, HBM stalls, fusion boundaries.

Usage:
  python scripts/profile_render.py [--scene cornell|bunny|whiskey]
      [--impl xla|wide|pallas] [--spp 4] [--width 256] [--cpu]
      [--out /tmp/jax-trace]

View with: tensorboard --logdir <out>  (profile plugin), or
xprof if available.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "bunny", "whiskey"])
    ap.add_argument("--impl", default="xla",
                    choices=["xla", "wide", "pallas", "auto"])
    ap.add_argument("--sampler", default="pcg", choices=["pcg", "sobol"])
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/jax-trace")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import testscenes

    if args.scene == "cornell":
        scene, cam, _ = testscenes.cornell_box(width=args.width,
                                               height=args.width)
    else:
        from cuda_pt_tpu.scene.xml_parser import load_xml

        ps = load_xml(f"/root/reference/scene/xml/{args.scene}.xml",
                      override_res=(args.width, args.width))
        scene, cam = ps.scene, ps.camera

    if args.impl == "wide":
        from cuda_pt_tpu.accel.wide_build import with_wide

        scene = with_wide(scene)
    elif args.impl == "auto":
        from cuda_pt_tpu.accel.autotune import with_tuned_traversal

        scene = with_tuned_traversal(scene, cam)
    elif args.impl != "xla":
        scene = scene.replace(traversal=args.impl)

    md = MaxDepthParams(max_depth=5)
    fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=args.spp, seed=i,
                                        use_bvh=True, sampler=args.sampler))
    print(f"[PROFILE] backend={jax.default_backend()} scene={args.scene} "
          f"impl={args.impl} {args.width}²×{args.spp}spp — compiling…")
    fn(scene, 0).block_until_ready()

    with jax.profiler.trace(args.out):
        t0 = time.perf_counter()
        img = fn(scene, 1)
        img.block_until_ready()
        dt = time.perf_counter() - t0
    print(f"[PROFILE] {dt * 1e3:.1f} ms/frame; trace written to {args.out}")
    print(f"[PROFILE] view: tensorboard --logdir {args.out}")


if __name__ == "__main__":
    main()
