#!/usr/bin/env python
"""Measure active-ray fraction per bounce (wavefront compaction economics).

The reference only *plots hardcoded measurements* (scripts/valid_ray_ratio.py
:23-55 — 0.961 → … → 0.056 at bounce 16); this tool actually measures the
decay for any scene by stepping the bounce function manually and counting
live lanes, then prints the table + optional matplotlib plot.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(xml: str, res: int, spp: int, max_depth: int, seed: int = 0):
    import jax.numpy as jnp

    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import rng as prng
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml(xml, override_res=(res, res))
    scene = ps.scene
    cam = ps.camera
    md = MaxDepthParams(max_depth=max_depth, max_diffuse=max_depth,
                        max_specular=max_depth, max_transmit=max_depth)
    use_bvh = scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS
    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)
    fractions = []
    for s_idx in range(spp):
        rng = prng.seed(jnp.uint32(seed + 9781 * s_idx), lane)
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        state = pt.init_state(o, d, rng)
        fr = []
        for _ in range(max_depth):
            state = pt.pt_bounce(scene, md, use_bvh, state)
            fr.append(float(jnp.mean(state.active.astype(jnp.float32))))
        fractions.append(fr)
    import numpy as np

    return np.asarray(fractions).mean(axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xml", required=True)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--plot", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    fr = measure(args.xml, args.res, args.spp, args.max_depth)
    print(json.dumps({"active_fraction_per_bounce": [round(float(x), 4) for x in fr]}))
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(range(1, len(fr) + 1), fr, marker="o")
        plt.xlabel("bounce")
        plt.ylabel("active-ray fraction")
        plt.grid(True)
        plt.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
