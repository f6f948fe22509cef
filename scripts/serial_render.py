#!/usr/bin/env python
"""Serial / animation rendering driver.

Replaces the reference's scripts/serial_render.py: renders frame sequences
by (a) swapping the grid-volume density/emission sources between frames
(volume animation, reference :59-79, 207-225) or (b) sweeping a
time-of-flight window across [t_min, t_max] (ToF video, reference :227-240).
Writes one PNG per finished frame so a crashed run resumes at frame
granularity (reference :188-201), and skips frames whose PNG already exists.

Usage:
  python scripts/serial_render.py --xml scene.xml --mode tof \
      --frames 48 --tof-start 2 --tof-end 14 --tof-width 0.5 --spp 32
  python scripts/serial_render.py --xml scene.xml --mode volume \
      --density-pattern '../volume/density-{:02d}.nvdb' --frames 10
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xml", required=True)
    ap.add_argument("--mode", choices=["tof", "volume", "static"], default="tof")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--out-dir", default="frames")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tof-start", type=float, default=0.0)
    ap.add_argument("--tof-end", type=float, default=10.0)
    ap.add_argument("--tof-width", type=float, default=0.5)
    ap.add_argument("--density-pattern", default="",
                    help="per-frame grid density path, e.g. 'density-{:02d}.nvdb'")
    ap.add_argument("--emission-pattern", default="")
    ap.add_argument("--sampler", choices=["pcg", "sobol"], default="pcg")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cuda_pt_tpu.api import Renderer
    from cuda_pt_tpu.media.nvdb import load_dense
    from cuda_pt_tpu.scene.xml_parser import load_xml

    os.makedirs(args.out_dir, exist_ok=True)
    res = (args.width, args.height) if args.width and args.height else None
    ps = load_xml(args.xml, override_res=res)
    base_dir = os.path.dirname(os.path.abspath(args.xml))

    for frame in range(args.frames):
        out_png = os.path.join(args.out_dir, f"frame_{frame:04d}.png")
        if os.path.exists(out_png):
            print(f"[SERIAL] frame {frame} exists, skipping (resume)")
            continue
        t0 = time.perf_counter()

        if args.mode == "tof":
            span = (args.tof_end - args.tof_start - args.tof_width)
            t_lo = args.tof_start + span * frame / max(args.frames - 1, 1)
            md = dataclasses.replace(
                ps.config.md, min_time=t_lo, max_time=t_lo + args.tof_width
            )
            config = dataclasses.replace(ps.config, md=md)
            ps_frame = type(ps)(ps.scene, ps.camera, config, ps.builder)
        elif args.mode == "volume" and args.density_pattern:
            # reload the grid for this frame and splice it into the scene
            dpath = os.path.normpath(
                os.path.join(base_dir, args.density_pattern.format(frame))
            )
            dens, bmin, bmax = load_dense(dpath)
            emis = None
            if args.emission_pattern:
                epath = os.path.normpath(
                    os.path.join(base_dir, args.emission_pattern.format(frame))
                )
                emis, _, _ = load_dense(epath)
            g = ps.scene.grids
            import jax.numpy as jnp

            dz, dy, dx = dens.shape
            pad = np.zeros(np.asarray(g.density.shape[1:]), np.float32)
            pad[:dz, :dy, :dx] = dens[: pad.shape[0], : pad.shape[1], : pad.shape[2]]
            new_density = g.density.at[0].set(jnp.asarray(pad))
            grids = g.replace(
                density=new_density,
                majorant=g.majorant.at[0].set(float(pad.max())),
                avg_density=g.avg_density.at[0].set(float(pad.mean())),
            )
            if emis is not None:
                pe = np.zeros_like(pad)
                ez, ey, ex = emis.shape
                pe[:ez, :ey, :ex] = emis[: pe.shape[0], : pe.shape[1], : pe.shape[2]]
                grids = grids.replace(emission=grids.emission.at[0].set(jnp.asarray(pe)))
            ps_frame = type(ps)(
                ps.scene.replace(grids=grids), ps.camera, ps.config, ps.builder
            )
        else:
            ps_frame = ps

        r = Renderer(ps_frame, seed_offset=args.seed + frame * 4201,
                     sampler=args.sampler)
        r.render(spp=args.spp)
        r.save(out_png)
        r.save_checkpoint(os.path.join(args.out_dir, f"frame_{frame:04d}.npz"))
        print(json.dumps({
            "frame": frame,
            "spp": args.spp,
            "sec": round(time.perf_counter() - t0, 2),
            "out": out_png,
        }))
    print(f"[SERIAL] done: {args.frames} frames in {args.out_dir}")


if __name__ == "__main__":
    main()
