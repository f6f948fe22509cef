#!/usr/bin/env python
"""Assemble rendered frame PNGs into an mp4/gif (reference scripts/video.py)."""

import argparse
import glob
import os

ap = argparse.ArgumentParser()
ap.add_argument("--frames-dir", required=True)
ap.add_argument("--out", default="out.mp4")
ap.add_argument("--fps", type=int, default=12)
args = ap.parse_args()

import imageio.v2 as imageio

paths = sorted(glob.glob(os.path.join(args.frames_dir, "*.png")))
if not paths:
    raise SystemExit(f"no PNGs in {args.frames_dir}")
frames = [imageio.imread(p) for p in paths]
if args.out.endswith(".gif"):
    imageio.mimsave(args.out, frames, fps=args.fps)
else:
    imageio.mimsave(args.out, frames, fps=args.fps, codec="libx264", quality=8)
print(f"wrote {args.out} ({len(frames)} frames)")
