#!/usr/bin/env python
"""Launch the interactive viewer (reference: ./cpt scene.xml)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--xml", required=True)
ap.add_argument("--port", type=int, default=8000)
ap.add_argument("--width", type=int, default=256)
ap.add_argument("--height", type=int, default=256)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from cuda_pt_tpu.viewer.server import serve

serve(args.xml, port=args.port, override_res=(args.width, args.height))
