#!/usr/bin/env python
"""Print a scene summary + BVH metrics (reference Scene::print(),
src/impl/scene.cu:1301-1356, and TreeMetrics dump)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--xml", required=True)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from cuda_pt_tpu.accel import bvh_build
from cuda_pt_tpu.scene.xml_parser import load_xml

ps = load_xml(args.xml, override_res=(8, 8))
s = ps.scene
nodes = {
    "node_min": np.asarray(s.bvh.node_min),
    "node_max": np.asarray(s.bvh.node_max),
    "node_skip": np.asarray(s.bvh.node_skip),
    "node_base": np.asarray(s.bvh.node_base),
    "node_count": np.asarray(s.bvh.node_count),
}
info = {
    "scene": os.path.basename(args.xml),
    "renderer": ps.config.renderer.value,
    "spp": ps.config.spp,
    "film": [ps.config.width, ps.config.height],
    "num_prims": int(s.geom.num_prims),
    "num_objects": int(s.objects.bsdf_id.shape[0]),
    "num_bsdfs": int(s.bsdfs.btype.shape[0]),
    "present_bsdf_types": list(s.present_bsdfs),
    "num_emitters": int(s.num_emitters),
    "has_envmap": bool(int(s.env_emitter) > 0),
    "env_importance_tables": bool(s.env_importance.enabled),
    "num_media": int(s.media.mtype.shape[0]),
    "num_textures": int(s.textures.offset.shape[0]),
    "max_depths": {
        "total": ps.config.md.max_depth,
        "diffuse": ps.config.md.max_diffuse,
        "specular": ps.config.md.max_specular,
        "transmit": ps.config.md.max_transmit,
    },
    "bvh": bvh_build.tree_metrics(nodes),
}
print(json.dumps(info, indent=2))
