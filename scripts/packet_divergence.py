"""Measure packet-traversal divergence economics (VERDICT r1 weak #3).

The Pallas packet kernel descends into a BVH node when ANY of its TILE
(=512) rays hits the node's box, so an incoherent packet devolves toward a
full-tree walk. The whole sort-before-trace design (wavefront Morton keys,
cuda_pt_tpu/ops/morton.py) rests on this being worth paying for — this
script MEASURES it instead of assuming it.

Work metrics (algorithmic, hardware-independent — identical in interpret
mode and compiled on TPU):

  packet:  sum over ray tiles of node fetches (``tile_iters`` from
           ops/pallas/traverse_kernel.py); every fetch slab-tests one node
           against all TILE lanes, so lane-work = fetches * TILE.
  per-ray: sum over rays of per-lane node tests from the XLA gather loop
           (accel/traverse.py count_cost) — the alternative cost model.

Ray populations: jittered camera primaries (coherent by construction) and
one-bounce cosine-scattered secondaries, each traced in three lane orders:
scanline, uniformly shuffled (worst case), and Morton-sorted-after-shuffle
(what the wavefront sorter restores).

Usage: python scripts/packet_divergence.py [--scene cornell|whiskey|both]
       [--res 64] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.accel.traverse import closest_hit_bvh
from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core import sampling
from cuda_pt_tpu.core.math import normalize, to_world
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops import morton
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

TILE = tk.TILE


def make_rays(scene, cam, seed: int):
    """(primary o/d, secondary o/d at the primary hit points)."""
    B = int(cam.width) * int(cam.height)
    state = prng.seed(jnp.uint32(seed), jnp.arange(B, dtype=jnp.uint32))
    o, d, state = cam_mod.generate_rays(cam, jnp.arange(B, dtype=jnp.int32), state)
    hit = closest_hit_bvh(scene.geom, scene.bvh, o, d,
                          max_leaf=int(scene.bvh.max_leaf))
    prim = jnp.clip(hit["prim"], 0, scene.geom.num_prims - 1)
    t = jnp.where(hit["hit"], hit["t"], 1.0)
    p_hit = o + t[:, None] * d
    inter = isect.surface_interaction(scene.geom, prim, hit["b1"], hit["b2"],
                                      p_hit, d)
    n = inter["n_s"]
    n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0, -n, n)
    u, state = prng.next2d(state)
    local, _ = sampling.cosine_hemisphere(u)
    d2 = normalize(to_world(local, n))
    o2 = p_hit + 1e-3 * n
    # lanes that missed: re-aim into the scene so every lane traces
    o2 = jnp.where(hit["hit"][:, None], o2, o)
    d2 = jnp.where(hit["hit"][:, None], d2, d)
    return (o, d), (o2, d2)


def packet_fetches(forest, o, d, order, tile=None):
    res = tk.traverse_forest(forest, o[order], d[order], interpret=True,
                             count_iters=True, tile=tile or tk.TILE)
    return int(jnp.sum(res["tile_iters"]))


def perlane_tests(scene, o, d):
    """(total per-lane node tests, lockstep while-loop iterations).

    The XLA gather loop is also lockstep across its whole batch: it runs
    until EVERY lane terminates, and every iteration gathers node data for
    every lane — so its true work is max(per-lane visits) * B gathers, not
    sum(per-lane visits)."""
    res = closest_hit_bvh(scene.geom, scene.bvh, o, d,
                          max_leaf=int(scene.bvh.max_leaf), count_cost=True)
    return int(jnp.sum(res["node_cnt"])), int(jnp.max(res["node_cnt"]))


def measure(name, scene, cam, forest, rays, rng: np.random.Generator):
    o, d = rays
    B = o.shape[0]
    scan = jnp.arange(B)
    shuf = jnp.asarray(rng.permutation(B))
    lo = scene.bvh.node_min[0]
    hi = scene.bvh.node_max[0]
    code = morton.morton3d(o[shuf], lo, hi)
    msort = shuf[jnp.argsort(code)]
    # direction-aware key: 3-bit direction octant above the origin Morton —
    # packets then agree on BOTH footprint and heading
    octant = ((d[shuf, 0] > 0).astype(jnp.uint32) << 2 |
              (d[shuf, 1] > 0).astype(jnp.uint32) << 1 |
              (d[shuf, 2] > 0).astype(jnp.uint32))
    # 3-bit octant + top 29 Morton bits fits uint32 (no x64 needed)
    code_od = (octant << 29) | (code >> 1)
    msort_od = shuf[jnp.argsort(code_od)]

    fetches = {k: packet_fetches(forest, o, d, idx)
               for k, idx in (("scanline", scan), ("shuffled", shuf),
                              ("morton", msort), ("morton_octant", msort_od))}
    # packet-size lever at the best ordering
    fetches["morton_octant_tile256"] = packet_fetches(forest, o, d, msort_od,
                                                      tile=256)
    fetches["morton_octant_tile128"] = packet_fetches(forest, o, d, msort_od,
                                                      tile=128)
    lane_tests, loop_iters = perlane_tests(scene, o, d)
    row = {
        "case": name,
        "rays": int(B),
        "tiles": -(-int(B) // TILE),
        "packet_node_fetches": fetches,
        "packet_lane_work": {
            k: v * (128 if k.endswith("tile128") else
                    256 if k.endswith("tile256") else TILE)
            for k, v in fetches.items()
        },
        "xla_perlane_node_tests": lane_tests,
        "xla_loop_iters": loop_iters,
        "xla_lane_gather_work": loop_iters * int(B),
        "shuffle_blowup": round(fetches["shuffled"] / max(fetches["scanline"], 1), 2),
        "morton_recovery": round(fetches["morton"] / max(fetches["shuffled"], 1), 3),
    }
    print(json.dumps(row), flush=True)
    return row


def load_scene(which: str, res: int):
    if which == "cornell":
        from cuda_pt_tpu.scene import testscenes

        scene, cam, _ = testscenes.cornell_box(width=res, height=res)
        chunk = 65536
    else:
        from cuda_pt_tpu.scene.xml_parser import load_xml

        ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                      override_res=(res, res))
        scene, cam = ps.scene, ps.camera
        chunk = 32768
    forest = tk.build_forest(scene.geom, chunk_prims=chunk)
    return scene, cam, forest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="both",
                    choices=["cornell", "whiskey", "both"])
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    names = ["cornell", "whiskey"] if args.scene == "both" else [args.scene]
    rng = np.random.default_rng(7)
    rows = []
    for nm in names:
        scene, cam, forest = load_scene(nm, args.res)
        primary, secondary = make_rays(scene, cam, seed=3)
        rows.append(measure(f"{nm}_primary", scene, cam, forest, primary, rng))
        rows.append(measure(f"{nm}_secondary", scene, cam, forest, secondary, rng))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
