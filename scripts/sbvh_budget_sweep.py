"""SBVH duplicate-reference budget sweep (ROADMAP #8).

The spatial-split builder accepts a dup budget (extra prim references as a
fraction of the original count). More duplication buys tighter leaves at
the cost of memory and a larger prim-test pool. This measures, per scene
and per budget: emitted refs/nodes, SAH cost, mean per-ray node+prim tests
on camera primaries, and jitted closest-hit wall time.

Run: PYTHONPATH=. python scripts/sbvh_budget_sweep.py [xml ...]
"""

import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from cuda_pt_tpu.accel import bvh_build, traverse  # noqa: E402
from cuda_pt_tpu.core import camera as cam_mod  # noqa: E402
from cuda_pt_tpu.core import rng as prng  # noqa: E402
from cuda_pt_tpu.scene.xml_parser import load_xml  # noqa: E402

BUDGETS = [0.0, 0.1, 0.3, 0.5, 1.0, 2.0]
DEFAULT_XMLS = ["/root/reference/scene/xml/whiskey.xml",
                "/root/reference/scene/xml/bunny.xml"]


def measure(xml_path: str):
    rows = []
    for budget in BUDGETS:
        ps = load_xml(xml_path, override_res=(128, 128))
        cfg = dataclasses.replace(
            ps.config.bvh, use_sbvh=True, dup_budget_frac=budget)
        scene = ps.builder.compile(bvh_cfg=cfg)
        bvh = scene.bvh
        nodes = {
            "node_min": bvh.node_min, "node_max": bvh.node_max,
            "node_skip": bvh.node_skip, "node_base": bvh.node_base,
            "node_count": bvh.node_count,
        }
        import numpy as np

        nodes = {k: np.asarray(v) for k, v in nodes.items()}
        sah = float(bvh_build.sah_cost(nodes))

        B = 128 * 128
        lane = jnp.arange(B, dtype=jnp.int32)
        st = prng.seed(jnp.uint32(3), lane.astype(jnp.uint32))
        o, d, _ = cam_mod.generate_rays(ps.camera, lane, st)
        f = jax.jit(lambda o, d, s=scene: traverse.closest_hit_bvh(
            s.geom, s.bvh, o, d, count_cost=True))
        r = f(o, d)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(o, d))
            ts.append(time.perf_counter() - t0)
        rows.append({
            "budget": budget,
            "refs": int(scene.geom.num_prims),
            "nodes": int(bvh.num_nodes),
            "sah": round(sah, 2),
            "mean_node_tests": round(float(jnp.mean(r["node_cnt"])), 1),
            "mean_prim_tests": round(float(jnp.mean(r["prim_cnt"])), 2),
            "ms": round(min(ts) * 1e3, 1),
        })
        print(json.dumps({"scene": xml_path.split("/")[-1], **rows[-1]}))
    return rows


def main():
    xmls = sys.argv[1:] or DEFAULT_XMLS
    out = {x.split("/")[-1]: measure(x) for x in xmls}
    with open("SBVH_BUDGET.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote SBVH_BUDGET.json")


if __name__ == "__main__":
    main()
