"""Leaf-size economics of the fused walk on the live chip.

EXP_EXTRACT_AB decomposition: one while-loop iteration costs ~115 ns of
loop overhead + ~150 ns per data-dependent scalar decision, while the
VECTOR work inside (row fetches, masked-sum field reductions, slab and
prim math) is essentially free at tile 8192 (e2 == e0). The walk's cost
is therefore ITERATION COUNT, not work per iteration — so big leaves
(which cut node slots ~linearly and only add free vector work per leaf
entry) should be a large, kernel-unchanged win on bunny/whiskey/kitchen.

Sweeps max_prims_per_leaf, rebuilding the BVH per point, fused kernel,
tile 8192. Writes EXP_LEAF_SWEEP.json.

Run: PYTHONPATH=. python scripts/exp_leaf_sweep.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    from cuda_pt_tpu.core.config import BVHConfig, MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_LEAF_SWEEP.json"
    rows = []

    def emit(r):
        rows.append(r)
        print(json.dumps(r), flush=True)
        out_path.write_text(json.dumps(rows, indent=1))

    t0 = time.time()
    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    W = 256
    md5 = MaxDepthParams(max_depth=5)

    def run(tag, scene, cam, md, spp, **mkw):
        try:
            pack = mk.make_pack(scene, **mkw)
            ml = int(scene.bvh.max_leaf)
            nn = int(scene.bvh.num_nodes)
            f = jax.jit(lambda p, s: mk.render_pack(
                p, cam, md, spp=spp, seed=s, max_leaf=ml))
            tc0 = time.time()
            dt = timing.timeit(f, pack, 1, reps=3)
            compile_s = time.time() - tc0 - 3 * dt
            rays = timing.host_count(
                lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1,
                                        use_bvh=True), scene)
            emit({"tag": tag, "max_leaf": ml, "nodes": nn,
                  "sec": round(dt, 4), "rays": rays,
                  "mrays": round(rays / dt / 1e6, 2),
                  "compile_s": round(compile_s, 1),
                  "node_fmt": pack.node_fmt, "prim_fmt": pack.prim_fmt,
                  "pack_mb": round(sum(
                      int(v.size) * 4 for v in pack.values()) / 2**20, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": tag, "error": repr(e)[:300]})

    # bunny: f32 pack, leaf sweep
    for ml in (4, 8, 16, 32):
        ps = load_xml("/root/reference/scene/xml/bunny.xml",
                      override_res=(W, W),
                      override_accel={"max_prims_per_leaf": ml})
        run(f"bunny_l{ml}", ps.scene, ps.camera, ps.config.md, spp=1,
            node_fmt="f32", attr_fmt="f32", prim_fmt="f32")

    # whiskey: auto (compact) pack
    for ml in (8, 32):
        ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                      override_res=(W, W),
                      override_accel={"max_prims_per_leaf": ml})
        run(f"whiskey_l{ml}", ps.scene, ps.camera, ps.config.md, spp=1)

    # kitchen_stress: auto pack
    for ml in (8, 32):
        ks, kc, _ = testscenes.kitchen_stress(
            width=W, height=W,
            bvh_cfg=BVHConfig(max_prims_per_leaf=ml))
        if mk.megakernel_ok(ks, md5):
            run(f"kitchen_l{ml}", ks, kc, md5, spp=1)
        else:
            emit({"tag": f"kitchen_l{ml}", "error": "outside envelope"})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
