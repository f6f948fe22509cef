"""Where does big-scene fused frame time go? (bunny/whiskey/kitchen)

EXP_LEAF_SWEEP showed throughput is INSENSITIVE to node count (kitchen
32k -> 8.4k nodes: identical 0.58 Mrays/s), killing the serial-step model.
This probe separates the remaining candidates:

  - depth sweep (max_depth 1/2/5): if time is ~linear in bounces, the
    per-bounce walk+shade dominates; a big constant term means epilogue /
    raygen / film overheads.
  - count_stats: exact node-iteration + leaf-entry totals per frame ->
    with the frame time this bounds c_leaf (all-in cost per leaf entry).
  - spp=2 vs spp=1 at fixed depth: dispatch/launch amortization.

Writes EXP_DISSECT_BIG.json.   Run: PYTHONPATH=. python scripts/exp_dissect_big.py
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

    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import qmc
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_DISSECT_BIG.json"
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

    def scenes():
        ps = load_xml("/root/reference/scene/xml/bunny.xml",
                      override_res=(W, W))
        yield "bunny", ps.scene, ps.camera
        ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                      override_res=(W, W))
        yield "whiskey", ps.scene, ps.camera
        ks, kc, _ = testscenes.kitchen_stress(width=W, height=W)
        yield "kitchen", ks, kc

    for name, scene, cam in scenes():
        try:
            pack = mk.make_pack(scene)
            ml = int(scene.bvh.max_leaf)
            for depth in (1, 2, 5):
                md = MaxDepthParams(max_depth=depth)
                f = jax.jit(lambda p, s, _md=md: mk.render_pack(
                    p, cam, _md, spp=1, seed=s, max_leaf=ml))
                dt = timing.timeit(f, pack, 1, reps=3)
                emit({"tag": name, "depth": depth, "sec": round(dt, 4)})
            # spp scaling at depth 5
            md5 = MaxDepthParams(max_depth=5)
            f2 = jax.jit(lambda p, s: mk.render_pack(
                p, cam, md5, spp=2, seed=s, max_leaf=ml))
            dt2 = timing.timeit(f2, pack, 1, reps=3)
            emit({"tag": name, "depth": 5, "spp": 2, "sec": round(dt2, 4)})
            # exact in-kernel counters at depth 5 (single tile-batch stats)
            B = cam.width * cam.height
            lane = jax.numpy.arange(B, dtype="int32")
            rng = qmc.make_state("pcg", 0, lane, 0)
            o, d, rng = cam_mod.generate_rays(cam, lane, rng)
            res = jax.jit(lambda p: mk.trace_megakernel(
                p, md5, o, d, rng, max_leaf=ml, count_stats=True)[1])(pack)
            st = jax.device_get(res)
            emit({"tag": name, "node_iters": float(st["node_iters"]),
                  "leaf_entries": float(st["leaf_entries"]),
                  "num_prims": int(scene.geom.num_prims),
                  "num_nodes": int(scene.bvh.num_nodes),
                  "max_leaf": ml})
        except Exception as e:  # noqa: BLE001
            emit({"tag": name, "error": repr(e)[:300]})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
