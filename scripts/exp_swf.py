"""On-chip A/B: sorted-wavefront fused (swf) vs fused megakernel.

EXP_DISSECT_BIG showed incoherent bounce walks cost ~4x primary walks
(per-tile BVH-visit unions). swf re-sorts the ray population between
bounces (swf_sort_key) and runs the SAME bounce_body one bounce per
pallas_call. Per-lane radiance is bit-identical (tests/test_swf.py).

Writes EXP_SWF.json.  Run: PYTHONPATH=. python scripts/exp_swf.py
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
    import jax.numpy as jnp

    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import qmc
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_SWF.json"
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
        scene, cam, _ = testscenes.cornell_box(width=W, height=W)
        yield "cornell", scene, cam, MaxDepthParams(max_depth=5)
        ps = load_xml("/root/reference/scene/xml/bunny.xml",
                      override_res=(W, W))
        yield "bunny", ps.scene, ps.camera, ps.config.md
        ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                      override_res=(W, W))
        yield "whiskey", ps.scene, ps.camera, ps.config.md

    for name, scene, cam, md in scenes():
        try:
            pack = mk.make_pack(scene)
            ml = int(scene.bvh.max_leaf)
            B = cam.width * cam.height
            lane = jnp.arange(B, dtype=jnp.int32)
            rng = qmc.make_state("pcg", 0, lane, 0)
            o, d, rng2 = cam_mod.generate_rays(cam, lane, rng)
            rays = timing.host_count(
                lambda s: pt.count_rays(s, cam, md, spp=1, seed=1,
                                        use_bvh=True), scene)

            f0 = jax.jit(lambda p: mk.trace_megakernel(
                p, md, o, d, rng2, max_leaf=ml))
            dt0 = timing.timeit(f0, pack, reps=3)
            emit({"tag": name, "mode": "mega", "sec": round(dt0, 4),
                  "rays": rays, "mrays": round(rays / dt0 / 1e6, 2)})

            for km in ("none", "dir_pos", "pos_dir"):
                fs = jax.jit(lambda p, _km=km: mk.trace_megakernel_swf(
                    p, md, o, d, rng2, max_leaf=ml, key_mode=_km))
                dts = timing.timeit(fs, pack, reps=3)
                emit({"tag": name, "mode": f"swf_{km}",
                      "sec": round(dts, 4), "rays": rays,
                      "mrays": round(rays / dts / 1e6, 2),
                      "speedup_vs_mega": round(dt0 / dts, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": name, "error": repr(e)[:300]})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
