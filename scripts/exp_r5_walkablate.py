"""On-chip walk-cost decomposition via kernel ablations (round 5).

Three runs per scene: full, ablate="noshadow" (any-hit walks skipped),
ablate="nowalk" (closest walks return a fixed synthetic hit too).
full - noshadow = shadow-walk share; noshadow - nowalk = closest-walk
share; nowalk ~ shading + driver floor. Plus a fine tile sweep
(1024/2048/4096) under the sorted driver — sorting makes SMALL tiles
more coherent, so the optimum may move down.

Writes EXP_R5_ABLATE.json.  Run: python scripts/exp_r5_walkablate.py
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
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_R5_ABLATE.json"
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

    for name in ("bunny", "whiskey"):
        try:
            ps = load_xml(f"/root/reference/scene/xml/{name}.xml",
                          override_res=(W, W))
            scene, cam, md = ps.scene, ps.camera, ps.config.md
            pack = mk.make_pack(scene, node_fmt="w8")
            ml = int(scene.bvh.max_leaf)
            B = cam.width * cam.height
            lane = jnp.arange(B, dtype=jnp.int32)
            rng = qmc.make_state("pcg", 0, lane, 0)
            o, d, rng2 = cam_mod.generate_rays(cam, lane, rng)
            rays = timing.host_count(
                lambda s: pt.count_rays(s, cam, md, spp=1, seed=1,
                                        use_bvh=True), scene)

            # decomposition at the current best config (swf pos_dir, 4096)
            for ab in ("", "noshadow", "nowalk"):
                fs = jax.jit(lambda p, _ab=ab: mk.trace_megakernel_swf(
                    p, md, o, d, rng2, max_leaf=ml, key_mode="pos_dir",
                    tile=4096, ablate=_ab))
                dt = timing.timeit(fs, pack, reps=3)
                emit({"tag": name, "mode": "swf_pos_dir", "tile": 4096,
                      "ablate": ab or "full", "sec": round(dt, 4),
                      "rays": rays, "mrays": round(rays / dt / 1e6, 2)})

            # fine tile sweep, sorted driver
            for tile in (1024, 2048):
                fs = jax.jit(lambda p, _t=tile: mk.trace_megakernel_swf(
                    p, md, o, d, rng2, max_leaf=ml, key_mode="pos_dir",
                    tile=_t))
                dt = timing.timeit(fs, pack, reps=3)
                emit({"tag": name, "mode": "swf_pos_dir", "tile": tile,
                      "ablate": "full", "sec": round(dt, 4), "rays": rays,
                      "mrays": round(rays / dt / 1e6, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": name, "error": repr(e)[:300]})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
