"""On-chip A/B: treelet-keyed swf sorting (round 5) on big-scene trees.

The w8 walk is tile-shared, so its cost is the UNION of the tile's rays'
subtree visits. swf_sort_key key_mode="tl_pos"/"tl_oct" groups rays by
the nearest-entered treelet-root AABB (<=64 frontier boxes extracted at
pack time, megakernel.treelet_boxes_w8) so a tile's union collapses to a
few subtrees and per-lane t_best culling fires early. This measures the
key family x tile size against the round-4 best (w8 + mega / swf
pos_dir) on bunny / whiskey, with cornell as a small-scene control.

Writes EXP_R5_COHERENCE.json.  Run: python scripts/exp_r5_coherence.py
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
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_R5_COHERENCE.json"
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
        yield "bunny", ps.scene, ps.camera, ps.config.md, (4096, 8192)
        ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                      override_res=(W, W))
        yield "whiskey", ps.scene, ps.camera, ps.config.md, (4096, 8192)
        scene, cam, _ = testscenes.cornell_box(width=W, height=W)
        from cuda_pt_tpu.core.config import MaxDepthParams
        yield "cornell", scene, cam, MaxDepthParams(max_depth=5), (8192,)

    for name, scene, cam, md, tiles in scenes():
        try:
            pack = mk.make_pack(scene, node_fmt="w8")
            ml = int(scene.bvh.max_leaf)
            B = cam.width * cam.height
            lane = jnp.arange(B, dtype=jnp.int32)
            rng = qmc.make_state("pcg", 0, lane, 0)
            o, d, rng2 = cam_mod.generate_rays(cam, lane, rng)
            rays = timing.host_count(
                lambda s: pt.count_rays(s, cam, md, spp=1, seed=1,
                                        use_bvh=True), scene)

            dt0 = None
            for tile in tiles:
                f0 = jax.jit(lambda p, _t=tile: mk.trace_megakernel(
                    p, md, o, d, rng2, max_leaf=ml, tile=_t))
                dt = timing.timeit(f0, pack, reps=3)
                if dt0 is None or dt < dt0:
                    dt0 = dt
                emit({"tag": name, "mode": "mega_w8", "tile": tile,
                      "sec": round(dt, 4), "rays": rays,
                      "mrays": round(rays / dt / 1e6, 2)})

            for km in ("none", "pos_dir", "tl_pos", "tl_oct"):
                for tile in tiles:
                    fs = jax.jit(
                        lambda p, _km=km, _t=tile: mk.trace_megakernel_swf(
                            p, md, o, d, rng2, max_leaf=ml, key_mode=_km,
                            tile=_t))
                    dts = timing.timeit(fs, pack, reps=3)
                    emit({"tag": name, "mode": f"swf_{km}", "tile": tile,
                          "sec": round(dts, 4), "rays": rays,
                          "mrays": round(rays / dts / 1e6, 2),
                          "speedup_vs_mega": round(dt0 / dts, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": name, "error": repr(e)[:300]})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
