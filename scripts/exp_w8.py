"""On-chip A/B: binary skip walk vs 8-wide ordered stack walk (w8).

For each scene: fused render time at depth 5 (binary vs w8 node format),
a bunny tile sweep, and exact in-kernel visit counters (count_stats) to
quantify the ordered-descent pruning (node iterations should drop ~8x
by construction; LEAF entries drop only through earlier t_best
tightening — that is the pruning payoff).

Usage: python scripts/exp_w8.py   (one TPU child; TUNNEL.md rules)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def emit(r):
    print(json.dumps(r), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import qmc
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    t0 = time.time()
    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    md5 = MaxDepthParams(max_depth=5)

    def scenes():
        ps = load_xml(f"{REF}/cornell-box.xml", override_res=(512, 512))
        yield "cornell", ps.scene, ps.camera, 4
        ps = load_xml(f"{REF}/bunny.xml", override_res=(256, 256))
        yield "bunny", ps.scene, ps.camera, 2
        ps = load_xml(f"{REF}/whiskey.xml", override_res=(256, 256))
        yield "whiskey", ps.scene, ps.camera, 1
        sc, cam, _ = testscenes.kitchen_stress(width=256, height=256)
        yield "kitchen", sc, cam, 1

    REF = "/root/reference/scene/xml"

    def run(tag, scene, cam, spp, node_fmt, tile=None, md=md5, reps=3):
        try:
            kw = {} if node_fmt is None else {"node_fmt": node_fmt}
            pack = mk.make_pack(scene, **kw)
            ml = int(scene.bvh.max_leaf)
            f = jax.jit(lambda p, s: mk.render_pack(
                p, cam, md, spp=spp, seed=s, max_leaf=ml))
            dt = timing.timeit(f, pack, 1, reps=reps)
            rays = timing.host_count(
                lambda s: __import__(
                    "cuda_pt_tpu.models.path_tracer", fromlist=["x"]
                ).count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True),
                scene)
            emit({"tag": tag, "fmt": node_fmt or "auto",
                  "tile": tile or mk.TILE, "sec": round(dt, 4),
                  "rays": int(rays),
                  "mrays": round(rays / dt / 1e6, 2),
                  "max_stack": pack.max_stack,
                  "nodes_kb": round(
                      pack["nodes"].size * 4 / 1024, 1)})
            return dt
        except Exception as e:  # noqa: BLE001
            emit({"tag": tag, "fmt": node_fmt or "auto",
                  "error": repr(e)[:300]})
            return None

    def counters(tag, scene, cam, node_fmt, md=md5):
        try:
            kw = {} if node_fmt is None else {"node_fmt": node_fmt}
            pack = mk.make_pack(scene, **kw)
            ml = int(scene.bvh.max_leaf)
            B = cam.width * cam.height
            lane = jnp.arange(B, dtype=jnp.int32)
            rng = qmc.make_state("pcg", 0, lane, 0)
            o, d, rng = cam_mod.generate_rays(cam, lane, rng)
            st = jax.device_get(jax.jit(lambda p: mk.trace_megakernel(
                p, md, o, d, rng, max_leaf=ml, count_stats=True)[1])(pack))
            emit({"tag": tag, "fmt": node_fmt or "auto",
                  "node_iters": float(st["node_iters"]),
                  "leaf_entries": float(st["leaf_entries"])})
        except Exception as e:  # noqa: BLE001
            emit({"tag": tag, "fmt": node_fmt or "auto",
                  "counters_error": repr(e)[:300]})

    for tag, scene, cam, spp in scenes():
        run(tag, scene, cam, spp, None)
        run(tag, scene, cam, spp, "w8")
        counters(tag, scene, cam, None)
        counters(tag, scene, cam, "w8")

    # bunny tile sweep under w8
    ps = load_xml(f"{REF}/bunny.xml", override_res=(256, 256))
    for tile in (2048, 4096, 8192, 16384):
        old = mk.TILE
        mk.TILE = tile
        try:
            run(f"bunny_t{tile}", ps.scene, ps.camera, 2, "w8", tile=tile)
        finally:
            mk.TILE = old

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
