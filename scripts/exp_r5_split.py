"""On-chip timing of the SPLIT sorted-wavefront driver (round 5).

Split = traverse-only kernel (slim leaf capture: t/gid/u/v) + one XLA
(B, 32) row gather resolving hit attributes + shade kernel (NEE shadow
walk + BSDF in-kernel). EXP_R5_SLIM bounded the win at 2.2x bunny /
1.5x whiskey; this measures the real thing incl. resolve + extra
launch, across tile sizes and the spp-4 bench scale.

Writes EXP_R5_SPLIT.json.  Run: python scripts/exp_r5_split.py
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

    out_path = REPO / "EXP_R5_SPLIT.json"
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
        ps = load_xml(f"/root/reference/scene/xml/bunny.xml",
                      override_res=(W, W))
        yield "bunny", ps.scene, ps.camera, ps.config.md
        ps = load_xml(f"/root/reference/scene/xml/whiskey.xml",
                      override_res=(W, W))
        yield "whiskey", ps.scene, ps.camera, ps.config.md
        sc, cam, _ = testscenes.kitchen_stress(width=W, height=W)
        from cuda_pt_tpu.core.config import MaxDepthParams
        yield "kitchen", sc, cam, MaxDepthParams(max_depth=5)

    for name, scene, cam, md in scenes():
        try:
            pack = mk.make_pack(scene, node_fmt="w8")
            ml = int(scene.bvh.max_leaf)
            B = cam.width * cam.height
            rays1 = timing.host_count(
                lambda s: pt.count_rays(s, cam, md, spp=1, seed=1,
                                        use_bvh=True), scene)
            for spp in (1, 4):
                lane = jnp.tile(jnp.arange(B, dtype=jnp.int32), spp)
                idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), B)
                rng = qmc.make_state("pcg", 0, lane, idx)
                o, d, rng2 = cam_mod.generate_rays(cam, lane, rng)
                cfgs = [(False, 4096)] if spp == 1 else []
                cfgs += [(True, 2048), (True, 4096)] if spp == 1 else [
                    (False, 4096), (True, 4096), (True, 8192)]
                for split, tile in cfgs:
                    fs = jax.jit(
                        lambda p, _s=split, _t=tile:
                        mk.trace_megakernel_swf(
                            p, md, o, d, rng2, max_leaf=ml,
                            key_mode="pos_dir", tile=_t, split=_s))
                    dt = timing.timeit(fs, pack, reps=3)
                    rays = rays1 * spp
                    emit({"tag": name, "spp_scale": spp, "split": split,
                          "tile": tile, "sec": round(dt, 4), "rays": rays,
                          "mrays": round(rays / dt / 1e6, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": name, "error": repr(e)[:300]})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
