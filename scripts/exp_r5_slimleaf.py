"""On-chip headroom probes for the round-5 traversal plan.

1. ablate="slimleaf": leaf candidates capture only (t, prim, u, v) —
   bounds the win of a traverse/shade kernel split where attributes
   resolve via XLA gathers between phases (EXP_R5_MICRO: 11-16 ns per
   point gather at 262k lanes).
2. spp-4-scale lanes (262k, the official bench shape): per-bounce fixed
   costs (sort glue, kernel launch) amortize 4x vs the spp-1 probes.

Writes EXP_R5_SLIM.json.  Run: python scripts/exp_r5_slimleaf.py
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

    out_path = REPO / "EXP_R5_SLIM.json"
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
            rays1 = timing.host_count(
                lambda s: pt.count_rays(s, cam, md, spp=1, seed=1,
                                        use_bvh=True), scene)

            for spp in (1, 4):
                lane = jnp.tile(jnp.arange(B, dtype=jnp.int32), spp)
                idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), B)
                rng = qmc.make_state("pcg", 0, lane, idx)
                o, d, rng2 = cam_mod.generate_rays(cam, lane, rng)
                for ab in ("", "slimleaf"):
                    fs = jax.jit(lambda p, _ab=ab: mk.trace_megakernel_swf(
                        p, md, o, d, rng2, max_leaf=ml, key_mode="pos_dir",
                        tile=4096, ablate=_ab))
                    dt = timing.timeit(fs, pack, reps=3)
                    rays = rays1 * spp
                    emit({"tag": name, "spp_scale": spp,
                          "ablate": ab or "full", "sec": round(dt, 4),
                          "rays": rays,
                          "mrays": round(rays / dt / 1e6, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": name, "error": repr(e)[:300]})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
