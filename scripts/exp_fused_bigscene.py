"""Fused megakernel on mesh-scale scenes: whiskey through the in-kernel path.

Whiskey (68k prims, lambertian+dielectric, one area light) sits inside the
fused envelope and fits VMEM whole. The open question is PACKET DIVERGENCE:
with 8192-ray packets the per-tile walk visits nearly every node of a 22.5k
node tree, so the optimal tile is scene-dependent — this sweeps it, with and
without Morton-coherent ray order, and records honest Mrays/s.

Writes EXP_FUSED_BIG.json. Usage: python scripts/exp_fused_bigscene.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    rows = []
    out = REPO / "EXP_FUSED_BIG.json"

    def emit(r):
        rows.append(r)
        print(json.dumps(r), flush=True)
        out.write_text(json.dumps(rows, indent=1))

    warm = timing.warm_readback()
    emit({"backend": jax.default_backend(), "warm_s": round(warm, 1)})

    W = 256
    ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                  override_res=(W, W))
    scene, cam, md = ps.scene, ps.camera, ps.config.md
    assert mk.megakernel_ok(scene, md), "whiskey left the fused envelope"
    pack = mk.make_pack(scene)
    ml = int(scene.bvh.max_leaf)
    spp = 1

    rays = None
    for tile in (512, 1024, 2048, 4096, 8192):
        try:
            mk.TILE = tile
            f = jax.jit(lambda p, s: mk.render_pack(
                p, cam, md, spp=spp, seed=s, max_leaf=ml))
            dt = timing.timeit(f, pack, 1, reps=3)
            if rays is None:
                rays = int(jax.device_get(jax.jit(lambda s: pt.count_rays(
                    s, cam, md, spp=spp, seed=1, use_bvh=True))(scene)))
            emit({"scene": "whiskey", "w": W, "tile": tile,
                  "sec": round(dt, 4), "rays": rays,
                  "mrays": round(rays / dt / 1e6, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"scene": "whiskey", "tile": tile,
                  "error": repr(e)[:200]})
    mk.TILE = 8192

    # composed-path reference on the same scene/res for the verdict
    try:
        sc_pal = scene.replace(traversal="pallas")
        f = jax.jit(lambda s, i: pt.render(sc_pal, cam, md, spp=spp, seed=i,
                                           use_bvh=True))
        dt = timing.timeit(f, sc_pal, 1, reps=3)
        emit({"scene": "whiskey", "config": "composed_pallas",
              "sec": round(dt, 4), "mrays": round(rays / dt / 1e6, 2)})
    except Exception as e:  # noqa: BLE001
        emit({"scene": "whiskey", "config": "composed_pallas",
              "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
