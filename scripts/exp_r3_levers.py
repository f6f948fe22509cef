"""Round-3 on-chip lever experiments (fenced timing, one process).

Quantifies, on the live chip, the cheap throughput levers before any deep
refactor, and the VERDICT r2 item-3 wavefront triple:

  a. megakernel samples_per_pass batching (K=1 vs 4: bigger lane batches)
  b. wavefront sort / no-sort / compacted at depth 5 and 12 (vs megakernel)
  c. wavefront with the Pallas packet traversal
  d. 512² banded render end-to-end through api.Renderer

Writes EXP_R3_LEVERS.json (incrementally); prints one JSON line per row.
Usage: python scripts/exp_r3_levers.py [--cpu] [--width 256]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--out", default=str(REPO / "EXP_R3_LEVERS.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.models import wavefront
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.utils import timing

    warm = timing.warm_readback() if jax.default_backend() != "cpu" else 0.0
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        Path(args.out).write_text(json.dumps(rows, indent=1))

    emit({"backend": jax.default_backend(), "warm_s": round(warm, 1)})

    W = args.width
    scene, cam, _ = testscenes.cornell_box(width=W, height=W)
    scene_pal = scene.replace(traversal="pallas")
    spp = 4

    def run(name, fn, *fargs, rays_fn=None):
        try:
            dt = timing.timeit(fn, *fargs, reps=3)
            row = {"name": name, "sec": round(dt, 4)}
            if rays_fn is not None:
                rays = int(jax.device_get(rays_fn()))
                row.update(rays=rays, mrays=round(rays / dt / 1e6, 3))
            emit(row)
        except Exception as e:  # noqa: BLE001 — fail-soft per row
            emit({"name": name, "error": repr(e)[:200]})

    for md_depth in (5, 12):
        md = MaxDepthParams(max_depth=md_depth)

        def count(s=scene, md=md):
            return jax.jit(lambda s: pt.count_rays(
                s, cam, md, spp=spp, seed=1, use_bvh=True))(s)

        # a. megakernel pallas, K=1 vs K=4 (one big fused pass)
        for K in (1, 4):
            fn = jax.jit(lambda s, i, md=md, K=K: pt.render(
                s, cam, md, spp=spp, seed=i, use_bvh=True,
                samples_per_pass=K))
            run(f"mega_pallas_d{md_depth}_K{K}", fn, scene_pal, 1,
                rays_fn=count)

        # b. wavefront triple (xla traversal — the r2 configuration)
        for label, kw in (
            ("wf_sort", dict(sort_rays=True, compact=False)),
            ("wf_nosort", dict(sort_rays=False, compact=False)),
            ("wf_compact", dict(sort_rays=True, compact=True)),
            ("wf_compact_nosort", dict(sort_rays=False, compact=True)),
        ):
            fn = jax.jit(lambda s, i, md=md, kw=kw: wavefront.render(
                s, cam, md, spp=spp, seed=i, use_bvh=True, **kw))
            run(f"{label}_xla_d{md_depth}", fn, scene, 1, rays_fn=count)

        # c. wavefront + pallas packet traversal
        for label, kw in (
            ("wf_sort", dict(sort_rays=True, compact=False)),
            ("wf_compact", dict(sort_rays=True, compact=True)),
        ):
            fn = jax.jit(lambda s, i, md=md, kw=kw: wavefront.render(
                s, cam, md, spp=spp, seed=i, use_bvh=True, **kw))
            run(f"{label}_pallas_d{md_depth}", fn, scene_pal, 1, rays_fn=count)

    # d. 512² end-to-end banded render through the API (dodges the 60 s
    # call window by construction)
    try:
        import time as _time

        from cuda_pt_tpu.api import Renderer
        from cuda_pt_tpu.core.config import RenderingConfig
        from cuda_pt_tpu.scene.xml_parser import ParsedScene

        s512, c512, _ = testscenes.cornell_box(width=512, height=512)
        ps = ParsedScene(s512.replace(traversal="pallas"), c512,
                         RenderingConfig(width=512, height=512), None)
        r = Renderer(ps)
        r.render_raw()  # compile
        t0 = _time.perf_counter()
        r.render(4)
        dt = _time.perf_counter() - t0
        bands = (-(-(512 * 512) // r.max_lanes_per_call)
                 if r.max_lanes_per_call else 1)
        emit({"name": "api_render_512_banded_pallas_4spp",
              "sec": round(dt, 2), "bands": bands,
              "sec_per_spp": round(dt / 4, 2)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "api_render_512_banded_pallas_4spp",
              "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
