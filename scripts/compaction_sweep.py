"""Measure the deep-bounce compaction win (VERDICT r1 #5).

Times the wavefront PT at high depth under three policies (no-sort,
sorted-only, sorted+live-prefix-compacted) and the volumetric PT
plain vs compacted, on the cornell / medium-cbox class of scenes where
RR makes the live fraction collapse (measured 0.93 -> 0.01 over 10
bounces by scripts/analyze_rays.py). The reference motivates this with
scripts/valid_ray_ratio.py:23-55; its compaction boundary is a thrust
partition, ours is a static-shape bucket ladder (models/wavefront.py).

Writes one JSON line per config and a summary dict; use --json FILE to
persist. CPU-safe (forces the backend you ask for via jax.config).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, *args, repeats=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--wf-depth", type=int, default=12)
    ap.add_argument("--vpt-depth", type=int, default=10)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import volume_pt, wavefront
    from cuda_pt_tpu.scene import testscenes

    scene, cam, _ = testscenes.cornell_box(width=args.res, height=args.res)
    md = MaxDepthParams(max_depth=args.wf_depth)

    results = {}

    def wf(sort_rays, compact):
        f = jax.jit(
            lambda s: wavefront.render(
                s, cam, md, spp=args.spp, seed=0,
                sort_rays=sort_rays, compact=compact,
            )
        )
        return _time(f, scene)

    results[f"wf_depth{args.wf_depth}_nosort"] = round(wf(False, False), 3)
    results[f"wf_depth{args.wf_depth}_sorted"] = round(wf(True, False), 3)
    results[f"wf_depth{args.wf_depth}_compact"] = round(wf(True, True), 3)

    from cuda_pt_tpu.scene.xml_parser import load_xml

    ref_xml = "/root/reference/scene/xml/medium-cbox.xml"
    if os.path.exists(ref_xml):
        ps = load_xml(ref_xml, override_res=(args.res, args.res))
        vscene, vcam = ps.scene, ps.camera
    else:  # fall back to the built-in cornell box (surface-only VPT run)
        vscene, vcam, _ = testscenes.cornell_box(width=args.res, height=args.res)
    vmd = MaxDepthParams(max_depth=args.vpt_depth, max_volume=args.vpt_depth)

    def vpt(compact):
        f = jax.jit(
            lambda s: volume_pt.render(
                s, vcam, vmd, spp=args.spp, seed=0, compact=compact,
            )
        )
        return _time(f, vscene)

    results[f"vpt_depth{args.vpt_depth}_plain"] = round(vpt(False), 3)
    results[f"vpt_depth{args.vpt_depth}_compact"] = round(vpt(True), 3)

    for k, v in results.items():
        print(k, v)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
