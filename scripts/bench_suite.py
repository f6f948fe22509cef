"""Full per-scene benchmark table → BENCH_DETAILS.json (+ BASELINE.md rows).

Scenes (BASELINE.json targets; VERDICT r1 asked for more than cornell):
  cornell_mega      512² megakernel PT (PR1 config)
  cornell_wf        512² wavefront PT with compaction (vs no-sort twin)
  bunny             bunny.xml — real mesh BVH traversal
  whiskey           whiskey.xml — SBVH-scale mesh stress (assets in checkout)
  cornell_vpt       cornell + homogeneous scattering medium (volumetric PT)

Each row reports honest Mrays/s (measured segments + shadow rays / wall
time), the backend it ran on, and the per-frame wall clock. Every
measurement runs in a watchdogged subprocess so a wedged TPU tunnel can't
hang the suite (memory: tpu-tunnel-flaky).

Usage: python scripts/bench_suite.py [--backend cpu|default] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_XML = "/root/reference/scene/xml"

_CHILD = r"""
import json, os, sys, time
backend, name, quick = sys.argv[1], sys.argv[2], sys.argv[3] == "1"
import jax
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes

pt.TRAVERSAL_IMPL = os.environ.get("BENCH_IMPL", "xla")
REF_XML = %r

def cornell(w):
    scene, cam, _ = testscenes.cornell_box(width=w, height=w)
    return scene, cam

def from_xml(fname, res):
    from cuda_pt_tpu.scene.xml_parser import load_xml
    ps = load_xml(os.path.join(REF_XML, fname), override_res=(res, res))
    return ps.scene, ps.camera

def cornell_medium(w):
    from cuda_pt_tpu.scene.builder import MediumSpec
    from cuda_pt_tpu.scene import types as T
    scene, cam, b = testscenes.cornell_box(width=w, height=w)
    import numpy as np
    b.add_medium(MediumSpec(mtype=T.MEDIUM_HOMOGENEOUS,
                            sigma_a=(0.05, 0.05, 0.05),
                            sigma_s=(0.25, 0.25, 0.25)))
    scene = b.compile()
    scene = scene.replace(cam_medium=jnp.int32(0))
    return scene, cam

res_big = 128 if backend == "cpu" or quick else 512
# spp=4 on accelerators: the live tunnel kills single calls past ~60 s of
# execution (ONCHIP_PROBE.json — 512²×16spp died both rounds, 512²×4spp at
# 22 s/call is reliable), and measured Mrays/s is flat in batch size anyway
spp = 2 if backend == "cpu" or quick else 4
maxd = 5
md = MaxDepthParams(max_depth=maxd)

if name == "cornell_mega":
    scene, cam = cornell(res_big)
    fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=spp, seed=i, use_bvh=True))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name == "cornell_fused":
    # the fused in-kernel Pallas megakernel (ops/pallas/megakernel.py)
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    if backend == "cpu" or jax.default_backend() == "cpu":
        mk.INTERPRET = True
    scene, cam = cornell(res_big)
    pack = mk.make_pack(scene)
    ml = int(scene.bvh.max_leaf)
    fn = jax.jit(lambda s, i, pack=pack: mk.render_pack(
        pack, cam, md, spp=spp, seed=i, max_leaf=ml))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name == "cornell_wf":
    from cuda_pt_tpu.models import wavefront
    scene, cam = cornell(res_big)
    fn = jax.jit(lambda s, i: wavefront.render(
        s, cam, md, spp=spp, seed=i, use_bvh=True, compact=True))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name == "cornell_wf_nosort":
    from cuda_pt_tpu.models import wavefront
    scene, cam = cornell(res_big)
    fn = jax.jit(lambda s, i: wavefront.render(
        s, cam, md, spp=spp, seed=i, use_bvh=True, sort_rays=False, compact=False))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name in ("bunny_fused", "whiskey_fused", "kitchen_fused",
              "vader_fused"):
    # mesh/kitchen-class scenes through the fused in-kernel megakernel.
    # Round 4 compact packs (bf16 nodes/attrs + t9 prims) brought whiskey
    # from a ~10.7 MB faulting pack to ~5.3 MB; kitchen rides the deferred
    # -texture + envmap-epilogue envelope.
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    if backend == "cpu" or jax.default_backend() == "cpu":
        print(json.dumps({"name": name, "backend": "skipped_cpu",
                          "mrays_per_s": 0.0}))
        raise SystemExit(0)
    res = min(res_big, 256)
    if name == "kitchen_fused":
        scene, cam, _ = testscenes.kitchen_stress(width=res, height=res)
    else:
        base = name.removesuffix("_fused")
        scene, cam = from_xml(base + ".xml", res)
    if not mk.megakernel_ok(scene, md):
        print(json.dumps({"name": name, "backend": "outside_envelope",
                          "mrays_per_s": 0.0}))
        raise SystemExit(0)
    pack = mk.make_pack(scene)
    ml = int(scene.bvh.max_leaf)
    fn = jax.jit(lambda s, i, pack=pack: mk.render_pack(
        pack, cam, md, spp=spp, seed=i, max_leaf=ml))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name in ("bunny", "whiskey", "vader", "bunny_wide", "whiskey_wide"):
    base = name.removesuffix("_wide")
    res = min(res_big, 256) if base != "bunny" else res_big
    scene, cam = from_xml(base + ".xml", res)
    if name.endswith("_wide"):
        from cuda_pt_tpu.accel.wide_build import with_wide
        scene = with_wide(scene)
    fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=spp, seed=i, use_bvh=True))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name == "whiskey_pallas":
    # VERDICT r2 item 3: whiskey through the Pallas streaming-forest path.
    # Compiled-only (Mosaic): on the CPU backend this would be interpret
    # mode at minutes/frame, so the row is TPU-gated.
    if backend == "cpu" or jax.default_backend() == "cpu":
        print(json.dumps({"name": name, "backend": "skipped_cpu",
                          "mrays_per_s": 0.0}))
        raise SystemExit(0)
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
    scene, cam = from_xml("whiskey.xml", res_big)
    scene = scene.replace(
        forest=tk.build_forest(scene.geom, chunk_prims=32768),
        traversal="pallas")
    fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=spp, seed=i, use_bvh=True))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
elif name == "cornell_grad":
    # BASELINE.json headline is "Mrays/s/chip fwd AND fwd+bwd": one
    # value_and_grad step through the differentiable estimator w.r.t. the
    # scene tables (MSE vs a fixed target). Rays counted are the forward
    # segments+shadow rays; the wall clock includes the backward pass, so
    # the row reports honest fwd+bwd throughput.
    from cuda_pt_tpu.parallel.distributed import diff_params
    scene, cam = cornell(min(res_big, 256))
    target = jax.jit(lambda s: pt.render(s, cam, md, spp=spp, seed=0,
                                         use_bvh=True))(scene)
    target = jax.lax.stop_gradient(target)

    def apply_params(s, p):
        return s.replace(
            bsdfs=s.bsdfs.replace(k_d=p["k_d"], k_s=p["k_s"], k_g=p["k_g"],
                                  eta=p["eta"], k=p["k"],
                                  params=p["bsdf_params"]),
            emitters=s.emitters.replace(emission=p["emission"],
                                        scaler=p["scaler"]),
            media=s.media.replace(sigma_a=p["sigma_a"], sigma_s=p["sigma_s"],
                                  scale=p["med_scale"]),
        )

    def loss(p, s, i):
        img = pt.render(apply_params(s, p), cam, md, spp=spp, seed=i,
                        use_bvh=True, differentiable=True)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    params = diff_params(scene)
    fn = jax.jit(lambda s, i: grad_fn(params, s, i)[0])
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1,
                                              use_bvh=True))
elif name in ("cornell_vpt_fused", "medium_cbox_vpt_fused"):
    # fused in-kernel volumetric PT (round 4): free-flight channel MIS +
    # phase sampling + interface-walked shadow transmittance in one Pallas
    # kernel (the megakernel_vpt.cu analogue)
    from cuda_pt_tpu.models import volume_pt
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    if backend == "cpu" or jax.default_backend() == "cpu":
        print(json.dumps({"name": name, "backend": "skipped_cpu",
                          "mrays_per_s": 0.0}))
        raise SystemExit(0)
    mdv = MaxDepthParams(max_depth=maxd, max_volume=8)
    if name.startswith("cornell"):
        scene, cam = cornell_medium(min(res_big, 256))
    else:
        scene, cam = from_xml("medium-cbox.xml", min(res_big, 256))
    if not mk.megakernel_ok(scene, mdv, renderer="vpt"):
        print(json.dumps({"name": name, "backend": "outside_envelope",
                          "mrays_per_s": 0.0}))
        raise SystemExit(0)
    pack = mk.make_pack(scene, vpt=True)
    fn = jax.jit(lambda s, i, pack=pack: mk.render_pack(
        pack, cam, mdv, spp=spp, seed=i))
    counter = (lambda s: volume_pt.count_rays(
        s, cam, mdv, spp=spp, seed=1, use_bvh=True))
elif name == "medium_cbox_vpt":
    # BASELINE.json VPT config: the reference's medium-cbox scene
    from cuda_pt_tpu.models import volume_pt
    scene, cam = from_xml("medium-cbox.xml", min(res_big, 256))
    mdv = MaxDepthParams(max_depth=maxd, max_volume=8)
    fn = jax.jit(lambda s, i: volume_pt.render(s, cam, mdv, spp=spp, seed=i, use_bvh=True))
    counter = (lambda s: volume_pt.count_rays(s, cam, mdv, spp=spp, seed=1, use_bvh=True))
elif name == "cornell_vpt":
    from cuda_pt_tpu.models import volume_pt
    scene, cam = cornell_medium(min(res_big, 256))
    mdv = MaxDepthParams(max_depth=maxd, max_volume=8)
    fn = jax.jit(lambda s, i: volume_pt.render(s, cam, mdv, spp=spp, seed=i, use_bvh=True))
    counter = (lambda s: volume_pt.count_rays(s, cam, mdv, spp=spp, seed=1, use_bvh=True))
elif name in ("kitchen", "kitchen_wide", "kitchen_forest"):
    # VERDICT r2 item 6: synthesized kitchen-class stress scene — ~99k
    # textured prims, HDR envmap + area light, 5 BSDF families
    # (scene/testscenes.kitchen_stress; reference target kitchen.xml).
    res = min(res_big, 256)
    fc = 32768 if name == "kitchen_forest" else None
    scene, cam, _ = testscenes.kitchen_stress(width=res, height=res,
                                              forest_chunk=fc)
    if name == "kitchen_forest":
        if backend == "cpu" or jax.default_backend() == "cpu":
            print(json.dumps({"name": name, "backend": "skipped_cpu",
                              "mrays_per_s": 0.0}))
            raise SystemExit(0)
        scene = scene.replace(traversal="pallas")
    elif name == "kitchen_wide":
        from cuda_pt_tpu.accel.wide_build import with_wide
        scene = with_wide(scene)
    fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=spp, seed=i, use_bvh=True))
    counter = (lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1, use_bvh=True))
else:
    raise SystemExit(f"unknown bench {name}")

_impl = os.environ.get("BENCH_IMPL", "")
if _impl == "wide" and scene.wide is None:
    from cuda_pt_tpu.accel.wide_build import with_wide
    scene = with_wide(scene)
elif _impl == "auto":
    from cuda_pt_tpu.accel.autotune import with_tuned_traversal
    scene = with_tuned_traversal(scene, cam)

# Readback-fenced timing (utils/timing.py): under the axon tunnel
# block_until_ready returns at dispatch-accept — the round-2 rows timed the
# tunnel, not the chip. warm_readback pays the one-shot ~300 s claim stall
# before any timed region.
from cuda_pt_tpu.utils import timing
warm_s = timing.warm_readback() if jax.default_backend() != "cpu" else 0.0
dt = timing.timeit(fn, scene, 1, reps=3)
# Count on the HOST CPU backend: the composed counting kernel on a big
# mesh runs past the tunnel's ~60 s per-call budget and kills the TPU
# worker (this WAS the 'whiskey fused instability', TUNNEL.md §5)
rays = timing.host_count(counter, scene)
print(json.dumps({
    "name": name, "backend": jax.default_backend(),
    "res": int(cam.width), "spp": spp, "max_depth": maxd,
    "sec_per_frame": round(dt, 4), "rays": rays,
    "mrays_per_s": round(rays / dt / 1e6, 3),
    "prims": int(scene.geom.num_prims),
    "warm_readback_s": round(warm_s, 1),
}))
""" % (REF_XML,)


def run_one(name: str, backend: str, quick: bool, timeout: int | None = None):
    # accelerator children pay the one-shot ~300-900 s first-readback claim
    # stall (utils/timing.warm_readback) before any timed region
    if timeout is None:
        timeout = 600 if backend == "cpu" else 1800
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, backend, name, "1" if quick else "0"],
            capture_output=True, timeout=timeout, text=True, cwd=REPO,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(out.stderr[-2000:] + "\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[bench_suite] {name} timed out after {time.time()-t0:.0f}s\n")
    return {"name": name, "backend": "timeout", "mrays_per_s": 0.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="default", choices=["default", "cpu"])
    ap.add_argument("--quick", action="store_true", help="small res/spp")
    ap.add_argument("--scenes", nargs="*", default=[
        "cornell_mega", "cornell_fused", "cornell_wf", "cornell_wf_nosort",
        "bunny", "bunny_fused", "whiskey", "whiskey_fused",
        "kitchen", "kitchen_fused", "vader", "vader_fused",
        "cornell_vpt", "cornell_vpt_fused", "medium_cbox_vpt",
        "medium_cbox_vpt_fused", "cornell_grad",
    ])
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_DETAILS.json"))
    ap.add_argument("--update-baseline", action="store_true",
                    help="rewrite the measured table in BASELINE.md from --out")
    args = ap.parse_args()

    rows = []
    for name in args.scenes:
        row = run_one(name, args.backend, args.quick)
        if row.get("backend") == "timeout" and args.backend == "default":
            row = run_one(name, "cpu", args.quick)
            row["backend"] = row.get("backend", "cpu") + "_fallback"
        rows.append(row)
        print(json.dumps(row), flush=True)

    import datetime

    with open(args.out, "w") as f:
        json.dump({"rows": rows, "quick": args.quick,
                   "date": datetime.date.today().isoformat()}, f, indent=1)
    print(f"wrote {args.out}")
    if args.update_baseline:
        update_baseline_md(args.out)


BEGIN_MARK = "<!-- BENCH_TABLE_BEGIN (generated by scripts/bench_suite.py) -->"
END_MARK = "<!-- BENCH_TABLE_END -->"


def update_baseline_md(details_path: str):
    """Rewrite BASELINE.md's measured table from BENCH_DETAILS.json — the
    single source of truth VERDICT r1 asked for (no more hand-typed numbers
    disagreeing with the driver's BENCH_r*.json)."""
    with open(details_path) as f:
        data = json.load(f)
    lines = [
        BEGIN_MARK,
        "",
        "Generated from `BENCH_DETAILS.json` (run `python scripts/bench_suite.py"
        " --update-baseline`). Mrays/s counts actually-traced rays: live path"
        " segments + NEE shadow rays, measured by the in-loop ray counter"
        " (`models/path_tracer.py:count_rays`), divided by wall time.",
        "",
        "| Scene | Backend | Res | spp | Depth | s/frame | Mrays/s | Prims | Date |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    import datetime

    stamp = data.get("date") or datetime.date.today().isoformat()
    for r in data["rows"]:
        if r.get("backend") in ("skipped_cpu", "timeout",
                                "outside_envelope"):
            lines.append(
                f"| {r['name']} | {r['backend']} | — | — | — | — | — | — |"
                f" {stamp} |")
            continue
        lines.append(
            ("| {name} | {backend} | {res}² | {spp} | {max_depth} | "
             "{sec_per_frame} | {mrays_per_s} | {prims} |").format(**r)
            + f" {r.get('date', stamp)} |")
    lines += ["", END_MARK]
    block = "\n".join(lines)

    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    if BEGIN_MARK in text:
        pre = text.split(BEGIN_MARK)[0]
        post = text.split(END_MARK)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
