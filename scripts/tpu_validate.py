"""TPU hardware validation ladder (run when the tunnel is healthy).

Each rung runs in a watchdogged subprocess so a device fault or tunnel wedge
can't hang the driver (memory: a 512²×16spp bench faulted the chip in round
1 and wedged the tunnel for 7+ hours). All timings are READBACK-FENCED
(cuda_pt_tpu/utils/timing.py): under the axon tunnel block_until_ready
returns at dispatch-accept, so the round-2 ladder recorded dispatch latency
— and "ok" rungs had not actually proven execution. Every rung now pays the
one-shot warm-readback stall first and fences its timed region.

Rungs, in order:

  1 tiny-op            jnp.sum on device, fenced — is the tunnel alive
  2 render-32          32² cornell megakernel (XLA gather traversal)
  3 pallas-compile     packet kernel compiled (NOT interpret) on 1k rays
  4 pallas-forest      multi-chunk streaming kernel compiled + run
  5 render-512-xla     512²×4spp cornell, banded into per-call budgets
  6 render-512-pal     same through the compiled Pallas traversal
  7 wavefront-512      compacted wavefront at 512²×4spp
  8 pallas-bf16        bf16-node streaming forest correctness
  9 whiskey-512-forest 68k-prim mesh through the streamed forest (VERDICT r2
                       item 2 — the rung that had never survived on silicon)
 10 kitchen-256-forest ~99k-prim textured+envmap stress scene (item 6)
 11 grad-step          fwd+bwd differentiable render (Mrays/s fwd+bwd)

Prints one JSON line per rung; stops early only on rung-1 failure.
Usage: python scripts/tpu_validate.py [--upto N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PRELUDE = r"""
import json, time
import jax, jax.numpy as jnp
from cuda_pt_tpu.utils import timing
_warm = timing.warm_readback()
"""

_RUNGS: dict[str, str] = {}

_RUNGS["tiny-op"] = r"""
ds = jax.devices()
t0 = time.time()
x = float(jax.device_get(jnp.sum(jnp.arange(1 << 20))))
print(json.dumps({"devices": [str(d) for d in ds], "sum": x,
                  "warm_s": round(_warm, 1),
                  "sec": round(time.time() - t0, 2)}))
"""

_RUNGS["render-32"] = r"""
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=32, height=32)
md = MaxDepthParams(max_depth=4)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=2, seed=i, use_bvh=True))
t0 = time.time(); timing.force(fn(scene, 0))
compile_s = time.time() - t0
dt = timing.timeit(fn, scene, 1)
img = fn(scene, 1)
print(json.dumps({"backend": jax.default_backend(),
                  "compile_s": round(compile_s, 1),
                  "run_s": round(dt, 4),
                  "mean": float(jax.device_get(img.mean()))}))
"""

_RUNGS["pallas-compile"] = r"""
import numpy as np
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box()
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1024, 3)), jnp.float32)
d = vm.normalize(jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32))
t0 = time.time()
fn = jax.jit(lambda o, d: tk.traverse_pallas(scene.geom, scene.bvh, o, d,
                                             interpret=False))
out = fn(o, d)
timing.force(out["t"])
compile_s = time.time() - t0
brute = isect.closest_hit_brute(scene.geom, o, d)
ok = bool(jax.device_get(jnp.all(out["hit"] == brute["hit"])))
print(json.dumps({"compiled": True, "compile_s": round(compile_s, 1),
                  "matches_brute": ok}))
assert ok
"""

_RUNGS["pallas-forest"] = r"""
import numpy as np
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box()
forest = tk.build_forest(scene.geom, chunk_prims=8)
rng = np.random.default_rng(1)
o = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1024, 3)), jnp.float32)
d = vm.normalize(jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32))
fn = jax.jit(lambda o, d: tk.traverse_forest(forest, o, d, interpret=False))
t0 = time.time(); out = fn(o, d); timing.force(out["t"])
brute = isect.closest_hit_brute(scene.geom, o, d)
ok = bool(jax.device_get(jnp.all(out["hit"] == brute["hit"])))
print(json.dumps({"chunks": int(forest.num_chunks),
                  "compile_s": round(time.time() - t0, 1), "matches": ok}))
assert ok
"""

_RUNGS["render-512-xla"] = r"""
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=512, height=512)
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=4, seed=i, use_bvh=True))
timing.force(fn(scene, 0))
dt = timing.timeit(fn, scene, 1)
rays = timing.host_count(lambda s: pt.count_rays(
    s, cam, md, spp=4, seed=1, use_bvh=True), scene)
print(json.dumps({"sec_per_frame": round(dt, 3), "rays": rays,
                  "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["render-512-pal"] = r"""
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=512, height=512)
scene = scene.replace(traversal="pallas")
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=4, seed=i, use_bvh=True))
timing.force(fn(scene, 0))
dt = timing.timeit(fn, scene, 1)
rays = timing.host_count(lambda s: pt.count_rays(
    s, cam, md, spp=4, seed=1, use_bvh=True), scene)
print(json.dumps({"sec_per_frame": round(dt, 3), "impl": "pallas_packet",
                  "rays": rays, "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["wavefront-512"] = r"""
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import wavefront
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=512, height=512)
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: wavefront.render(s, cam, md, spp=4, seed=i,
                                           use_bvh=True, compact=True))
timing.force(fn(scene, 0))
dt = timing.timeit(fn, scene, 1)
rays = timing.host_count(lambda s: pt.count_rays(
    s, cam, md, spp=4, seed=1, use_bvh=True), scene)
print(json.dumps({"sec_per_frame": round(dt, 3), "rays": rays,
                  "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["pallas-bf16"] = r"""
import numpy as np
from cuda_pt_tpu.core import math as vm
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box()
forest = tk.build_forest(scene.geom, chunk_prims=8, node_fmt="bf16")
rng = np.random.default_rng(2)
o = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1024, 3)), jnp.float32)
d = vm.normalize(jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32))
fn = jax.jit(lambda o, d: tk.traverse_forest(forest, o, d, interpret=False))
t0 = time.time(); out = fn(o, d); timing.force(out["t"])
brute = isect.closest_hit_brute(scene.geom, o, d)
ok = bool(jax.device_get(jnp.all(out["hit"] == brute["hit"])))
print(json.dumps({"fmt": "bf16", "compile_s": round(time.time() - t0, 1),
                  "matches": ok}))
assert ok
"""

_RUNGS["whiskey-512-forest"] = r"""
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene.xml_parser import load_xml
ps = load_xml("/root/reference/scene/xml/whiskey.xml", override_res=(512, 512))
scene = ps.scene.replace(
    forest=tk.build_forest(ps.scene.geom, chunk_prims=32768, node_fmt="bf16"),
    traversal="pallas")
md = ps.config.md
cam = ps.camera
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=1, seed=i, use_bvh=True))
t0 = time.time(); timing.force(fn(scene, 0))
compile_s = time.time() - t0
dt = timing.timeit(fn, scene, 1)
rays = timing.host_count(
    lambda s: pt.count_rays(s, cam, md, spp=1, seed=1, use_bvh=True),
    scene.replace(traversal="xla"))
print(json.dumps({"scene": "whiskey", "prims": int(scene.geom.num_prims),
                  "chunks": int(scene.forest.num_chunks),
                  "compile_s": round(compile_s, 1),
                  "sec_per_frame": round(dt, 3), "rays": rays,
                  "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["kitchen-256-forest"] = r"""
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.kitchen_stress(width=256, height=256,
                                          forest_chunk=32768)
scene = scene.replace(traversal="pallas")
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=1, seed=i, use_bvh=True))
t0 = time.time(); timing.force(fn(scene, 0))
compile_s = time.time() - t0
dt = timing.timeit(fn, scene, 1)
rays = timing.host_count(
    lambda s: pt.count_rays(s, cam, md, spp=1, seed=1, use_bvh=True),
    scene.replace(traversal="xla"))
print(json.dumps({"scene": "kitchen_stress",
                  "prims": int(scene.geom.num_prims),
                  "compile_s": round(compile_s, 1),
                  "sec_per_frame": round(dt, 3), "rays": rays,
                  "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["grad-step"] = r"""
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=256, height=256)
md = MaxDepthParams(max_depth=4)
target = jnp.zeros((256, 256, 3))

def loss(kd):
    s = scene.replace(bsdfs=scene.bsdfs.replace(k_d=kd))
    img = pt.render(s, cam, md, spp=4, seed=0, use_bvh=True, differentiable=True)
    return jnp.mean((img - target) ** 2)

fn = jax.jit(jax.value_and_grad(loss))
timing.force(fn(scene.bsdfs.k_d)[0])
dt = timing.timeit(lambda kd: fn(kd)[0], scene.bsdfs.k_d)
l, g = fn(scene.bsdfs.k_d)
rays = timing.host_count(lambda s: pt.count_rays(
    s, cam, md, spp=4, seed=0, use_bvh=True), scene)
print(json.dumps({"fwd_bwd_sec": round(dt, 3),
                  "loss": float(jax.device_get(l)),
                  "grad_finite": bool(jax.device_get(
                      jnp.all(jnp.isfinite(g)))),
                  "mrays_per_s_fwd_bwd": round(rays / dt / 1e6, 2)}))
"""


def run_rung(name: str, timeout: int) -> dict:
    code = _PRELUDE + _RUNGS[name]
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout, text=True, cwd=REPO,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                d = json.loads(line)
                d.update(rung=name, ok=out.returncode == 0,
                         wall_s=round(time.time() - t0, 1))
                return d
        return {"rung": name, "ok": False, "stderr": out.stderr[-1500:],
                "wall_s": round(time.time() - t0, 1)}
    except subprocess.TimeoutExpired:
        return {"rung": name, "ok": False, "timeout_s": timeout}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--upto", type=int, default=len(_RUNGS))
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these rung names")
    # generous: each child pays the (wildly variable, 1-900 s) one-shot
    # warm-readback claim stall before its real work
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    results = []
    names = [n for n in _RUNGS if args.only is None or n in args.only]
    for i, name in enumerate(names):
        r = run_rung(name, args.timeout)
        print(json.dumps(r), flush=True)
        results.append(r)
        if i == 0 and name == "tiny-op" and not r.get("ok"):
            print(json.dumps({"verdict": "tunnel wedged — stop here"}))
            return 1
        # incremental write: a later hard-fault keeps earlier evidence
        with open(os.path.join(REPO, "TPU_VALIDATE.json"), "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
