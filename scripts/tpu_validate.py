"""TPU hardware validation ladder (run when the tunnel is healthy).

Each rung runs in a watchdogged subprocess so a device fault or tunnel wedge
can't hang the driver (memory: a 512²×16spp bench faulted the chip in round
1 and wedged the tunnel for 7+ hours). Rungs, in order:

  1 tiny-op          jnp.sum on device — is the tunnel alive at all
  2 render-32        32² cornell megakernel (XLA gather traversal)
  3 pallas-compile   packet kernel compiled (NOT interpret) on 1k rays
  4 pallas-forest    multi-chunk streaming kernel compiled + run
  5 render-512-xla   512²×16spp cornell (the config that faulted r1)
  6 render-512-pal   same through the compiled Pallas traversal
  7 wavefront-512    compacted wavefront at 512²
  8 grad-step        fwd+bwd differentiable render (Mrays/s fwd+bwd)

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

_RUNGS: dict[str, str] = {}

_RUNGS["tiny-op"] = r"""
import jax, jax.numpy as jnp, time
t0 = time.time()
ds = jax.devices()
x = float(jnp.sum(jnp.arange(1 << 20)).block_until_ready())
print(json.dumps({"devices": [str(d) for d in ds], "sum": x,
                  "sec": round(time.time() - t0, 2)}))
"""

_RUNGS["render-32"] = r"""
import jax, time
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=32, height=32)
md = MaxDepthParams(max_depth=4)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=2, seed=i, use_bvh=True))
t0 = time.time(); fn(scene, 0).block_until_ready()
compile_s = time.time() - t0
t0 = time.time(); img = fn(scene, 1); img.block_until_ready()
print(json.dumps({"backend": jax.default_backend(),
                  "compile_s": round(compile_s, 1),
                  "run_s": round(time.time() - t0, 4),
                  "mean": float(img.mean())}))
"""

_RUNGS["pallas-compile"] = r"""
import jax, jax.numpy as jnp, numpy as np, time
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
out["t"].block_until_ready()
compile_s = time.time() - t0
brute = isect.closest_hit_brute(scene.geom, o, d)
ok = bool(jnp.all(out["hit"] == brute["hit"]))
print(json.dumps({"compiled": True, "compile_s": round(compile_s, 1),
                  "matches_brute": ok}))
assert ok
"""

_RUNGS["pallas-forest"] = r"""
import jax, jax.numpy as jnp, numpy as np, time
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
t0 = time.time(); out = fn(o, d); out["t"].block_until_ready()
brute = isect.closest_hit_brute(scene.geom, o, d)
ok = bool(jnp.all(out["hit"] == brute["hit"]))
print(json.dumps({"chunks": int(forest.num_chunks),
                  "compile_s": round(time.time() - t0, 1), "matches": ok}))
assert ok
"""

_RUNGS["render-512-xla"] = r"""
import jax, time
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=512, height=512)
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=16, seed=i, use_bvh=True))
fn(scene, 0).block_until_ready()
t0 = time.time(); img = fn(scene, 1); img.block_until_ready()
dt = time.time() - t0
rays = int(jax.jit(lambda s: pt.count_rays(s, cam, md, spp=16, seed=1,
                                           use_bvh=True))(scene))
print(json.dumps({"sec_per_frame": round(dt, 3), "rays": rays,
                  "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["render-512-pal"] = r"""
import jax, time
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes
pt.TRAVERSAL_IMPL = "pallas"
scene, cam, _ = testscenes.cornell_box(width=512, height=512)
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=16, seed=i, use_bvh=True))
fn(scene, 0).block_until_ready()
t0 = time.time(); img = fn(scene, 1); img.block_until_ready()
dt = time.time() - t0
print(json.dumps({"sec_per_frame": round(dt, 3),
                  "impl": "pallas_packet"}))
"""

_RUNGS["wavefront-512"] = r"""
import jax, time
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import wavefront
from cuda_pt_tpu.scene import testscenes
scene, cam, _ = testscenes.cornell_box(width=512, height=512)
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: wavefront.render(s, cam, md, spp=16, seed=i,
                                           use_bvh=True, compact=True))
fn(scene, 0).block_until_ready()
t0 = time.time(); img = fn(scene, 1); img.block_until_ready()
print(json.dumps({"sec_per_frame": round(time.time() - t0, 3)}))
"""

_RUNGS["pallas-bf16"] = r"""
import jax, jax.numpy as jnp, numpy as np, time
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
t0 = time.time(); out = fn(o, d); out["t"].block_until_ready()
brute = isect.closest_hit_brute(scene.geom, o, d)
ok = bool(jnp.all(out["hit"] == brute["hit"]))
print(json.dumps({"fmt": "bf16", "compile_s": round(time.time() - t0, 1),
                  "matches": ok}))
assert ok
"""

_RUNGS["whiskey-512-forest"] = r"""
import jax, time
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene.xml_parser import load_xml
ps = load_xml("/root/reference/scene/xml/whiskey.xml", override_res=(512, 512))
scene = ps.scene.replace(
    forest=tk.build_forest(ps.scene.geom, chunk_prims=32768, node_fmt="bf16"))
md = ps.config.md
pt.TRAVERSAL_IMPL = "pallas"
fn = jax.jit(lambda s, i: pt.render(s, cam_ := ps.camera, md, spp=4, seed=i,
                                    use_bvh=True))
fn(scene, 0).block_until_ready()
t0 = time.time(); img = fn(scene, 1); img.block_until_ready()
dt = time.time() - t0
pt.TRAVERSAL_IMPL = "xla"
rays = int(jax.jit(lambda s: pt.count_rays(s, ps.camera, md, spp=4, seed=1,
                                           use_bvh=True))(scene))
print(json.dumps({"scene": "whiskey", "prims": int(scene.geom.num_prims),
                  "chunks": int(scene.forest.num_chunks),
                  "sec_per_frame": round(dt, 3), "rays": rays,
                  "mrays_per_s": round(rays / dt / 1e6, 2)}))
"""

_RUNGS["grad-step"] = r"""
import jax, jax.numpy as jnp, time
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
fn(scene.bsdfs.k_d)[0].block_until_ready()
t0 = time.time(); l, g = fn(scene.bsdfs.k_d); l.block_until_ready()
dt = time.time() - t0
rays = int(jax.jit(lambda s: pt.count_rays(s, cam, md, spp=4, seed=0,
                                           use_bvh=True))(scene))
print(json.dumps({"fwd_bwd_sec": round(dt, 3), "loss": float(l),
                  "grad_finite": bool(jnp.all(jnp.isfinite(g))),
                  "mrays_per_s_fwd_bwd": round(rays / dt / 1e6, 2)}))
"""


def run_rung(name: str, timeout: int) -> dict:
    code = "import json\n" + _RUNGS[name]
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
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    results = []
    for i, name in enumerate(_RUNGS):
        if i >= args.upto:
            break
        r = run_rung(name, args.timeout if i else 180)
        print(json.dumps(r), flush=True)
        results.append(r)
        if i == 0 and not r.get("ok"):
            print(json.dumps({"verdict": "tunnel wedged — stop here"}))
            return 1
    with open(os.path.join(REPO, "TPU_VALIDATE.json"), "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
