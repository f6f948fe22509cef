"""Benchmark: Mrays/s on the cornell-box megakernel PT (BASELINE.json PR1 config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting is HONEST: the denominator is the measured number of traced
rays (path segments with Russian roulette + NEE shadow rays, counted by
``path_tracer.count_rays`` with the same RNG streams) — not the
W*H*spp*max_depth upper bound round 1 used.

Resilience: the measurement runs in a subprocess with a watchdog. If the TPU
backend hangs or faults (tunnel outages happen), it retries on CPU and labels
the metric accordingly — the driver always gets its JSON line.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against our recorded TPU figure (None until the first TPU run lands).
scripts/bench_suite.py produces the full per-scene table (BENCH_DETAILS.json).
"""

import json
import os
import subprocess
import sys

BASELINE_MRAYS = None  # set after the first recorded TPU number
TIMEOUT_S = 480

_CHILD_CODE = r"""
import json, os, sys, time
backend = sys.argv[1]
import jax
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes

# tuning knobs (swept on real hardware): traversal impl, samples per pass,
# renderer family
pt.TRAVERSAL_IMPL = os.environ.get("BENCH_IMPL", "xla")
K = int(os.environ.get("BENCH_SPP_PER_PASS", "1"))
RENDERER = os.environ.get("BENCH_RENDERER", "megakernel")
FOREST_CHUNK = int(os.environ.get("BENCH_FOREST_CHUNK", "0"))
NODE_FMT = os.environ.get("BENCH_NODE_FMT", "f32")

W = H = 512 if backend != "cpu" else 128
SPP = 16 if backend != "cpu" else 2
MAXD = 5
scene, cam, _ = testscenes.cornell_box(width=W, height=H)
if FOREST_CHUNK:
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

    scene = scene.replace(forest=tk.build_forest(
        scene.geom, chunk_prims=FOREST_CHUNK, node_fmt=NODE_FMT))
if pt.TRAVERSAL_IMPL == "auto":
    from cuda_pt_tpu.accel.autotune import with_tuned_traversal

    pt.TRAVERSAL_IMPL = "xla"
    scene = with_tuned_traversal(scene, cam)
md = MaxDepthParams(max_depth=MAXD)

if RENDERER == "wavefront":
    from cuda_pt_tpu.models import wavefront

    fn = jax.jit(lambda s, seed: wavefront.render(
        s, cam, md, spp=SPP, seed=seed, use_bvh=True, compact=True))
else:
    fn = jax.jit(lambda s, seed: pt.render(s, cam, md, spp=SPP, seed=seed,
                                           use_bvh=True, samples_per_pass=K))
fn(scene, 0).block_until_ready()
t0 = time.perf_counter()
reps = 3
for i in range(reps):
    img = fn(scene, i + 1)
img.block_until_ready()
dt = (time.perf_counter() - t0) / reps

# measured traced rays (segments + shadow) for one representative seed —
# wavefront permutes lanes but traces the identical per-lane streams
rays = int(jax.jit(lambda s: pt.count_rays(s, cam, md, spp=SPP, seed=1,
                                           use_bvh=True))(scene))
mrays = rays / dt / 1e6
print(json.dumps({"mrays": mrays, "backend": jax.default_backend(),
                  "w": W, "spp": SPP, "sec_per_frame": dt, "rays": rays}))
"""


def _run(backend: str, timeout: int):
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD_CODE, backend],
            capture_output=True, timeout=timeout, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def main():
    res = _run("default", TIMEOUT_S)
    suffix = ""
    if res is None or res.get("backend") == "cpu":
        res = res or _run("cpu", TIMEOUT_S)
        suffix = "_cpu_fallback"
    if res is None:
        print(json.dumps({
            "metric": "cornell_megakernel_mrays_per_s",
            "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        }))
        return
    mrays = res["mrays"]
    vs = 1.0 if BASELINE_MRAYS is None else mrays / BASELINE_MRAYS
    print(json.dumps({
        "metric": "cornell_megakernel_mrays_per_s" + suffix,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
