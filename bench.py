"""Benchmark: Mrays/s on the cornell-box PT (BASELINE.json PR1 config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting is HONEST: the denominator is the measured number of traced
rays (path segments with Russian roulette + NEE shadow rays, counted by
``path_tracer.count_rays`` with the same RNG streams) — not the
W*H*spp*max_depth upper bound round 1 used.

Resilience: every measurement runs in its own subprocess with a watchdog,
because a wedged TPU tunnel or a faulting kernel compile hangs the process
(round-1 history) and try/except cannot catch that. On a live accelerator
the harness SWEEPS the tuning ladder (gather-loop / 8-wide / Pallas packet
traversal × megakernel / compacted wavefront), each config isolated, and
reports the best — one bad config costs its own watchdog window, never the
TPU number. A 120 s probe short-circuits straight to the CPU fallback when
the tunnel is down. Sweep details land in BENCH_SWEEP.json.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against our recorded TPU figure (None until the first TPU run lands).
scripts/bench_suite.py produces the full per-scene table (BENCH_DETAILS.json).
"""

import json
import os
import subprocess
import sys

# First recorded real-TPU number (2026-08-18, BENCH_SWEEP.json): cornell
# 256²×4spp depth-5 through the compiled Pallas packet traversal on a
# v5e chip — 5.846 Mrays/s (24x the XLA gather loop's 0.246 on the same
# config). vs_baseline is measured against this.
BASELINE_MRAYS = 5.846
TIMEOUT_S = 480
PROBE_TIMEOUT_S = 120

# The on-accelerator tuning ladder (ROADMAP #2: sweep impl × renderer).
# brute_* rows use the framework's own small-scene default (41-prim cornell
# sits under BRUTE_FORCE_MAX_PRIMS=64, where vectorized all-prims tests beat
# any tree walk — measured 3.6× on CPU); the BVH rows record traversal perf.
SWEEP = [
    {"name": "brute_mega", "BENCH_RENDERER": "megakernel", "BENCH_USE_BVH": "0"},
    {"name": "brute_wf", "BENCH_RENDERER": "wavefront", "BENCH_USE_BVH": "0"},
    # matmul-form brute force: all ray x prim tests as one MXU contraction
    {"name": "mxu_mega", "BENCH_IMPL": "mxu", "BENCH_RENDERER": "megakernel"},
    {"name": "xla_mega", "BENCH_IMPL": "xla", "BENCH_RENDERER": "megakernel"},
    # same config with the Owen-Sobol sampler: quantifies the QMC compute
    # cost on-chip (quality win is ~5x MSE at 16 spp, tests/test_qmc.py)
    {"name": "xla_mega_sobol", "BENCH_IMPL": "xla",
     "BENCH_RENDERER": "megakernel", "BENCH_SAMPLER": "sobol"},
    # RIS NEE: M=4 light candidates per bounce, one shadow ray — trades
    # VPU math for sample quality; on-chip cost unknown (quality win 2.6x,
    # tests/test_ris_nee.py)
    {"name": "xla_mega_ris4", "BENCH_IMPL": "xla",
     "BENCH_RENDERER": "megakernel", "BENCH_NEE_M": "4"},
    {"name": "wide_mega", "BENCH_IMPL": "wide", "BENCH_RENDERER": "megakernel"},
    {"name": "wide_bf16_mega", "BENCH_IMPL": "wide", "BENCH_RENDERER": "megakernel",
     "BENCH_NODE_FMT": "bf16"},
    {"name": "pallas_mega", "BENCH_IMPL": "pallas", "BENCH_RENDERER": "megakernel"},
    {"name": "xla_wf", "BENCH_IMPL": "xla", "BENCH_RENDERER": "wavefront"},
]

_PROBE_CODE = r"""
import json
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print(json.dumps({"backend": jax.default_backend()}))
"""

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
USE_BVH = os.environ.get("BENCH_USE_BVH", "1") == "1"
SAMPLER = os.environ.get("BENCH_SAMPLER", "pcg")
NEE_M = int(os.environ.get("BENCH_NEE_M", "1"))

# Per-call work budget (measured on the live tunnel, ONCHIP_PROBE.json,
# 2026-08-18): single calls whose execution runs past ~60 s die with
# "UNAVAILABLE: TPU device error" (512²×16spp did, in both rounds); 512²×4spp
# (22 s/call) and below are reliable. Default to 256²×4spp on accelerators —
# measured throughput is flat in batch size (0.2-0.28 Mrays/s at every probe
# point), so the smaller config measures the same number in a fifth of the
# wall time and lets the whole sweep fit the driver's window. Override with
# BENCH_W / BENCH_SPP.
if backend != "cpu":
    W = H = int(os.environ.get("BENCH_W", "256"))
    SPP = int(os.environ.get("BENCH_SPP", "4"))
else:
    W = H = int(os.environ.get("BENCH_W", "128"))
    SPP = int(os.environ.get("BENCH_SPP", "2"))
MAXD = 5
SCENE = os.environ.get("BENCH_SCENE", "cornell")
if SCENE == "cornell":
    scene, cam, _ = testscenes.cornell_box(width=W, height=H)
else:
    # mesh scenes from the reference corpus (bunny 7.3k / whiskey 68k prims)
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml(f"/root/reference/scene/xml/{SCENE}.xml",
                  override_res=(W, H))
    scene, cam = ps.scene, ps.camera
if FOREST_CHUNK:
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

    scene = scene.replace(forest=tk.build_forest(
        scene.geom, chunk_prims=FOREST_CHUNK, node_fmt=NODE_FMT))
if pt.TRAVERSAL_IMPL == "wide":
    from cuda_pt_tpu.accel import wide_build

    scene = wide_build.with_wide(scene, box_dtype=NODE_FMT
                                 if NODE_FMT in ("f32", "bf16") else "f32")
elif pt.TRAVERSAL_IMPL == "auto":
    from cuda_pt_tpu.accel.autotune import with_tuned_traversal

    pt.TRAVERSAL_IMPL = "xla"
    scene = with_tuned_traversal(scene, cam)
md = MaxDepthParams(max_depth=MAXD)

if RENDERER == "wavefront":
    from cuda_pt_tpu.models import wavefront

    fn = jax.jit(lambda s, seed: wavefront.render(
        s, cam, md, spp=SPP, seed=seed, use_bvh=USE_BVH, compact=True,
        sampler=SAMPLER, nee_candidates=NEE_M))
else:
    fn = jax.jit(lambda s, seed: pt.render(s, cam, md, spp=SPP, seed=seed,
                                           use_bvh=USE_BVH, samples_per_pass=K,
                                           sampler=SAMPLER,
                                           nee_candidates=NEE_M))
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
                                           use_bvh=USE_BVH,
                                           sampler=SAMPLER))(scene))
mrays = rays / dt / 1e6
print(json.dumps({"mrays": mrays, "backend": jax.default_backend(),
                  "w": W, "spp": SPP, "sec_per_frame": dt, "rays": rays}))
"""

_HERE = os.path.dirname(os.path.abspath(__file__))


def _run_code(code: str, argv: list, timeout: int, env_extra: dict | None = None):
    env = dict(os.environ)
    if env_extra:
        env.update({k: str(v) for k, v in env_extra.items()})
    try:
        out = subprocess.run(
            [sys.executable, "-c", code, *argv],
            capture_output=True, timeout=timeout, text=True, cwd=_HERE, env=env,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def _probe_backend() -> str | None:
    """Backend name if a tiny op completes inside the watchdog, else None."""
    res = _run_code(_PROBE_CODE, [], PROBE_TIMEOUT_S)
    return res.get("backend") if res else None


def _emit(metric: str, mrays: float):
    vs = 1.0 if BASELINE_MRAYS is None else mrays / BASELINE_MRAYS
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))


def main():
    backend = _probe_backend()
    if backend and backend != "cpu":
        results = []
        for cfg in SWEEP:
            env = {k: v for k, v in cfg.items() if k != "name"}
            r = _run_code(_CHILD_CODE, ["default"], TIMEOUT_S, env)
            if r and r.get("backend") != "cpu":
                results.append(dict(r, config=cfg["name"]))
        with open(os.path.join(_HERE, "BENCH_SWEEP.json"), "w") as f:
            json.dump({"backend": backend, "results": results}, f, indent=1)
        if results:
            best = max(results, key=lambda r: r["mrays"])
            _emit("cornell_pt_mrays_per_s", best["mrays"])
            return
    # tunnel down or every accelerator config failed: CPU fallback — still
    # tuned (compacted wavefront beats the megakernel ~2x on CPU)
    results = []
    for cfg in (
        {"name": "brute_mega", "BENCH_RENDERER": "megakernel",
         "BENCH_USE_BVH": "0"},
        {"name": "xla_wf", "BENCH_IMPL": "xla", "BENCH_RENDERER": "wavefront"},
    ):
        env = {k: v for k, v in cfg.items() if k != "name"}
        r = _run_code(_CHILD_CODE, ["cpu"], TIMEOUT_S, env)
        if r:
            results.append(dict(r, config=cfg["name"]))
    with open(os.path.join(_HERE, "BENCH_SWEEP.json"), "w") as f:
        json.dump({"backend": "cpu_fallback", "results": results}, f, indent=1)
    if not results:
        print(json.dumps({
            "metric": "cornell_pt_mrays_per_s",
            "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        }))
        return
    best = max(results, key=lambda r: r["mrays"])
    _emit("cornell_pt_mrays_per_s_cpu_fallback", best["mrays"])


if __name__ == "__main__":
    main()
