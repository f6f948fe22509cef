"""Probe the per-call work budget of the live TPU tunnel.

The first healthy-tunnel session showed a pattern: small renders complete
(32² in 69 ms, 256²×4spp grad step in 2.3 s) but big single-call renders
(512²×16spp megakernel, whiskey 512²) die with "UNAVAILABLE: TPU device
error" at ~110-120 s wall — consistent with a per-call execution ceiling on
the tunnel, not a kernel fault. This script bisects the budget: it runs a
ladder of (resolution, spp-per-call) configs, each in its own watchdogged
subprocess, and records compile time, run time, and Mrays/s per config.

The result decides how bench.py sizes its per-call work (many small calls
accumulated host-side — the Renderer's film already does this — instead of
one giant call).

Usage: python scripts/onchip_probe.py [--impl xla] [--out ONCHIP_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
import jax
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes

W = int(os.environ["PROBE_W"]); SPP = int(os.environ["PROBE_SPP"])
pt.TRAVERSAL_IMPL = os.environ.get("PROBE_IMPL", "xla")
scene, cam, _ = testscenes.cornell_box(width=W, height=W)
md = MaxDepthParams(max_depth=5)
fn = jax.jit(lambda s, i: pt.render(s, cam, md, spp=SPP, seed=i, use_bvh=True))
t0 = time.perf_counter()
fn(scene, 0).block_until_ready()
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
fn(scene, 1).block_until_ready()
run_s = time.perf_counter() - t0
rays = int(jax.jit(lambda s: pt.count_rays(s, cam, md, spp=SPP, seed=1,
                                           use_bvh=True))(scene))
print(json.dumps({"backend": jax.default_backend(),
                  "compile_s": round(compile_s, 2),
                  "run_s": round(run_s, 4), "rays": rays,
                  "mrays_per_s": round(rays / run_s / 1e6, 3)}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--out", default=os.path.join(REPO, "ONCHIP_PROBE.json"))
    args = ap.parse_args()

    ladder = [
        (128, 1), (128, 4), (256, 1), (256, 4),
        (512, 1), (512, 4), (512, 16),
    ]
    results = []
    for w, spp in ladder:
        env = dict(os.environ, PROBE_W=str(w), PROBE_SPP=str(spp),
                   PROBE_IMPL=args.impl)
        t0 = time.time()
        rec: dict = {"w": w, "spp": spp, "impl": args.impl}
        try:
            out = subprocess.run(
                [sys.executable, "-c", _CHILD], capture_output=True,
                timeout=args.timeout, text=True, cwd=REPO, env=env)
            line = next((ln for ln in reversed(out.stdout.strip().splitlines())
                         if ln.startswith("{")), None)
            if line:
                rec.update(json.loads(line), ok=True)
            else:
                rec.update(ok=False, stderr=out.stderr[-400:])
        except subprocess.TimeoutExpired:
            rec.update(ok=False, timeout_s=args.timeout)
        rec["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)
        results.append(rec)
        # two consecutive failures = past the budget; stop burning tunnel time
        if len(results) >= 2 and not results[-1]["ok"] and not results[-2]["ok"]:
            break
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
