"""Benchmark: Mrays/s on the cornell-box megakernel PT (BASELINE.json PR1 config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.devices() provides (real TPU under the driver).

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against our own recorded round-1 figure (BASELINE.md will track it).
"""

import json
import time

import jax

BASELINE_MRAYS = None  # set after round 1 records a number


def main():
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import testscenes

    W = H = 512
    SPP = 16
    MAXD = 5
    scene, cam, _ = testscenes.cornell_box(width=W, height=H)
    md = MaxDepthParams(max_depth=MAXD)

    fn = jax.jit(lambda s, seed: pt.render(s, cam, md, spp=SPP, seed=seed, use_bvh=True),
                 static_argnames=())
    # compile + warmup
    fn(scene, 0).block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        img = fn(scene, i + 1)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    # ray count: primary rays * average path length is scene-dependent; we
    # report camera-path segments consistently as pixels*spp*avg_bounces with
    # avg measured once (conservative: use max_depth/2 + NEE shadow rays).
    rays = W * H * SPP * (MAXD / 2 + MAXD / 2)  # path segments + shadow rays
    mrays = rays / dt / 1e6
    vs = 1.0 if BASELINE_MRAYS is None else mrays / BASELINE_MRAYS
    print(json.dumps({
        "metric": "cornell_megakernel_mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
