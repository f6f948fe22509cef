"""Dissect the on-chip per-ray cost: time each pipeline component alone.

First real-chip numbers (ONCHIP_PROBE.json 2026-08-18) show ~0.2-0.28
Mrays/s on cornell — ~4 us/ray, ~70x off any flop/byte estimate. This
script times the components (RNG+camera, brute intersect, BVH gather walk,
emitter sampling, BSDF eval/sample, a full bounce, raw while_loop overhead,
a gather microbench) so the blame lands on data, not guesses.

Prints one JSON line per component (so a mid-run device fault keeps the
earlier rows); run under `timeout`. Results land in ONCHIP_DISSECT.json via
--save. CPU backend supported for harness testing (--cpu).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench(fn, *args, reps: int = 5):
    """Readback-fenced timing (utils/timing.py): under the axon tunnel
    block_until_ready returns at dispatch-accept, so the round-2 version of
    this function measured ~26 ms of tunnel latency for EVERY component —
    the spurious flat "0.4 µs/lane floor" of ONCHIP_DISSECT.json r2."""
    from cuda_pt_tpu.utils import timing

    return timing.timeit(fn, *args, reps=reps)


def emit(name, sec, B):
    print(json.dumps({"component": name, "sec": round(sec, 5),
                      "ns_per_lane": round(sec / B * 1e9, 1)}), flush=True)
    return {"component": name, "sec": sec, "ns_per_lane": sec / B * 1e9}


def emit_row(rows, name, thunk, B, save=None):
    """Fail-soft row: one device fault costs its own row, never the later
    ones (advisor r2 finding — mid-list rows lacked the pallas_hit guard),
    and --save is written incrementally so a hard kill keeps earlier rows."""
    try:
        rows.append(emit(name, thunk(), B))
    except Exception as e:  # noqa: BLE001 — device faults must not kill the run
        print(json.dumps({"component": name, "error": repr(e)[:200]}),
              flush=True)
        rows.append({"component": name, "error": repr(e)[:200]})
    if save:
        Path(save).write_text(json.dumps(rows, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    global jax
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cuda_pt_tpu.accel import traverse
    from cuda_pt_tpu.bsdf import eval as bsdf_eval
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import qmc
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.emitters import emitters
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops import intersect as isect
    from cuda_pt_tpu.scene import testscenes

    W = args.width
    B = W * W
    scene, cam, _ = testscenes.cornell_box(width=W, height=W)
    md = MaxDepthParams(max_depth=5)
    lane = jnp.arange(B, dtype=jnp.int32)
    rows = []

    from cuda_pt_tpu.utils import timing

    t_warm = timing.warm_readback()  # one-shot ~300 s tunnel claim stall
    print(json.dumps({"backend": jax.default_backend(), "B": B,
                      "warm_readback_s": round(t_warm, 1),
                      "fence_baseline_s": round(timing.fence_baseline(), 4)}),
          flush=True)

    # 0. raw while_loop overhead: 30 iterations of elementwise work
    @jax.jit
    def loop_only(x):
        def body(s):
            i, v = s
            return i + 1, v * 1.0001 + 0.001
        return jax.lax.while_loop(lambda s: s[0] < 30, body, (jnp.int32(0), x))[1]

    emit_row(rows, "while30_elementwise",
             lambda: bench(loop_only, jnp.ones((B, 3))), B, args.save)

    # 0b. gather microbench: 30 gather-steps from a small node-like table
    tbl = jnp.arange(64 * 3, dtype=jnp.float32).reshape(64, 3)

    @jax.jit
    def loop_gather(idx):
        def body(s):
            i, ix, acc = s
            v = tbl[ix]  # (B,3) gather from 64-row table
            ix = (ix + v[:, 0].astype(jnp.int32)) % 64
            return i + 1, ix, acc + v[:, 1]
        return jax.lax.while_loop(lambda s: s[0] < 30, body,
                                  (jnp.int32(0), idx, jnp.zeros((B,))))[2]

    emit_row(rows, "while30_gather64",
             lambda: bench(loop_gather, lane % 64), B, args.save)

    # 1. RNG + camera ray generation
    @jax.jit
    def gen(seed):
        rng = qmc.make_state("pcg", seed, lane, 0)
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        return o, d, rng

    emit_row(rows, "camera_rng", lambda: bench(gen, jnp.uint32(1)), B, args.save)
    o, d, rng = gen(jnp.uint32(1))

    # 2. brute-force closest hit (41 prims, dense (B,N) sweep)
    emit_row(rows, "brute_hit", lambda: bench(
        jax.jit(lambda o, d: isect.closest_hit_brute(scene.geom, o, d)["t"]),
        o, d), B, args.save)

    # 3. BVH gather-walk closest hit
    emit_row(rows, "bvh_hit", lambda: bench(
        jax.jit(lambda o, d: traverse.closest_hit_bvh(
            scene.geom, scene.bvh, o, d)["t"]), o, d), B, args.save)

    # 3b. Pallas packet-kernel closest hit (the on-chip sweep winner)
    def _pallas_hit():
        from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

        return bench(jax.jit(lambda o, d: tk.traverse_pallas(
            scene.geom, scene.bvh, o, d)["t"]), o, d)

    emit_row(rows, "pallas_hit", _pallas_hit, B, args.save)

    # 3c. matmul-form brute force on the MXU
    from cuda_pt_tpu.ops import intersect_mxu

    emit_row(rows, "mxu_hit", lambda: bench(
        jax.jit(lambda o, d: intersect_mxu.closest_hit_mxu(
            scene.geom, o, d)["t"]), o, d), B, args.save)

    # 4. emitter NEE sample alone
    hit = jax.jit(lambda o, d: traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d))(o, d)
    p = o + hit["t"][:, None] * d
    n = -d

    emit_row(rows, "sample_emitter", lambda: bench(
        jax.jit(lambda p, n, rng: emitters.sample_emitter(
            scene, p, n, rng)[0]["dir"]), p, n, rng), B, args.save)

    # 5. BSDF eval + sample alone (full masked family dispatch)
    bid = jnp.zeros((B,), jnp.int32)
    uv = jnp.zeros((B, 2), jnp.float32)

    @jax.jit
    def bsdf_only(rng):
        ctx = bsdf_eval.make_ctx(scene, bid, uv, n)
        f, pdf = bsdf_eval.eval_bsdf(ctx, -d, n)
        bs, rng = bsdf_eval.sample_bsdf(ctx, -d, rng)
        return f + bs["weight"], pdf + bs["pdf"]

    emit_row(rows, "bsdf_eval_sample", lambda: bench(bsdf_only, rng), B,
             args.save)

    # 6. occlusion walk alone
    tfar = jnp.full((B,), 1.5, jnp.float32)
    emit_row(rows, "occlusion_bvh", lambda: bench(
        jax.jit(lambda p, rng: traverse.occlusion_bvh(
            scene.geom, scene.bvh, p, d, tfar)), p, rng), B, args.save)

    # 7. one full bounce (intersect + shade) and a full 5-bounce trace
    @jax.jit
    def bounce_once(o, d, rng):
        s = pt.init_state(o, d, rng)
        return pt.pt_bounce(scene, md, True, s).L

    emit_row(rows, "bounce_full", lambda: bench(bounce_once, o, d, rng), B,
             args.save)

    @jax.jit
    def trace5(o, d, rng):
        return pt.trace_paths(scene, md, o, d, rng, True)

    emit_row(rows, "trace_depth5", lambda: bench(trace5, o, d, rng), B,
             args.save)

    # 8. same trace through brute-force traversal
    @jax.jit
    def trace5_brute(o, d, rng):
        return pt.trace_paths(scene, md, o, d, rng, False)

    emit_row(rows, "trace_depth5_brute",
             lambda: bench(trace5_brute, o, d, rng), B, args.save)

    # 9. the full trace through the Pallas packet kernel and the MXU brute
    for impl in ("pallas", "mxu"):
        sc = scene.replace(traversal=impl)

        @jax.jit
        def trace5_impl(o, d, rng, sc=sc):
            return pt.trace_paths(sc, md, o, d, rng, True)

        emit_row(rows, f"trace_depth5_{impl}",
                 lambda f=trace5_impl: bench(f, o, d, rng), B, args.save)

    if args.save:
        Path(args.save).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
