"""Measured per-scene traversal-backend selection.

The packet-vs-gather decision is scene- AND backend-dependent
(PACKET_DIVERGENCE.json): on a 41-prim cornell the packet kernel reads ~500
node rows sequentially while the XLA loop issues 175k vector gathers (packet
wins); on whiskey the packet's any-lane-descends policy walks ~60% of the
tree per 512-ray tile (363k serial fetches vs 225 lockstep gather steps) —
which side is faster depends on the hardware's gather throughput. So we do
what XLA itself does for GEMM tilings: run both, time them, keep the winner.

The choice is stored as the STATIC ``Scene.traversal`` field, so downstream
jits retrace exactly when the decision changes (no module-global races).

Reference analogue: the CUDA build hand-tunes this once per architecture
(src/core/constants.cuh:40 profiled occupancy, tracing_func.cuh:115-116);
on TPU we measure per scene at load time instead — cost is two small jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam_mod
from ..core import rng as prng
from ..scene import types as T

_CACHE: dict[tuple, dict] = {}


def _probe_rays(scene: T.Scene, cam=None, n_rays: int = 4096):
    """Representative mix: camera primaries when a camera is given, plus a
    shuffled copy (stands in for post-bounce incoherence). Without a camera,
    deterministic inward rays from a sphere around the scene AABB."""
    n_rays = max(256, n_rays)
    if cam is not None:
        B = int(cam.width) * int(cam.height)
        lane = jnp.arange(n_rays, dtype=jnp.int32) % B
        state = prng.seed(jnp.uint32(123), lane.astype(jnp.uint32))
        o, d, _ = cam_mod.generate_rays(cam, lane, state)
    else:
        lo = np.asarray(scene.bvh.node_min[0])
        hi = np.asarray(scene.bvh.node_max[0])
        c, r = (lo + hi) / 2, float(np.linalg.norm(hi - lo)) * 0.75 + 1e-3
        rng = np.random.default_rng(123)
        u = rng.normal(size=(n_rays, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
        tgt = rng.uniform(lo, hi, size=(n_rays, 3))
        o = jnp.asarray(c + r * u, jnp.float32)
        dn = tgt - np.asarray(o)
        d = jnp.asarray(dn / (np.linalg.norm(dn, axis=1, keepdims=True) + 1e-12),
                        jnp.float32)
    perm = jnp.asarray(np.random.default_rng(7).permutation(n_rays))
    return jnp.concatenate([o, o[perm]]), jnp.concatenate([d, d[perm]])


def _scene_key(scene: T.Scene) -> tuple:
    return (
        jax.default_backend(),
        int(scene.geom.num_prims),
        int(scene.bvh.num_nodes),
        None if scene.forest is None else scene.forest.nodes.shape,
        None if scene.forest is None else scene.forest.node_fmt,
    )


def autotune_traversal(scene: T.Scene, cam=None, n_rays: int = 4096,
                       reps: int = 3, verbose: bool = False) -> dict:
    """Time each eligible traversal backend on this scene; return
    {"impl": best, "timings_ms": {impl: median}, "cached": bool}.

    Eligibility: "xla" always; "pallas" when the scene ships a forest or
    fits VMEM whole. A candidate that fails to compile (e.g. Pallas on a
    backend without Mosaic) is disqualified, not fatal. Assumes a healthy
    backend — run scripts/tpu_validate.py rung 1 first if the tunnel has
    been flaky."""
    from ..models import path_tracer as pt
    from ..ops.pallas import traverse_kernel as tk

    key = _scene_key(scene)
    if key in _CACHE:
        return dict(_CACHE[key], cached=True)

    candidates = ["xla", "wide", "wide_bf16"]
    if scene.forest is not None or tk.scene_fits_vmem(scene.geom, scene.bvh):
        candidates.append("pallas")
    # matmul-form brute force: O(B*P) MXU flops, no gather-dependent loop.
    # Eligible while the per-bounce contraction stays cheap (96 flops/pair).
    if int(scene.geom.num_prims) <= 8192:
        candidates.append("mxu")

    from . import wide_build

    wide = scene.wide
    if wide is None:
        wide = wide_build.from_bvharrays(scene.bvh)
    # bf16 variant: conservatively rounded boxes, half the node-gather bytes
    wide_bf16 = wide_build.from_bvharrays(scene.bvh, box_dtype="bf16")
    wide_of = {"wide": wide, "wide_bf16": wide_bf16}

    o, d = _probe_rays(scene, cam, n_rays)
    timings: dict[str, float] = {}
    for impl in candidates:
        sc = scene.replace(
            traversal="wide" if impl in wide_of else impl,
            wide=wide_of.get(impl, scene.wide),
        )

        def hot(s, o, d):
            res = pt.closest_hit(s, o, d, use_bvh=True)
            # include the any-hit path — NEE shadow rays are ~half the load
            occ = pt.occluded(s, o, d, res["t"], use_bvh=True)
            return res["t"], occ

        try:
            # readback-fenced (utils/timing): under the axon tunnel
            # block_until_ready returns at dispatch-accept, which made the
            # r2 autotuner rank candidates by tunnel latency, not compute
            from ..utils import timing

            f = jax.jit(hot)
            timings[impl] = timing.timeit(f, sc, o, d, reps=reps) * 1e3
        except Exception as e:  # noqa: BLE001 — disqualify, don't crash
            if verbose:
                print(f"[autotune] {impl} disqualified: {type(e).__name__}: {e}")
            timings[impl] = float("inf")

    best = min(timings, key=timings.get)
    if not np.isfinite(timings[best]):
        best = "xla"
    out = {"impl": best, "timings_ms": timings,
           "wide": wide_of.get(best, wide)}
    _CACHE[key] = out
    if verbose:
        print(f"[autotune] {key[0]}: {timings} -> {best}")
    return dict(out, cached=False)


def with_tuned_traversal(scene: T.Scene, cam=None, **kw) -> T.Scene:
    """Scene with ``traversal`` pinned to the measured winner (and the wide
    BVH — f32 or bf16 — attached when an 8-ary backend wins)."""
    res = autotune_traversal(scene, cam, **kw)
    if res["impl"].startswith("wide"):
        return scene.replace(wide=res["wide"], traversal="wide")
    return scene.replace(traversal=res["impl"])
