"""A/B: scalar-field extraction strategies for the fused walk's hot loop.

ROOFLINE.json measured c_node ~= 239 ns per serial node iteration at
tile 4096 — suspected to be dominated by `_field`'s masked-SUM reduction
(one full cross-lane reduction PER FIELD: 9 per node + jnp.any = 10
reductions per iteration, ~40 more per leaf entry).

Variants timed here (same walk semantics, bunny tree, live chip):
  v0_field   current: 9x masked-sum `_field` + jnp.any
  v1_roll    one dynamic pltpu.roll per node -> fields at static lanes,
             broadcast via static (1,1) slice; skip/base/cnt + any still
             via reductions (4 total)
  v2_roll1   v1 + static vector->scalar extracts for skip/base/cnt
             (rolled[0, k]) -> 1 reduction per iteration (the any())
  v3_ilp2/4  v2 replicated over K independent pointers per iteration
             (ILP over the dependent fetch chain)

Each variant returns a checksum accumulating tn over box hits; v1/v2 must
match v0 bit-for-bit (same walk order). Writes EXP_EXTRACT_AB.json.

Run: PYTHONPATH=. python scripts/exp_extract_ab.py
"""
from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.utils import timing

SLOTS = tk.SLOTS
SLOT_F = tk.SLOT_F


def _roll_row(row, sb):
    """Rotate (1,128) row so field ``sb`` lands at lane 0."""
    return pltpu.roll(row, (128 - sb) % 128, axis=1)


def _bcast(rolled, k, shape):
    """Static-lane field k of a rolled row as a scalar (Mosaic supports
    static vector->scalar extract; scalar->vector splat is free). The
    (1,1)->tile broadcast is NOT implemented ('Broadcast in both sublanes
    and lanes'), so scalars are the legal path."""
    del shape
    return rolled[0, k]


def _make_kernel(variant, n_iters, rn, n_ptr=1):
    def kern(nodes, ox, oy, oz, dx, dy, dz, out):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        shape = o_x.shape

        def safe_inv(v):
            return 1.0 / jnp.where(jnp.abs(v) < 1e-8,
                                   jnp.where(v < 0, -1e-8, 1e-8), v)

        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        M_pad = rn * SLOTS

        # ---- decomposition probes (e0..e3): cost floor of one iteration
        if variant.startswith("e"):
            def body(cr):
                i, ptr, acc = cr
                if variant == "e0":          # loop + ptr arithmetic only
                    lo_x = jnp.float32(0.1) * ptr.astype(jnp.float32)
                    acc = acc + lo_x
                    ptr_next = jnp.where(ptr + 1 >= M_pad, 0, ptr + 1)
                else:
                    row = nodes[pl.ds(ptr // SLOTS, 1), :]
                    sb = (ptr % SLOTS) * SLOT_F
                    if variant == "e1":      # + row fetch, 1 reduction
                        v = tk._field(row, sb)
                        acc = acc + v
                        ptr_next = jnp.where(ptr + 1 >= M_pad, 0, ptr + 1)
                    elif variant == "e2":    # + 9 reductions
                        f = [tk._field(row, sb + i2) for i2 in range(9)]
                        acc = acc + sum(f)
                        ptr_next = jnp.where(ptr + 1 >= M_pad, 0, ptr + 1)
                    else:                    # e3: fetch + slab + any, 1 red
                        lo_x = tk._field(row, sb)
                        tx0 = (lo_x - o_x) * ix
                        ty0 = (lo_x - o_y) * iy
                        tz0 = (lo_x - o_z) * iz
                        tn = jnp.maximum(jnp.maximum(tx0, ty0), tz0)
                        hit = tn < 1e30
                        anyh = jnp.any(hit)
                        acc = acc + jnp.where(hit, tn, 0.0)
                        ptr_next = jnp.where(anyh, ptr + 1, ptr + 2)
                        ptr_next = jnp.where(ptr_next >= M_pad, 0, ptr_next)
                return i + 1, ptr_next, acc

            def cond(cr):
                return cr[0] < n_iters

            _, _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0),
                             jnp.zeros(shape, jnp.float32)))
            out[:] = acc
            return

        def fetch_v0(ptr):
            row = nodes[pl.ds(ptr // SLOTS, 1), :]
            sb = (ptr % SLOTS) * SLOT_F
            f = [tk._field(row, sb + i) for i in range(9)]
            return f

        def fetch_w2(ptr):
            """Two consecutive slots' fields in one pass (wide-2 probe:
            18 reductions off one row fetch)."""
            row = nodes[pl.ds(ptr // SLOTS, 1), :]
            sb = (ptr % SLOTS) * SLOT_F
            f = [tk._field(row, sb + i) for i in range(9)]
            g = [tk._field(row, (sb + SLOT_F) % 128 + i) for i in range(9)]
            return f, g

        def fetch_roll(ptr):
            row = nodes[pl.ds(ptr // SLOTS, 1), :]
            sb = (ptr % SLOTS) * SLOT_F
            rolled = _roll_row(row, sb)
            box = [_bcast(rolled, i, shape) for i in range(6)]
            if variant == "v1":
                ints = [tk._field(row, sb + i) for i in (6, 7, 8)]
            else:
                ints = [rolled[0, i] for i in (6, 7, 8)]
            return box + ints, rolled

        def step(ptr, t_best, acc):
            if variant == "w2":
                f, g = fetch_w2(ptr)
            elif variant == "v0":
                f = fetch_v0(ptr)
            else:
                f, _ = fetch_roll(ptr)
            lo_x, lo_y, lo_z, hi_x, hi_y, hi_z = f[:6]
            skip = f[6].astype(jnp.int32)
            cnt = f[8]
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
            if variant == "w2":
                lo2 = g[0]
                tx2 = (lo2 - o_x) * ix
                ty2 = (g[1] - o_y) * iy
                tz2 = (g[2] - o_z) * iz
                tn2 = jnp.maximum(jnp.maximum(tx2, ty2), tz2)
                tf2 = jnp.minimum(jnp.minimum((g[3] - o_x) * ix,
                                              (g[4] - o_y) * iy),
                                  (g[5] - o_z) * iz)
                hit2 = (tn2 <= tf2) & (tf2 > 1e-4) & (tn2 < t_best)
                box_hit = box_hit | hit2
                acc = acc + jnp.where(hit2, tn2, 0.0)
            any_hit = jnp.any(box_hit)
            is_leaf = cnt > 0.0
            ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
            ptr_next = jnp.where(ptr_next >= M_pad, 0, ptr_next)
            acc = acc + jnp.where(box_hit, tn, 0.0)
            return ptr_next, acc

        if n_ptr == 1:
            def body(cr):
                i, ptr, t_best, acc = cr
                ptr_next, acc = step(ptr, t_best, acc)
                return i + 1, ptr_next, t_best, acc

            def cond(cr):
                return cr[0] < n_iters

            _, _, _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0),
                             jnp.full(shape, 1e30), jnp.zeros(shape,
                                                              jnp.float32)))
        else:
            # K independent pointers advanced per iteration, staggered
            # start offsets (ILP probe; checksum differs from v0 — walk
            # coverage differs, timing is what matters here)
            def body(cr):
                i, ptrs, t_best, acc = cr
                new_ptrs = []
                for k in range(n_ptr):
                    p2, acc = step(ptrs[k], t_best, acc)
                    new_ptrs.append(p2)
                return i + 1, tuple(new_ptrs), t_best, acc

            def cond(cr):
                return cr[0] < n_iters

            init_ptrs = tuple(jnp.int32(k * 7) for k in range(n_ptr))
            _, _, _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), init_ptrs,
                             jnp.full(shape, 1e30), jnp.zeros(shape,
                                                              jnp.float32)))
        out[:] = acc
    return kern


def time_variant(variant, nodes, tile, n_iters, n_ptr=1):
    R = tile // 128
    rn = nodes.shape[0]
    rays = [jnp.ones((1, R, 128), jnp.float32) * v
            for v in (0.1, 0.2, 0.3, 0.5, 0.6, 0.7)]
    spec = pl.BlockSpec((1, R, 128), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec(nodes.shape, lambda: (0, 0),
                         memory_space=pltpu.VMEM)

    def run(n):
        kern = functools.partial(_make_kernel(variant, 0, rn, n_ptr))
        kern = _make_kernel(variant, n, rn, n_ptr)
        return pl.pallas_call(
            kern, in_specs=[nspec] + [spec] * 6, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, R, 128), jnp.float32),
        )(nodes, *rays)

    f_n = jax.jit(lambda: run(n_iters))
    f_h = jax.jit(lambda: run(n_iters // 2))
    out_n = jax.device_get(f_n())  # correctness payload
    t_n = timing.timeit(f_n, reps=5)
    t_h = timing.timeit(f_h, reps=5)
    per = (t_n - t_h) / (n_iters - n_iters // 2)
    return per, float(np.abs(out_n).sum())


def main():
    out_path = REPO / "EXP_EXTRACT_AB.json"
    rows = []

    def emit(r):
        rows.append(r)
        print(json.dumps(r), flush=True)
        out_path.write_text(json.dumps(rows, indent=1))

    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    from cuda_pt_tpu.scene.xml_parser import load_xml
    ps = load_xml("/root/reference/scene/xml/bunny.xml",
                  override_res=(128, 128))
    nodes = tk.pack_nodes(ps.scene.bvh)
    emit({"event": "tree", "node_rows": int(nodes.shape[0])})

    n_iters = 30000
    base_sum = None
    for tile in (8192,):
        for variant, n_ptr in (("e0", 1), ("e1", 1), ("e2", 1), ("e3", 1),
                               ("v0", 1), ("w2", 1),
                               ("v0", 2), ("v0", 4),
                               ("v2", 1), ("v2", 2)):
            tag = variant if n_ptr == 1 else f"{variant}_ilp{n_ptr}"
            try:
                per, chk = time_variant(variant, nodes, tile, n_iters,
                                        n_ptr)
                row = {"tile": tile, "variant": tag,
                       "c_node_ns": round(per * 1e9, 2),
                       "checksum": round(chk, 2)}
                if n_ptr == 1:
                    if variant == "v0":
                        base_sum = chk
                    elif base_sum is not None:
                        row["match_v0"] = bool(abs(chk - base_sum)
                                               < 1e-3 * max(1.0, base_sum))
                emit(row)
            except Exception as e:  # noqa: BLE001
                emit({"tile": tile, "variant": tag,
                      "error": str(e)[:300]})


if __name__ == "__main__":
    main()
