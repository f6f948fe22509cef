"""On-chip microbench: per-lane dynamic gather (take_along_axis axis=-1).

Mosaic lowers jnp.take_along_axis along the 128-lane minor dim
(tpu.DynamicGatherOp). If it is cheap (~1-2 vector ops) it replaces the
fused kernel's per-candidate attribute where-chain (~20 vector ops PER
PRIM) with ~20 gathers PER LEAF — the round-5 big-tree lever.

Measures, per (R, 128) tile shape:
  e0: baseline kernel (copy + 2 adds)
  g1: baseline + 1 lane-gather from a broadcast (1, 128) row
  g14: baseline + 14 lane-gathers (a full attr fetch)
  w14x8: the status quo: 8 prims x 14 where-selects (112 ops)
Also checks gather == numpy take_along_axis bit-exactly on chip.

Usage: python scripts/exp_lanegather.py  (single TPU child; TUNNEL.md rules)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from cuda_pt_tpu.utils import timing

    def emit(r):
        print(json.dumps(r), flush=True)

    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    R = 64  # 8192-lane tile
    REPS = 512  # iterations inside the kernel to swamp launch overhead

    def make(body_fn):
        def kern(x_ref, row_ref, idx_ref, o_ref):
            x = x_ref[:]
            row = row_ref[:]
            idx = idx_ref[:]

            def it(_, acc):
                return body_fn(acc, row, idx)

            o_ref[:] = jax.lax.fori_loop(0, REPS, it, x)

        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((R, 128), lambda: (0, 0)),
                pl.BlockSpec((1, 128), lambda: (0, 0)),
                pl.BlockSpec((R, 128), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )

    def base(acc, row, idx):
        return acc * 1.000001 + 0.5

    def g_n(n):
        def body(acc, row, idx):
            rb = jnp.broadcast_to(row, (R, 128))
            for i in range(n):
                g = jnp.take_along_axis(rb, (idx + i) % 128, axis=1)
                acc = acc + g
            return acc

        return body

    def w_n(n):
        # status quo analogue: n where-selects from broadcast scalars
        def body(acc, row, idx):
            for i in range(n):
                acc = jnp.where(idx == i, acc + 1.0, acc)
            return acc

        return body

    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.normal(size=(R, 128)).astype(np.float32))
    row = jnp.asarray(rs.normal(size=(1, 128)).astype(np.float32))
    idx = jnp.asarray(rs.integers(0, 128, size=(R, 128)).astype(np.int32))

    # correctness: single gather vs numpy
    def kern_chk(row_ref, idx_ref, o_ref):
        rb = jnp.broadcast_to(row_ref[:], (R, 128))
        o_ref[:] = jnp.take_along_axis(rb, idx_ref[:], axis=1)

    chk = pl.pallas_call(
        kern_chk,
        in_specs=[pl.BlockSpec((1, 128), lambda: (0, 0)),
                  pl.BlockSpec((R, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((R, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
    )
    got = np.asarray(jax.jit(chk)(row, idx))
    want = np.take_along_axis(
        np.broadcast_to(np.asarray(row), (R, 128)), np.asarray(idx), axis=1)
    emit({"check": "gather_bit_exact", "ok": bool(np.array_equal(got, want))})

    results = {}
    for name, body in [("e0", base), ("g1", g_n(1)), ("g4", g_n(4)),
                       ("g14", g_n(14)), ("w14", w_n(14)),
                       ("w112", w_n(112))]:
        f = jax.jit(make(body))
        dt = timing.timeit(f, x, row, idx, reps=5)
        per_iter_ns = dt / REPS * 1e9
        results[name] = per_iter_ns
        emit({"tag": name, "per_iter_ns": round(per_iter_ns, 1)})

    if "g1" in results and "e0" in results:
        emit({"summary": "per-gather ns",
              "g1_minus_e0": round(results["g1"] - results["e0"], 1),
              "g14_minus_e0_per": round(
                  (results["g14"] - results["e0"]) / 14, 1),
              "w112_minus_e0_per": round(
                  (results["w112"] - results["e0"]) / 112, 1)})


if __name__ == "__main__":
    main()
