"""On-chip microbenchmarks for round-5 design decisions.

1. Pair-stream traversal economics: lax.sort / argsort+row-gather /
   scatter at ~2M elements — is re-binning (ray, treelet) pairs per
   bounce affordable vs the walk time it saves?
2. Grid-media lookup strategy: XLA per-lane gather from a density grid
   (SoA (B,) indices) vs a one-hot MXU contraction — which carries a
   fused/fast grid VPT?

Writes EXP_R5_MICRO.json.  Run: python scripts/exp_r5_micro.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_R5_MICRO.json"
    rows = []

    def emit(r):
        rows.append(r)
        print(json.dumps(r), flush=True)
        out_path.write_text(json.dumps(rows, indent=1))

    t0 = time.time()
    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    key = jax.random.PRNGKey(0)

    # ---- 1. sort / gather / scatter at pair scale --------------------
    for P in (262_144, 2_097_152):
        keys = jax.random.randint(key, (P,), 0, 64, dtype=jnp.int32)
        payload = jax.random.randint(key, (P,), 0, 1 << 30, jnp.int32)
        mat = jax.random.normal(key, (P, 32), jnp.float32)

        f_sort = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        dt = timing.timeit(f_sort, keys, payload, reps=5)
        emit({"bench": "lax_sort_i32_pair", "P": P, "sec": round(dt, 5),
              "ns_per_elem": round(dt / P * 1e9, 2)})

        f_arg = jax.jit(lambda k: jnp.argsort(k))
        dt = timing.timeit(f_arg, keys, reps=5)
        emit({"bench": "argsort_i32", "P": P, "sec": round(dt, 5),
              "ns_per_elem": round(dt / P * 1e9, 2)})

        perm = np.random.permutation(P)
        perm_j = jnp.asarray(perm, jnp.int32)
        f_g = jax.jit(lambda m, p: jnp.take(m, p, axis=0))
        dt = timing.timeit(f_g, mat, perm_j, reps=5)
        emit({"bench": "row_gather_32f", "P": P, "sec": round(dt, 5),
              "gb_s": round(P * 32 * 4 / dt / 1e9, 1),
              "ns_per_row": round(dt / P * 1e9, 2)})

        f_s = jax.jit(lambda m, p: jnp.zeros_like(m).at[p].set(m))
        dt = timing.timeit(f_s, mat, perm_j, reps=5)
        emit({"bench": "row_scatter_32f", "P": P, "sec": round(dt, 5),
              "gb_s": round(P * 32 * 4 / dt / 1e9, 1)})

        # segment-min reduce (pair results -> per-ray best): sorted
        # segment ids, jax.ops.segment_min
        nseg = P // 8
        seg = jnp.repeat(jnp.arange(nseg, dtype=jnp.int32), 8)
        vals = jax.random.normal(key, (P,), jnp.float32)
        f_r = jax.jit(lambda v, s: jax.ops.segment_min(
            v, s, num_segments=nseg, indices_are_sorted=True))
        dt = timing.timeit(f_r, vals, seg, reps=5)
        emit({"bench": "segment_min", "P": P, "sec": round(dt, 5),
              "ns_per_elem": round(dt / P * 1e9, 2)})

    # ---- 2. grid density lookup: XLA gather vs one-hot MXU -----------
    for N in (32_768, 262_144, 2_097_152):  # 32^3, 64^3, 128^3
        grid = jax.random.uniform(key, (N,), jnp.float32)
        idx = jax.random.randint(key, (262_144,), 0, N, jnp.int32)
        f_g = jax.jit(lambda g, i: jnp.take(g, i))
        dt = timing.timeit(f_g, grid, idx, reps=5)
        emit({"bench": "grid_gather_1f", "N": N, "B": 262_144,
              "sec": round(dt, 5),
              "ns_per_lookup": round(dt / 262_144 * 1e9, 2)})

        # trilinear: 8 corner gathers + weights (the real VPT cost)
        f_t = jax.jit(lambda g, i: sum(
            jnp.take(g, jnp.clip(i + o, 0, N - 1)) * 0.125
            for o in (0, 1, 64, 65, 4096, 4097, 4160, 4161)))
        dt = timing.timeit(f_t, grid, idx, reps=5)
        emit({"bench": "grid_trilinear_8g", "N": N, "B": 262_144,
              "sec": round(dt, 5),
              "ns_per_lookup": round(dt / 262_144 * 1e9, 2)})

    # one-hot MXU contraction at majorant-table scale (B=4096 tile)
    for N in (512, 4096, 32_768):
        tbl = jax.random.uniform(key, (N, 8), jnp.float32)
        idx = jax.random.randint(key, (4096,), 0, N, jnp.int32)

        def onehot_lookup(t, i, _N=N):
            oh = (i[:, None] == jnp.arange(_N)[None, :]).astype(jnp.float32)
            return oh @ t

        f_o = jax.jit(onehot_lookup)
        dt = timing.timeit(f_o, tbl, idx, reps=5)
        emit({"bench": "onehot_mxu_8f", "N": N, "B": 4096,
              "sec": round(dt, 6),
              "ns_per_lookup": round(dt / 4096 * 1e9, 2)})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
