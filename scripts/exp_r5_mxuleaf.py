"""Standalone Pallas prototype: MXU leaf triangle test vs scalar-extract.

The fused walk's dominant cost is per-candidate leaf work: ~80 VPU ops x
8 prims x (R,128) lanes per leaf pop (~2.7 us). Moller-Trumbore is
BILINEAR in (per-ray features, per-tri constants):

  feat f = [ (o x d), d, o, 1 ]                                (10,)
  det   = dot(f, [0, -n, 0, 0])          n = e1 x e2
  u_num = dot(f, [e2, a x e2, 0, 0])
  v_num = dot(f, [-e1, e1 x a, 0, 0])
  t_num = dot(f, [0, 0, n, -a.n])

so ONE dot_general (32, 10) @ (10, R, 128) -> (32, R, 128) per leaf
computes all 4 values x 8 prims for every lane. This prototype checks:
(a) Mosaic accepts the 3D-rhs dot_general at f32-highest precision,
(b) numerical parity vs the direct per-prim formulas,
(c) on-chip cost per leaf-equivalent of both variants.

Writes EXP_R5_MXULEAF.json.  Run: python scripts/exp_r5_mxuleaf.py
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

R = 32  # 4096 lanes
NLEAF = 2000  # leaf pops per kernel call (amortizes launch overhead)
NP8 = 8  # prims per leaf


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cuda_pt_tpu.utils import timing

    out_path = REPO / "EXP_R5_MXULEAF.json"
    rows = []

    def emit(r):
        rows.append(r)
        print(json.dumps(r), flush=True)
        out_path.write_text(json.dumps(rows, indent=1))

    t0 = time.time()
    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    rs = np.random.default_rng(0)
    # synthetic rays + tris
    o_np = rs.uniform(-1, 1, (R, 128, 3)).astype(np.float32)
    d_np = rs.normal(size=(R, 128, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    M = NLEAF * NP8
    a_np = rs.uniform(-1, 1, (M, 3)).astype(np.float32)
    e1_np = rs.uniform(-0.5, 0.5, (M, 3)).astype(np.float32)
    e2_np = rs.uniform(-0.5, 0.5, (M, 3)).astype(np.float32)

    # prim rows for the scalar variant: 9 fields x 14/row (t9-like, but
    # 8 aligned per row here for simplicity: 8 x 9 = 72 lanes)
    prow = np.zeros((NLEAF, 128), np.float32)
    fields = np.concatenate([a_np, e1_np, e2_np], -1).reshape(NLEAF, NP8 * 9)
    prow[:, :NP8 * 9] = fields

    # coef rows for the MXU variant: (M*4, 16) padded feature dim
    n_np = np.cross(e1_np, e2_np)
    axe2 = np.cross(a_np, e2_np)
    e1xa = np.cross(e1_np, a_np)
    coef = np.zeros((M, 4, 16), np.float32)
    coef[:, 0, 3:6] = -n_np                        # det
    coef[:, 1, 0:3] = e2_np                        # u_num
    coef[:, 1, 3:6] = axe2
    coef[:, 2, 0:3] = -e1_np                       # v_num
    coef[:, 2, 3:6] = e1xa
    coef[:, 3, 6:9] = n_np                         # t_num
    coef[:, 3, 9] = -np.sum(a_np * n_np, -1)
    coef = coef.reshape(NLEAF, NP8 * 4, 16)        # (NLEAF, 32, 16)

    def feat_planes(o, d):
        ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        return [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx,
                dx, dy, dz, ox, oy, oz, jnp.ones_like(ox)]

    # ---------------- scalar-extract kernel (current style) -----------
    def _f(row, idx):
        return row[0, idx]

    def kern_scalar(prows, o1, o2, o3, d1, d2, d3, out):
        ox, oy, oz = o1[:], o2[:], o3[:]
        dx, dy, dz = d1[:], d2[:], d3[:]

        def leaf(lf, t_best):
            row = prows[pl.ds(lf, 1), :]
            for k in range(NP8):
                pb = k * 9
                ax = _f(row, pb + 0)
                ay = _f(row, pb + 1)
                az = _f(row, pb + 2)
                ux = _f(row, pb + 3)
                uy = _f(row, pb + 4)
                uz = _f(row, pb + 5)
                vx = _f(row, pb + 6)
                vy = _f(row, pb + 7)
                vz = _f(row, pb + 8)
                hx = dy * vz - dz * vy
                hy = dz * vx - dx * vz
                hz = dx * vy - dy * vx
                aa = ux * hx + uy * hy + uz * hz
                fdet = 1.0 / jnp.where(jnp.abs(aa) < 1e-12, 1e-12, aa)
                sx = ox - ax
                sy = oy - ay
                sz = oz - az
                u = fdet * (sx * hx + sy * hy + sz * hz)
                qx = sy * uz - sz * uy
                qy = sz * ux - sx * uz
                qz = sx * uy - sy * ux
                v = fdet * (dx * qx + dy * qy + dz * qz)
                t = fdet * (vx * qx + vy * qy + vz * qz)
                ok = ((jnp.abs(aa) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t > 1e-4))
                t_best = jnp.where(ok & (t < t_best), t, t_best)
            return t_best

        out[:] = jax.lax.fori_loop(0, NLEAF, leaf,
                                   jnp.full((R, 128), jnp.inf))

    # ---------------- MXU kernel --------------------------------------
    def kern_mxu(coefs, o1, o2, o3, d1, d2, d3, out):
        ox, oy, oz = o1[:], o2[:], o3[:]
        dx, dy, dz = d1[:], d2[:], d3[:]
        f1 = jnp.ones((R, 128), jnp.float32)
        f0 = jnp.zeros((R, 128), jnp.float32)
        planes = [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx,
                  dx, dy, dz, ox, oy, oz, f1] + [f0] * 6
        feat = jnp.stack(planes, axis=0)  # (16, R, 128)

        def leaf(lf, t_best):
            lhs = coefs[pl.ds(lf * 32, 32), :]  # (32, 16)
            outm = jax.lax.dot_general(
                lhs, feat, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)  # (32, R, 128)
            for k in range(NP8):
                det = outm[4 * k]
                u_n = outm[4 * k + 1]
                v_n = outm[4 * k + 2]
                t_n = outm[4 * k + 3]
                fdet = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                u = fdet * u_n
                v = fdet * v_n
                t = fdet * t_n
                ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t > 1e-4))
                t_best = jnp.where(ok & (t < t_best), t, t_best)
            return t_best

        out[:] = jax.lax.fori_loop(0, NLEAF, leaf,
                                   jnp.full((R, 128), jnp.inf))

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    o_j = [jnp.asarray(o_np[..., i]) for i in range(3)]
    d_j = [jnp.asarray(d_np[..., i]) for i in range(3)]

    def run(tag, kern, table):
        try:
            call = pl.pallas_call(
                kern,
                in_specs=[spec] * 7,
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )
            f = jax.jit(lambda tb: call(tb, *o_j, *d_j))
            res = np.asarray(f(table))
            dt = timing.timeit(f, table, reps=5)
            emit({"variant": tag, "sec": round(dt, 5),
                  "ns_per_leaf": round(dt / NLEAF * 1e9, 1),
                  "ns_per_prim_lane": round(
                      dt / (NLEAF * NP8 * R * 128) * 1e12, 2),
                  "checksum": float(np.where(np.isfinite(res), res,
                                             0.0).sum())})
            return res
        except Exception as e:  # noqa: BLE001
            emit({"variant": tag, "error": repr(e)[:400]})
            return None

    r_s = run("scalar", kern_scalar, jnp.asarray(prow))
    r_m = run("mxu", kern_mxu,
              jnp.asarray(coef.reshape(NLEAF * 32, 16)))
    if r_s is not None and r_m is not None:
        fin = np.isfinite(r_s) & np.isfinite(r_m)
        agree = np.isclose(r_s[fin], r_m[fin], rtol=2e-4, atol=1e-5)
        both_inf = (~np.isfinite(r_s) & ~np.isfinite(r_m))
        emit({"check": "parity",
              "finite_frac": float(fin.mean()),
              "agree_frac": float(agree.mean()),
              "hitmask_match": float((np.isfinite(r_s)
                                      == np.isfinite(r_m)).mean()),
              "both_inf_frac": float(both_inf.mean())})

    emit({"event": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
