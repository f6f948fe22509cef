"""Fused Pallas TPU megakernel: the ENTIRE path-trace loop in one kernel.

This is the true TPU-native analogue of the reference's render_pt_kernel
(src/pt_impl/megakernel_pt.cu:32-201): one kernel owns a (R, 128) ray tile
and runs the full bounce loop — BVH walk, NEE with shadow-ray walk, MIS,
lambertian shading, Russian roulette, pcg2d RNG — entirely in VMEM/registers.
The XLA-composed path (models/path_tracer.py) pays ~60 ns/lane/bounce of
inter-op glue because its (B, 3) state arrays put the 3-vector in the
128-lane minor dimension (~2.4% VPU lane utilization, measured — docs/
TUNNEL.md); in-kernel every quantity is a full (R, 128) vector or a scalar
broadcast, so the VPU runs at full lane width with zero HBM state traffic
between bounces.

Estimator parity: identical draw order, MIS weights (power heuristic),
throughput-RR (clip(max_thp, 0.1, 1) after bounce 1), last-bounce NEE
weighting, per-lobe diffuse cap, and shadow-ray offsets as the XLA
megakernel (models/path_tracer.pt_bounce) — images agree to fp tolerance
(tests/test_pallas_megakernel.py).

Scene envelope (megakernel_ok): lambertian + specular-mirror BSDFs,
untextured area + point emitters (≤ 7), no envmap / media / ToF / spot emitters, scene fits
VMEM whole, ≤ 56 emitter prims. Scenes outside the envelope use the
composed path; cornell-class scenes (the reference's bread-and-butter
megakernel target) are squarely inside.

Mosaic rules obeyed throughout (learned on silicon in r2, see
traverse_kernel.py): dynamic SUBLANE slices only, masked-reduction scalar
extraction, logical blends instead of arith.select on i1 vectors, bitcasts
on vectors only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene import types as T
from . import traverse_kernel as tk

# Rays per packet/program. Swept on-chip (cornell 256^2x4spp depth 5):
# 512 -> 14.9, 1024 -> 29.8, 2048 -> 56, 4096 -> 96.6, 8192 -> 148,
# 16384 -> 149, 32768 -> 131 Mrays/s, 65536 fails Mosaic (VMEM). The grid
# runs programs SEQUENTIALLY on the single TensorCore, so bigger tiles
# amortize the per-node scalar walk over more lanes until VMEM pressure
# bites. trace_megakernel shrinks the tile for small batches.
TILE = 8192
SLOTS = tk.SLOTS
SLOT_F = tk.SLOT_F
HIT_EPS = tk.HIT_EPS
_INV_PI = 0.3183098861837907
_TWO_PI = 6.283185307179586
_INV_U32 = 2.3283064365386963e-10
MAX_EMITTERS = 8  # slots in the single emitter row (slot 0 = null)
MAX_EMITTER_PRIMS = 56  # 7 rows of 8 slots


def megakernel_ok(scene: T.Scene, md=None) -> bool:
    """Static envelope check (host-side, concrete arrays)."""
    import numpy as np

    if not tk.scene_fits_vmem(scene.geom, scene.bvh):
        return False
    if set(scene.present_bsdfs) - {T.BSDF_LAMBERTIAN, T.BSDF_SPECULAR}:
        return False
    et = np.asarray(scene.emitters.etype)
    if et.shape[0] > MAX_EMITTERS:
        return False
    ok_types = {T.EMITTER_NULL, T.EMITTER_AREA, T.EMITTER_POINT}
    if set(int(x) for x in et) - ok_types:
        return False
    if int(np.asarray(scene.env_emitter)) > 0:
        return False
    if np.asarray(scene.emitters.tex_id).max(initial=-1) >= 0:
        return False
    if np.asarray(scene.bsdfs.tex_ids).max(initial=-1) >= 0:
        return False
    if np.asarray(scene.objects.medium_in).max(initial=-1) >= 0:
        return False
    if md is not None and (md.max_time > 0.0):
        return False
    # emitter prim slots: one per (emitter, k) with k < its prim count
    n_eprims = 0
    cdf = np.asarray(scene.emitters.prim_cdf)
    sel = np.asarray(scene.emitters.prim_sel)
    for e in range(et.shape[0]):
        if et[e] == T.EMITTER_AREA:
            k = _real_k(cdf[e], sel[e])
            n_eprims += k
    if n_eprims > MAX_EMITTER_PRIMS:
        return False
    if np.asarray(scene.geom.is_sphere)[np.asarray(scene.emitters.prim_sel).ravel()].any():
        # sphere emitter prims: sampling matches, but keep v1 envelope tight
        return False
    return True


def _real_k(cdf_row, sel_row) -> int:
    """Number of real prim entries in a (K,) cdf row (padding repeats the
    last prim with cdf 1.0)."""
    import numpy as np

    K = cdf_row.shape[0]
    k = K
    # padding entries: cdf == 1.0 AND sel repeats the previous entry
    while k > 1 and cdf_row[k - 2] >= 1.0 and sel_row[k - 1] == sel_row[k - 2]:
        k -= 1
    return k


def pack_attrs(scene: T.Scene) -> jnp.ndarray:
    """Per-prim shading attributes, 1 slot x 16 fields (packed like prims):
    n0(3) n1(3) n2(3) kd(3) eid inv_area_obj btype — captured scalar-wise during
    the leaf test, the in-kernel analogue of surface_interaction +
    make_ctx's gathers."""
    g = scene.geom
    obj = g.obj_idx
    bid = jnp.maximum(scene.objects.bsdf_id[obj], 0)
    kd = scene.bsdfs.k_d[bid]
    eid = scene.objects.emitter_id[obj].astype(jnp.float32)
    inv_a = scene.objects.inv_area[obj]
    btype = scene.bsdfs.btype[bid].astype(jnp.float32)
    return tk._pack_rows(
        [
            g.n0[:, 0], g.n0[:, 1], g.n0[:, 2],
            g.n1[:, 0], g.n1[:, 1], g.n1[:, 2],
            g.n2[:, 0], g.n2[:, 1], g.n2[:, 2],
            kd[:, 0], kd[:, 1], kd[:, 2],
            eid, inv_a, btype,
        ],
        [0.0] * 9 + [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    )


def pack_emitters(scene: T.Scene) -> jnp.ndarray:
    """(1, 128) row, 8 slots x 16 fields per emitter:
    etype, em_r, em_g, em_b (emission*scaler), pos(3), sel_pmf, sel_cdf,
    kmax (real prim count - 1)."""
    import numpy as np

    e = scene.emitters
    E = int(np.asarray(e.etype).shape[0])
    em = np.asarray(e.emission) * np.asarray(e.scaler)[:, None]
    cdfs = np.asarray(e.prim_cdf)
    sels = np.asarray(e.prim_sel)
    kmax = np.array(
        [max(_real_k(cdfs[i], sels[i]) - 1, 0) for i in range(E)], np.float32
    )
    cols = [
        np.asarray(e.etype, np.float32),
        em[:, 0], em[:, 1], em[:, 2],
        np.asarray(e.pos)[:, 0], np.asarray(e.pos)[:, 1], np.asarray(e.pos)[:, 2],
        np.asarray(e.sel_pmf, np.float32),
        np.asarray(e.sel_cdf, np.float32),
        kmax,
    ]
    out = []
    for c in cols:
        out.append(np.concatenate([np.asarray(c, np.float32),
                                   np.zeros(MAX_EMITTERS - E, np.float32)]))
    # padding emitters: etype 0 (null), cdf 1.0 so they never get selected
    out[8][E:] = 1.0
    while len(out) < SLOT_F:
        out.append(np.zeros(MAX_EMITTERS, np.float32))
    return jnp.asarray(
        np.stack(out, axis=1).reshape(1, MAX_EMITTERS * SLOT_F), jnp.float32
    )


def pack_emitter_prims(scene: T.Scene) -> jnp.ndarray:
    """(rows, 128) emitter-prim slots, 8/row x 16 fields:
    p0(3) e1(3) e2(3) cdf eid k_local inv_area_obj — the NEE prim-CDF
    selection table, walked with masked scalar loops in-kernel."""
    import numpy as np

    g = scene.geom
    e = scene.emitters
    et = np.asarray(e.etype)
    cdfs = np.asarray(e.prim_cdf)
    sels = np.asarray(e.prim_sel)
    p0 = np.asarray(g.p0)
    e1 = np.asarray(g.e1)
    e2 = np.asarray(g.e2)
    inv_area = np.asarray(scene.objects.inv_area)
    obj_of = np.asarray(g.obj_idx)
    rows = []
    for eid in range(et.shape[0]):
        if et[eid] != T.EMITTER_AREA:
            continue
        k_real = _real_k(cdfs[eid], sels[eid])
        for k in range(k_real):
            prim = int(sels[eid, k])
            rows.append(
                [p0[prim, 0], p0[prim, 1], p0[prim, 2],
                 e1[prim, 0], e1[prim, 1], e1[prim, 2],
                 e2[prim, 0], e2[prim, 1], e2[prim, 2],
                 float(cdfs[eid, k]), float(eid), float(k),
                 float(inv_area[obj_of[prim]])]
            )
    S = len(rows)
    Sp = max(-(-max(S, 1) // SLOTS) * SLOTS, SLOTS)
    arr = np.zeros((Sp, SLOT_F), np.float32)
    for i, r in enumerate(rows):
        arr[i, : len(r)] = r
    # padding slots: cdf 2.0 (never < u), eid -1 (never matches)
    arr[S:, 9] = 2.0
    arr[S:, 10] = -1.0
    return jnp.asarray(arr.reshape(Sp // SLOTS, SLOTS * SLOT_F))


def _f(row, idx):
    return tk._field(row, idx)


def _pcg2d(x, y):
    """One pcg2d round on u32 vectors (core/rng.py:28-42, same constants)."""
    c1 = jnp.uint32(1664525)
    c2 = jnp.uint32(1013904223)
    x = x * c1 + c2
    y = y * c1 + c2
    x = x + y * c1
    y = y + x * c2
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    x = x + y * c1
    y = y + x * c2
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    return x, y


def _u01(x):
    """u32 → [0,1) f32. Mosaic has no u32→f32 cast; split into 16-bit
    halves (exactly representable after an i32 bitcast) and recombine —
    hi*2^16 is exact in f32, so the single rounding matches a direct
    u32→f32 convert bit-for-bit."""
    hi = jax.lax.bitcast_convert_type(x >> 16, jnp.int32).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        x & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    return (hi * 65536.0 + lo) * _INV_U32


def _kernel(max_depth, max_diffuse, max_specular, max_leaf, rn, n_eslots,
            nodes, prims, attrs, erow, eprims,
            ox, oy, oz, dx, dy, dz, r0, r1,
            out_r, out_g, out_b):
    o_x0, o_y0, o_z0 = ox[:], oy[:], oz[:]
    d_x0, d_y0, d_z0 = dx[:], dy[:], dz[:]
    sx0, sy0 = r0[:], r1[:]
    shape = o_x0.shape
    f0 = jnp.zeros(shape, jnp.float32)
    f1 = jnp.ones(shape, jnp.float32)

    M_pad = rn * SLOTS

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < 1e-8,
                               jnp.where(v < 0, -1e-8, 1e-8), v)

    # ---------------- BVH walks (adapted from traverse_kernel._kernel) ----
    def walk_closest(o_x, o_y, o_z, d_x, d_y, d_z, live):
        """Closest hit + in-leaf attribute capture for lanes where ``live``.
        Dead lanes register no box hits, so a tile whose lanes have all
        died skips every leaf body (the packet-level compaction analogue).
        Returns a dict of (R, 128) vectors."""
        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        init = (jnp.int32(0), jnp.full(shape, jnp.inf), f0 - 1.0,  # t, prim
                f0, f0,  # b1, b2 (unused downstream but kept for parity)
                f0, f0, f0,  # ns (or sphere center)
                f0, f0, f1,  # ng
                f0, f0, f0,  # kd
                f0,  # eid
                f0,  # inv_area
                f0,  # is_sphere
                f0)  # btype

        def cond(cr):
            return cr[0] < M_pad

        def body(cr):
            (ptr, t_best, prim, b1, b2, nsx, nsy, nsz, ngx, ngy, ngz,
             kdr, kdg, kdb, eidv, inva, sphv, btv) = cr
            row = nodes[pl.ds(ptr // SLOTS, 1), :]
            sb = (ptr % SLOTS) * SLOT_F
            lo_x = _f(row, sb + 0)
            lo_y = _f(row, sb + 1)
            lo_z = _f(row, sb + 2)
            hi_x = _f(row, sb + 3)
            hi_y = _f(row, sb + 4)
            hi_z = _f(row, sb + 5)
            skip = _f(row, sb + 6).astype(jnp.int32)
            base = _f(row, sb + 7).astype(jnp.int32)
            cnt = _f(row, sb + 8).astype(jnp.int32)

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
            box_hit = (tn <= tf) & (tf > HIT_EPS) & (tn < t_best) & live
            any_hit = jnp.any(box_hit)
            is_leaf = cnt > 0

            def do_leaf(carry):
                (t_best, prim, b1, b2, nsx, nsy, nsz, ngx, ngy, ngz,
                 kdr, kdg, kdb, eidv, inva, sphv, btv) = carry
                for k in range(max_leaf):
                    pid = base + k
                    prow = prims[pl.ds(pid // SLOTS, 1), :]
                    arow = attrs[pl.ds(pid // SLOTS, 1), :]
                    pb = (pid % SLOTS) * SLOT_F
                    ax = _f(prow, pb + 0)
                    ay = _f(prow, pb + 1)
                    az = _f(prow, pb + 2)
                    ux = _f(prow, pb + 3)
                    uy = _f(prow, pb + 4)
                    uz = _f(prow, pb + 5)
                    vx = _f(prow, pb + 6)
                    vy = _f(prow, pb + 7)
                    vz = _f(prow, pb + 8)
                    is_sph = _f(prow, pb + 9) > 0.0

                    hx = d_y * vz - d_z * vy
                    hy = d_z * vx - d_x * vz
                    hz = d_x * vy - d_y * vx
                    a = ux * hx + uy * hy + uz * hz
                    fdet = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
                    sxx = o_x - ax
                    syy = o_y - ay
                    szz = o_z - az
                    u = fdet * (sxx * hx + syy * hy + szz * hz)
                    qx = syy * uz - szz * uy
                    qy = szz * ux - sxx * uz
                    qz = sxx * uy - syy * ux
                    v = fdet * (d_x * qx + d_y * qy + d_z * qz)
                    t_tri = fdet * (vx * qx + vy * qy + vz * qz)
                    tri_ok = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t_tri > HIT_EPS))

                    ocx = o_x - ax
                    ocy = o_y - ay
                    ocz = o_z - az
                    bh = ocx * d_x + ocy * d_y + ocz * d_z
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - ux * ux
                    disc = bh * bh - cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0s = -bh - sq
                    t1s = -bh + sq
                    t_sph = jnp.where(t0s > HIT_EPS, t0s, t1s)
                    sph_ok = (disc > 0.0) & (t_sph > HIT_EPS)

                    t_k = jnp.where(is_sph, t_sph, t_tri)
                    shape_ok = (is_sph & sph_ok) | (~is_sph & tri_ok)
                    ok = shape_ok & (k < cnt) & (t_k < t_best)

                    # scalar attrs of this prim
                    n0x = _f(arow, pb + 0)
                    n0y = _f(arow, pb + 1)
                    n0z = _f(arow, pb + 2)
                    n1x = _f(arow, pb + 3)
                    n1y = _f(arow, pb + 4)
                    n1z = _f(arow, pb + 5)
                    n2x = _f(arow, pb + 6)
                    n2y = _f(arow, pb + 7)
                    n2z = _f(arow, pb + 8)
                    kr = _f(arow, pb + 9)
                    kg = _f(arow, pb + 10)
                    kb = _f(arow, pb + 11)
                    eid_s = _f(arow, pb + 12)
                    ia_s = _f(arow, pb + 13)
                    bt_s = _f(arow, pb + 14)

                    # interpolated shading normal (tri) / center (sphere)
                    w0 = 1.0 - u - v
                    nx_i = jnp.where(is_sph, ax, w0 * n0x + u * n1x + v * n2x)
                    ny_i = jnp.where(is_sph, ay, w0 * n0y + u * n1y + v * n2y)
                    nz_i = jnp.where(is_sph, az, w0 * n0z + u * n1z + v * n2z)
                    # geometric normal (tri): cross(e1, e2), normalized scalar
                    gx = uy * vz - uz * vy
                    gy = uz * vx - ux * vz
                    gz = ux * vy - uy * vx
                    gl = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-20)
                    gx, gy, gz = gx * gl, gy * gl, gz * gl

                    gid = _f(prow, pb + 10)
                    t_best = jnp.where(ok, t_k, t_best)
                    prim = jnp.where(ok, gid, prim)
                    b1 = jnp.where(ok, jnp.where(is_sph, 0.0, u), b1)
                    b2 = jnp.where(ok, jnp.where(is_sph, 0.0, v), b2)
                    nsx = jnp.where(ok, nx_i, nsx)
                    nsy = jnp.where(ok, ny_i, nsy)
                    nsz = jnp.where(ok, nz_i, nsz)
                    ngx = jnp.where(ok, gx, ngx)
                    ngy = jnp.where(ok, gy, ngy)
                    ngz = jnp.where(ok, gz, ngz)
                    kdr = jnp.where(ok, kr, kdr)
                    kdg = jnp.where(ok, kg, kdg)
                    kdb = jnp.where(ok, kb, kdb)
                    eidv = jnp.where(ok, eid_s, eidv)
                    inva = jnp.where(ok, ia_s, inva)
                    sphv = jnp.where(ok, jnp.where(is_sph, 1.0, 0.0), sphv)
                    btv = jnp.where(ok, bt_s, btv)
                return (t_best, prim, b1, b2, nsx, nsy, nsz, ngx, ngy, ngz,
                        kdr, kdg, kdb, eidv, inva, sphv, btv)

            leaf_carry = (t_best, prim, b1, b2, nsx, nsy, nsz, ngx, ngy, ngz,
                          kdr, kdg, kdb, eidv, inva, sphv, btv)
            leaf_out = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                    lambda c: c, leaf_carry)
            ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
            return (ptr_next,) + leaf_out

        out = jax.lax.while_loop(cond, body, init)
        (_, t_best, prim, b1, b2, nsx, nsy, nsz, ngx, ngy, ngz,
         kdr, kdg, kdb, eidv, inva, sphv, btv) = out
        return {
            "t": t_best, "hit": prim >= 0.0,
            "nsx": nsx, "nsy": nsy, "nsz": nsz,
            "ngx": ngx, "ngy": ngy, "ngz": ngz,
            "kdr": kdr, "kdg": kdg, "kdb": kdb,
            "eid": eidv, "inva": inva, "sph": sphv, "btype": btv,
        }

    def walk_anyhit(o_x, o_y, o_z, d_x, d_y, d_z, t_lim, need):
        """Shadow test: True where a hit closer than t_lim*(1-1e-3) exists.
        Lanes with need=False never register hits (t_lim <= 0 sentinel)."""
        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        t_gate = jnp.where(need, t_lim * (1.0 - 1e-3), -1.0)
        # occluded carried as f32 0/1: bool vectors in while-carries are the
        # Mosaic-risky pattern (traverse_kernel history)
        init = (jnp.int32(0), f0)

        def cond(cr):
            ptr, occf = cr
            return (ptr < M_pad) & jnp.any((occf < 0.5) & need)

        def body(cr):
            ptr, occf = cr
            occ = occf > 0.5
            row = nodes[pl.ds(ptr // SLOTS, 1), :]
            sb = (ptr % SLOTS) * SLOT_F
            lo_x = _f(row, sb + 0)
            lo_y = _f(row, sb + 1)
            lo_z = _f(row, sb + 2)
            hi_x = _f(row, sb + 3)
            hi_y = _f(row, sb + 4)
            hi_z = _f(row, sb + 5)
            skip = _f(row, sb + 6).astype(jnp.int32)
            base = _f(row, sb + 7).astype(jnp.int32)
            cnt = _f(row, sb + 8).astype(jnp.int32)

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
            box_hit = (tn <= tf) & (tf > HIT_EPS) & (tn < t_gate) & ~occ
            any_hit = jnp.any(box_hit)
            is_leaf = cnt > 0

            def do_leaf(occf):
                # occluded flag carried as f32 through the cond too: Mosaic
                # cannot legalize scf.if with i1-vector operands/results
                occ2 = occf > 0.5
                for k in range(max_leaf):
                    pid = base + k
                    prow = prims[pl.ds(pid // SLOTS, 1), :]
                    pb = (pid % SLOTS) * SLOT_F
                    ax = _f(prow, pb + 0)
                    ay = _f(prow, pb + 1)
                    az = _f(prow, pb + 2)
                    ux = _f(prow, pb + 3)
                    uy = _f(prow, pb + 4)
                    uz = _f(prow, pb + 5)
                    vx = _f(prow, pb + 6)
                    vy = _f(prow, pb + 7)
                    vz = _f(prow, pb + 8)
                    is_sph = _f(prow, pb + 9) > 0.0

                    hx = d_y * vz - d_z * vy
                    hy = d_z * vx - d_x * vz
                    hz = d_x * vy - d_y * vx
                    a = ux * hx + uy * hy + uz * hz
                    fdet = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
                    sxx = o_x - ax
                    syy = o_y - ay
                    szz = o_z - az
                    u = fdet * (sxx * hx + syy * hy + szz * hz)
                    qx = syy * uz - szz * uy
                    qy = szz * ux - sxx * uz
                    qz = sxx * uy - syy * ux
                    v = fdet * (d_x * qx + d_y * qy + d_z * qz)
                    t_tri = fdet * (vx * qx + vy * qy + vz * qz)
                    tri_ok = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t_tri > HIT_EPS))
                    ocx = o_x - ax
                    ocy = o_y - ay
                    ocz = o_z - az
                    bh = ocx * d_x + ocy * d_y + ocz * d_z
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - ux * ux
                    disc = bh * bh - cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0s = -bh - sq
                    t1s = -bh + sq
                    t_sph = jnp.where(t0s > HIT_EPS, t0s, t1s)
                    sph_ok = (disc > 0.0) & (t_sph > HIT_EPS)
                    t_k = jnp.where(is_sph, t_sph, t_tri)
                    shape_ok = (is_sph & sph_ok) | (~is_sph & tri_ok)
                    occ2 = occ2 | (shape_ok & (k < cnt) & (t_k < t_gate))
                return jnp.where(occ2, 1.0, 0.0)

            occf2 = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                 lambda o: o, occf)
            ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
            return ptr_next, occf2

        return jax.lax.while_loop(cond, body, init)[1] > 0.5

    # ---------------- emitter table helpers -------------------------------
    erow_v = erow[:]  # (1, 128)

    def emitter_fields(idx):
        """Scalar fields of emitter slot idx (static int)."""
        sb = idx * SLOT_F
        return {
            "etype": _f(erow_v, sb + 0),
            "em": (_f(erow_v, sb + 1), _f(erow_v, sb + 2), _f(erow_v, sb + 3)),
            "pos": (_f(erow_v, sb + 4), _f(erow_v, sb + 5), _f(erow_v, sb + 6)),
            "pmf": _f(erow_v, sb + 7),
            "cdf": _f(erow_v, sb + 8),
            "kmax": _f(erow_v, sb + 9),
        }

    efields = [emitter_fields(i) for i in range(n_eslots)]

    def emitter_lookup(eid_vec):
        """Per-lane (em_rgb, pmf, etype, pos, kmax) via masked scalar loop."""
        em_r = em_g = em_b = pmf = ety = px = py = pz = kmx = f0
        for i, ef in enumerate(efields):
            m = eid_vec == float(i)
            em_r = jnp.where(m, ef["em"][0], em_r)
            em_g = jnp.where(m, ef["em"][1], em_g)
            em_b = jnp.where(m, ef["em"][2], em_b)
            pmf = jnp.where(m, ef["pmf"], pmf)
            ety = jnp.where(m, ef["etype"], ety)
            px = jnp.where(m, ef["pos"][0], px)
            py = jnp.where(m, ef["pos"][1], py)
            pz = jnp.where(m, ef["pos"][2], pz)
            kmx = jnp.where(m, ef["kmax"], kmx)
        return em_r, em_g, em_b, pmf, ety, px, py, pz, kmx

    n_eprim_rows = eprims.shape[0]

    # ---------------- the bounce loop --------------------------------------
    def bounce_cond(cr):
        return (cr[0] < max_depth) & jnp.any(cr[15] > 0.5)

    def bounce_body(cr):
        (bounce, sx, sy, o_x, o_y, o_z, d_x, d_y, d_z,
         tr, tg, tb, Lr, Lg, Lb, act, prev_pdf, prev_delta, n_diff,
         n_spec) = cr

        hit = walk_closest(o_x, o_y, o_z, d_x, d_y, d_z, act > 0.5)
        hit_ok = hit["hit"] & (act > 0.5)
        t_safe = jnp.where(hit_ok, hit["t"], 1.0)
        px_ = o_x + t_safe * d_x
        py_ = o_y + t_safe * d_y
        pz_ = o_z + t_safe * d_z

        # normals: sphere → (p - c)/|p - c| for both; tri → interp ns, ng
        is_sph = hit["sph"] > 0.5
        spx = px_ - hit["nsx"]
        spy = py_ - hit["nsy"]
        spz = pz_ - hit["nsz"]
        sl = jax.lax.rsqrt(spx * spx + spy * spy + spz * spz + 1e-20)
        nl_ = jax.lax.rsqrt(hit["nsx"] * hit["nsx"] + hit["nsy"] * hit["nsy"]
                            + hit["nsz"] * hit["nsz"] + 1e-20)
        nsx = jnp.where(is_sph, spx * sl, hit["nsx"] * nl_)
        nsy = jnp.where(is_sph, spy * sl, hit["nsy"] * nl_)
        nsz = jnp.where(is_sph, spz * sl, hit["nsz"] * nl_)
        # flip ng into the shading hemisphere (intersect.py:140)
        gdot = hit["ngx"] * nsx + hit["ngy"] * nsy + hit["ngz"] * nsz
        gsign = jnp.where(gdot < 0.0, -1.0, 1.0)
        ngx = jnp.where(is_sph, nsx, hit["ngx"] * gsign)
        ngy = jnp.where(is_sph, nsy, hit["ngy"] * gsign)
        ngz = jnp.where(is_sph, nsz, hit["ngz"] * gsign)

        # ---- emitter-hit MIS ------------------------------------------
        eid_hit = hit["eid"]
        cos_l = -(d_x * ngx + d_y * ngy + d_z * ngz)
        hem_r, hem_g, hem_b, hpmf, _, _, _, _, _ = emitter_lookup(eid_hit)
        pdf_l = hpmf * hit["inva"] * (t_safe * t_safe) / jnp.maximum(cos_l, 1e-6)
        rmis = pdf_l / jnp.maximum(prev_pdf, 1e-12)
        w_hit = jnp.where(prev_delta > 0.5, 1.0,
                          jnp.where(prev_pdf > 0.0,
                                    1.0 / (1.0 + rmis * rmis), 0.0))
        emit_m = hit_ok & (eid_hit > 0.5) & (cos_l > 1e-6)
        emw = jnp.where(emit_m, w_hit, 0.0)
        Lr = Lr + tr * hem_r * emw
        Lg = Lg + tg * hem_g * emw
        Lb = Lb + tb * hem_b * emw

        # ---- NEE draws (same order as pt_bounce) -----------------------
        sx, sy = _pcg2d(sx, sy)
        u_sel = _u01(sx)
        sx, sy = _pcg2d(sx, sy)
        u_prim = _u01(sx)
        sx, sy = _pcg2d(sx, sy)
        u_pos0, u_pos1 = _u01(sx), _u01(sy)

        # emitter choice by sel_cdf (emitters.py:108-111)
        eid_sel = f0
        for ef in efields:
            eid_sel = eid_sel + jnp.where(ef["cdf"] < u_sel, 1.0, 0.0)
        eid_sel = jnp.clip(eid_sel, 1.0, float(n_eslots - 1))
        (sem_r, sem_g, sem_b, spmf, setype, spx_, spy_, spz_,
         skmax) = emitter_lookup(eid_sel)
        sel_pdf = jnp.maximum(spmf, 1e-12)

        # area prim pick: count slots of this emitter with cdf < u_prim
        cnt_k = f0
        for si in range(n_eprim_rows * SLOTS):
            row = eprims[pl.ds(si // SLOTS, 1), :]
            sb = (si % SLOTS) * SLOT_F
            s_cdf = _f(row, sb + 9)
            s_eid = _f(row, sb + 10)
            cnt_k = cnt_k + jnp.where(
                (s_eid == eid_sel) & (s_cdf < u_prim), 1.0, 0.0)
        kidx = jnp.minimum(cnt_k, skmax)

        # fetch the selected slot's triangle, sample a point
        su = jnp.sqrt(jnp.maximum(u_pos0, 0.0))
        bb1 = 1.0 - su
        bb2 = u_pos1 * su
        lx = ly = lz = lnx = lny = lnz = f0
        linva = f0
        for si in range(n_eprim_rows * SLOTS):
            row = eprims[pl.ds(si // SLOTS, 1), :]
            sb = (si % SLOTS) * SLOT_F
            s_eid = _f(row, sb + 10)
            s_k = _f(row, sb + 11)
            take = (s_eid == eid_sel) & (s_k == kidx)
            p0x = _f(row, sb + 0)
            p0y = _f(row, sb + 1)
            p0z = _f(row, sb + 2)
            e1x = _f(row, sb + 3)
            e1y = _f(row, sb + 4)
            e1z = _f(row, sb + 5)
            e2x = _f(row, sb + 6)
            e2y = _f(row, sb + 7)
            e2z = _f(row, sb + 8)
            s_ia = _f(row, sb + 12)
            cxn = e1y * e2z - e1z * e2y
            cyn = e1z * e2x - e1x * e2z
            czn = e1x * e2y - e1y * e2x
            cl = jax.lax.rsqrt(cxn * cxn + cyn * cyn + czn * czn + 1e-20)
            lx = jnp.where(take, p0x + bb1 * e1x + bb2 * e2x, lx)
            ly = jnp.where(take, p0y + bb1 * e1y + bb2 * e2y, ly)
            lz = jnp.where(take, p0z + bb1 * e1z + bb2 * e2z, lz)
            lnx = jnp.where(take, cxn * cl, lnx)
            lny = jnp.where(take, cyn * cl, lny)
            lnz = jnp.where(take, czn * cl, lnz)
            linva = jnp.where(take, s_ia, linva)

        tlx = lx - px_
        tly = ly - py_
        tlz = lz - pz_
        ldist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        inv_ld = 1.0 / jnp.maximum(ldist, 1e-8)
        ldx = tlx * inv_ld
        ldy = tly * inv_ld
        ldz = tlz * inv_ld
        lcos = -(ldx * lnx + ldy * lny + ldz * lnz)
        front = lcos > 1e-6
        pdf_area = sel_pdf * linva * (ldist * ldist) / jnp.maximum(lcos, 1e-6)

        # point source branch
        tpx = spx_ - px_
        tpy = spy_ - py_
        tpz = spz_ - pz_
        pdist = jnp.sqrt(tpx * tpx + tpy * tpy + tpz * tpz)
        inv_pd = 1.0 / jnp.maximum(pdist, 1e-8)
        inv_r2 = 1.0 / jnp.maximum(pdist * pdist, 1e-8)

        is_point = setype == float(T.EMITTER_POINT)
        es_dx = jnp.where(is_point, tpx * inv_pd, ldx)
        es_dy = jnp.where(is_point, tpy * inv_pd, ldy)
        es_dz = jnp.where(is_point, tpz * inv_pd, ldz)
        es_dist = jnp.where(is_point, pdist, ldist)
        le_r = jnp.where(is_point, sem_r * inv_r2, sem_r)
        le_g = jnp.where(is_point, sem_g * inv_r2, sem_g)
        le_b = jnp.where(is_point, sem_b * inv_r2, sem_b)
        es_pdf = jnp.where(is_point, sel_pdf, pdf_area)
        le_max = jnp.maximum(le_r, jnp.maximum(le_g, le_b))
        es_valid = ((is_point | front) & (setype != float(T.EMITTER_NULL))
                    & (le_max > 0.0) & (es_pdf > 1e-12))

        # lambertian f·cos and pdf toward the light (nl = ns flipped to wo)
        wo_dot_n = -(d_x * nsx + d_y * nsy + d_z * nsz)
        nsign = jnp.where(wo_dot_n < 0.0, -1.0, 1.0)
        nlx = nsx * nsign
        nly = nsy * nsign
        nlz = nsz * nsign
        is_spec = hit["btype"] == float(T.BSDF_SPECULAR)
        cos_i = es_dx * nlx + es_dy * nly + es_dz * nlz
        cos_ic = jnp.maximum(cos_i, 0.0)
        # specular mirrors: eval_bsdf returns f=0, pdf=0 (delta lobe)
        ffac = jnp.where(is_spec, 0.0, _INV_PI * cos_ic)
        f_r = hit["kdr"] * ffac
        f_g = hit["kdg"] * ffac
        f_b = hit["kdb"] * ffac
        bpdf = jnp.where(is_spec, 0.0, cos_ic * _INV_PI)

        # shadow walk (offsets: path_tracer.py:317-322)
        gdir = ngx * es_dx + ngy * es_dy + ngz * es_dz
        osign = jnp.where(gdir < 0.0, -1.0, jnp.where(gdir > 0.0, 1.0, 0.0))
        sh_ox = px_ + ngx * osign * 1e-3
        sh_oy = py_ + ngy * osign * 1e-3
        sh_oz = pz_ + ngz * osign * 1e-3
        sh_dist = es_dist - jnp.abs(gdir) * 1e-3
        need = hit_ok & es_valid
        occ = walk_anyhit(sh_ox, sh_oy, sh_oz, es_dx, es_dy, es_dz,
                          sh_dist, need)

        last_bounce = bounce >= (max_depth - 1)
        rn_ = bpdf / jnp.maximum(es_pdf, 1e-12)
        w_nee_ph = jnp.where(es_pdf > 0.0, 1.0 / (1.0 + rn_ * rn_), 0.0)
        w_nee = jnp.where(is_point | last_bounce, 1.0, w_nee_ph)
        f_max = jnp.maximum(f_r, jnp.maximum(f_g, f_b))
        nee_ok = need & ~occ & (f_max > 0.0)
        scale = jnp.where(nee_ok, w_nee / jnp.maximum(es_pdf, 1e-12), 0.0)
        Lr = Lr + tr * f_r * le_r * scale
        Lg = Lg + tg * f_g * le_g * scale
        Lb = Lb + tb * f_b * le_b * scale

        # ---- BSDF sample: cosine hemisphere (draw order eval.py:276-278) -
        sx, sy = _pcg2d(sx, sy)
        u_d0, u_d1 = _u01(sx), _u01(sy)
        sx, sy = _pcg2d(sx, sy)  # u_lobe (unused for lambertian)
        sx, sy = _pcg2d(sx, sy)  # u_wl (unused)

        phi = _TWO_PI * u_d0
        cth = jnp.sqrt(jnp.maximum(1.0 - u_d1, 0.0))
        sth = jnp.sqrt(jnp.maximum(u_d1, 0.0))
        loc_x = sth * jnp.cos(phi)
        loc_y = sth * jnp.sin(phi)
        # ONB of nl (math.py:59-72, Duff/Frisvad)
        bsig = jnp.where(nlz >= 0.0, 1.0, -1.0)
        aon = -1.0 / (bsig + nlz)
        bon = nlx * nly * aon
        t1x = 1.0 + bsig * nlx * nlx * aon
        t1y = bsig * bon
        t1z = -bsig * nlx
        t2x = bon
        t2y = bsig + nly * nly * aon
        t2z = -nly
        wix = loc_x * t1x + loc_y * t2x + cth * nlx
        wiy = loc_x * t1y + loc_y * t2y + cth * nly
        wiz = loc_x * t1z + loc_y * t2z + cth * nlz
        bs_pdf = jnp.maximum(cth, 1e-6) * _INV_PI
        # specular lanes: mirror reflection wi = normalize(d - 2(d.nl)nl)
        # (bsdf/eval.py wi_spec); weight stays kd, is_delta = 1; bs_pdf
        # keeps the cosine value, matching the XLA table default (unused
        # downstream because prev_delta forces MIS weight 1)
        dn = d_x * nlx + d_y * nly + d_z * nlz
        wmx = d_x - 2.0 * dn * nlx
        wmy = d_y - 2.0 * dn * nly
        wmz = d_z - 2.0 * dn * nlz
        wml = jax.lax.rsqrt(wmx * wmx + wmy * wmy + wmz * wmz + 1e-20)
        wix = jnp.where(is_spec, wmx * wml, wix)
        wiy = jnp.where(is_spec, wmy * wml, wiy)
        wiz = jnp.where(is_spec, wmz * wml, wiz)

        # throughput *= kd (weight = kd for cosine-sampled lambertian)
        tr2 = tr * hit["kdr"]
        tg2 = tg * hit["kdg"]
        tb2 = tb * hit["kdb"]

        # new origin offset along ng toward wi
        gdir2 = ngx * wix + ngy * wiy + ngz * wiz
        osign2 = jnp.where(gdir2 < 0.0, -1.0, jnp.where(gdir2 > 0.0, 1.0, 0.0))
        o_x2 = px_ + ngx * osign2 * 1e-3
        o_y2 = py_ + ngy * osign2 * 1e-3
        o_z2 = pz_ + ngz * osign2 * 1e-3

        # per-lobe caps (path_tracer.py:365-372)
        n_diff2 = n_diff + jnp.where(hit_ok & ~is_spec, 1.0, 0.0)
        n_spec2 = n_spec + jnp.where(hit_ok & is_spec, 1.0, 0.0)
        depth_ok = (n_diff2 <= float(max_diffuse)) & (
            n_spec2 <= float(max_specular))

        # RR (throughput rule, pt_bounce fixed_rr=False)
        max_thp = jnp.maximum(tr2, jnp.maximum(tg2, tb2))
        sx, sy = _pcg2d(sx, sy)
        u_rr = _u01(sx)
        do_rr = bounce >= 1
        p_surv = jnp.where(do_rr, jnp.clip(max_thp, 0.1, 1.0), 1.0)
        survive = u_rr < p_surv
        inv_ps = 1.0 / p_surv
        tr2 = tr2 * inv_ps
        tg2 = tg2 * inv_ps
        tb2 = tb2 * inv_ps

        act2 = hit_ok & depth_ok & survive & (max_thp > 0.0)
        actf = jnp.where(act2, 1.0, 0.0)
        tr2 = tr2 * actf
        tg2 = tg2 * actf
        tb2 = tb2 * actf
        prev_pdf2 = jnp.where(act2, bs_pdf, prev_pdf)
        prev_delta2 = jnp.where(act2, jnp.where(is_spec, 1.0, 0.0),
                                prev_delta)

        return (bounce + 1, sx, sy, o_x2, o_y2, o_z2, wix, wiy, wiz,
                tr2, tg2, tb2, Lr, Lg, Lb, actf, prev_pdf2, prev_delta2,
                n_diff2, n_spec2)

    init = (jnp.int32(0), sx0, sy0, o_x0, o_y0, o_z0, d_x0, d_y0, d_z0,
            f1, f1, f1, f0, f0, f0, f1, f1, f1, f0, f0)
    out = jax.lax.while_loop(bounce_cond, bounce_body, init)
    out_r[:] = out[12]
    out_g[:] = out[13]
    out_b[:] = out[14]


# Global interpret default (CPU tests flip it), mirroring traverse_kernel.
INTERPRET = False


def make_pack(scene: T.Scene) -> dict:
    """Host-side scene pack for the fused kernel (concrete arrays required:
    the emitter packing inspects CDF padding with numpy). The result is a
    plain pytree of arrays + the static max_leaf — safe to pass THROUGH jit
    boundaries, so callers build it once and close over / thread it."""
    return {
        "nodes": tk.pack_nodes(scene.bvh),
        "prims": tk.pack_prims(scene.geom),
        "attrs": pack_attrs(scene),
        "erow": pack_emitters(scene),
        "eprims": pack_emitter_prims(scene),
    }


def trace_megakernel(pack: dict, md, o, d, rng, max_leaf: int = 4,
                     interpret=None, tile: int | None = None):
    """Full in-kernel trace: (B, 3) rays + (B, 2) u32 pcg states → L (B, 3).

    pack: make_pack(scene) (scene must pass megakernel_ok)."""
    if interpret is None:
        interpret = INTERPRET
    if tile is None:
        tile = TILE
    B = o.shape[0]
    # shrink to the batch (multiple of 1024 keeps R a sublane multiple of 8)
    tile = max(min(tile, -(-B // 1024) * 1024), 1024)
    pad = (-B) % tile
    Bp = B + pad
    R = tile // 128
    T_ = Bp // tile

    nodes = pack["nodes"]
    prims = pack["prims"]
    attrs = pack["attrs"]
    erow = pack["erow"]
    eprims = pack["eprims"]
    rn = nodes.shape[0]

    def prep(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    o_p, d_p, rng_p = prep(o), prep(d), prep(rng)

    def c2(x, j):
        return x[..., j].reshape(T_, R, 128)

    ray_spec = pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    args = (nodes, prims, attrs, erow, eprims,
            c2(o_p, 0), c2(o_p, 1), c2(o_p, 2),
            c2(d_p, 0), c2(d_p, 1), c2(d_p, 2),
            c2(rng_p, 0), c2(rng_p, 1))
    in_specs = [full_spec(nodes), full_spec(prims), full_spec(attrs),
                full_spec(erow), full_spec(eprims)] + [ray_spec] * 8
    out_specs = (ray_spec, ray_spec, ray_spec)
    out_shape = tuple(
        jax.ShapeDtypeStruct((T_, R, 128), jnp.float32) for _ in range(3)
    )
    kern = functools.partial(
        _kernel, int(md.max_depth), int(md.max_diffuse),
        int(md.max_specular), int(max_leaf), rn, MAX_EMITTERS,
    )
    lr, lg, lb = pl.pallas_call(
        kern,
        grid=(T_,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    L = jnp.stack([lr.reshape(-1)[:B], lg.reshape(-1)[:B],
                   lb.reshape(-1)[:B]], axis=-1)
    return L


def render_pack(pack: dict, cam, md, spp: int, seed, max_leaf: int = 4,
                interpret=None):
    """spp-pass fused render from a prebuilt pack → (H, W, 3). Jittable in
    (pack, seed); same per-(pixel, sample) pcg streams as
    models/path_tracer.render."""
    from ...core import camera as cam_mod
    from ...core import qmc

    B = cam.width * cam.height
    lane = jnp.arange(B, dtype=jnp.int32)

    def body(i, acc):
        rng = qmc.make_state("pcg", seed, lane, i)
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        L = trace_megakernel(pack, md, o, d, rng, max_leaf=max_leaf,
                             interpret=interpret)
        return acc + L

    acc = jax.lax.fori_loop(0, spp, body, jnp.zeros((B, 3), jnp.float32))
    return (acc / spp).reshape(cam.height, cam.width, 3)


def render_megakernel(scene: T.Scene, cam, md, spp: int, seed: int = 0,
                      sampler: str = "pcg", interpret=None):
    """Convenience wrapper: packs the (concrete) scene, then renders.
    sampler='pcg' only — Sobol state is 4-wide and stays on the composed
    path."""
    assert sampler == "pcg", "fused megakernel supports the pcg sampler"
    pack = make_pack(scene)
    return render_pack(pack, cam, md, spp, seed,
                       max_leaf=int(scene.bvh.max_leaf), interpret=interpret)
