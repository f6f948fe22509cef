"""A/B experiment: 5-gather node loop vs single packed-row gather.

Hypothesis: fusing the per-step node gathers (min/max/skip/base/count) into
one (M, 9) f32 row — ints bitcast — cuts gather overhead in the hot
traversal loop; optionally also pack prim rows (N, 10).

Measured result (CPU backend, 128² primaries, min of 3):
  bunny   current 144 ms | packed-node 169 ms | packed-both 312 ms
  whiskey current 396 ms | packed-node 472 ms | packed-both 774 ms
→ NEGATIVE on CPU (gathers are cheap; extra materialization dominates).
Parity is exact (prim + t bit-identical). Queued for on-TPU re-measurement
(docs/ROADMAP.md #5) where per-gather overhead is the dominant term.

Run: PYTHONPATH=. python scripts/packed_gather_ab.py
"""
import jax
jax.config.update("jax_platforms", "cpu")
import time
import numpy as np
import jax.numpy as jnp
from cuda_pt_tpu.scene.xml_parser import load_xml
from cuda_pt_tpu.accel import traverse
from cuda_pt_tpu.ops import intersect as isect
from cuda_pt_tpu.core import rng as prng, camera as cam_mod


def closest_hit_packed(geom, bvh, o, d, max_leaf=None, pack_prims=True):
    if max_leaf is None:
        max_leaf = bvh.max_leaf
    B = o.shape[0]
    M = bvh.num_nodes
    N = geom.num_prims
    safe_d = jnp.where(jnp.abs(d) < 1e-8, jnp.where(d < 0, -1e-8, 1e-8), d)
    inv_d = 1.0 / safe_d
    karange = jnp.arange(max_leaf, dtype=jnp.int32)[None, :]

    packed = jnp.concatenate([
        bvh.node_min, bvh.node_max,
        jax.lax.bitcast_convert_type(bvh.node_skip.astype(jnp.int32), jnp.float32)[:, None],
        jax.lax.bitcast_convert_type(bvh.node_base.astype(jnp.int32), jnp.float32)[:, None],
        jax.lax.bitcast_convert_type(bvh.node_count.astype(jnp.int32), jnp.float32)[:, None],
    ], axis=1)  # (M, 9)
    pprim = jnp.concatenate([
        geom.p0, geom.e1, geom.e2, geom.is_sphere.astype(jnp.float32)[:, None]
    ], axis=1)  # (N, 10)

    zero = o[:, 0] * 0.0
    izero = zero.astype(jnp.int32)
    init = (izero, zero + jnp.inf, izero - 1, zero, zero)

    def cond(s):
        return jnp.any(s[0] < M)

    def body(s):
        ptr, t, prim, b1, b2 = s
        live = ptr < M
        pc = jnp.minimum(ptr, M - 1)
        row = packed[pc]  # (B, 9) one gather
        nmin, nmax = row[:, 0:3], row[:, 3:6]
        skip = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        base = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
        cnt = jax.lax.bitcast_convert_type(row[:, 8], jnp.int32)

        box_hit = traverse._slab(nmin, nmax, o, inv_d, t) & live
        is_leaf = cnt > 0
        do_leaf = box_hit & is_leaf
        ids = jnp.clip(base[:, None] + karange, 0, N - 1)
        valid = (karange < cnt[:, None]) & do_leaf[:, None]
        if pack_prims:
            prow = pprim[ids]  # (B, K, 10) one gather
            t_k, hit_k, b1_k, b2_k = isect_rows(prow, o, d, valid)
        else:
            t_k, hit_k, b1_k, b2_k = isect.intersect_gather(geom, o, d, ids, valid)
        t_k = jnp.where(hit_k & (t_k < t[:, None]), t_k, jnp.inf)
        k = jnp.argmin(t_k, axis=-1)
        ar = jnp.arange(B)
        t_new = t_k[ar, k]
        better = jnp.isfinite(t_new)
        ptr_next = jnp.where(box_hit & ~is_leaf, ptr + 1, skip)
        return (jnp.where(live, ptr_next, ptr),
                jnp.where(better, t_new, t),
                jnp.where(better, ids[ar, k], prim),
                jnp.where(better, b1_k[ar, k], b1),
                jnp.where(better, b2_k[ar, k], b2))

    ptr, t, prim, b1, b2 = jax.lax.while_loop(cond, body, init)
    return {"t": t, "prim": prim, "hit": prim >= 0, "b1": b1, "b2": b2}


def isect_rows(prow, o, d, valid):
    """Same MT math as intersect_gather but from packed (B,K,10) rows."""
    p0, e1, e2 = prow[..., 0:3], prow[..., 3:6], prow[..., 6:9]
    sph = prow[..., 9] > 0.5
    ob, db = o[:, None, :], d[:, None, :]
    h = jnp.cross(db, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    s = ob - p0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(db * q, axis=-1)
    t_tri = f * jnp.sum(e2 * q, axis=-1)
    tri_ok = ((jnp.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t_tri > isect.HIT_EPS))
    # sphere branch (mirror intersect_gather)
    oc = ob - p0
    r = e1[..., 0]
    bq = jnp.sum(oc * db, axis=-1)
    cq = jnp.sum(oc * oc, axis=-1) - r * r
    disc = bq * bq - cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0s, t1s = -bq - sq, -bq + sq
    t_sph = jnp.where(t0s > isect.HIT_EPS, t0s, t1s)
    sph_ok = (disc > 0) & (t_sph > isect.HIT_EPS)
    t_all = jnp.where(sph, t_sph, t_tri)
    ok = jnp.where(sph, sph_ok, tri_ok) & valid
    t_out = jnp.where(ok, t_all, jnp.inf)
    # barycentrics / sphere surrogate
    phit = ob + t_all[..., None] * db
    nrm = (phit - p0) / jnp.maximum(r, 1e-12)[..., None]
    theta = jnp.arccos(jnp.clip(nrm[..., 1], -1, 1))
    phi = jnp.arctan2(nrm[..., 2], nrm[..., 0])
    b1o = jnp.where(sph, theta, u)
    b2o = jnp.where(sph, phi, v)
    return t_out, ok, b1o, b2o


def bench(scene, cam, label):
    B = 128 * 128
    st = prng.seed(jnp.uint32(3), jnp.arange(B, dtype=jnp.uint32))
    o, d, _ = cam_mod.generate_rays(cam, jnp.arange(B, dtype=jnp.int32) % (cam.width * cam.height), st)
    f_cur = jax.jit(lambda o, d: traverse.closest_hit_bvh(scene.geom, scene.bvh, o, d))
    f_pk = jax.jit(lambda o, d: closest_hit_packed(scene.geom, scene.bvh, o, d, pack_prims=False))
    f_pk2 = jax.jit(lambda o, d: closest_hit_packed(scene.geom, scene.bvh, o, d, pack_prims=True))
    rc = f_cur(o, d); jax.block_until_ready(rc)
    rp = f_pk(o, d); jax.block_until_ready(rp)
    rp2 = f_pk2(o, d); jax.block_until_ready(rp2)
    for name, a, b in (("node-packed", rc, rp), ("node+prim-packed", rc, rp2)):
        same_prim = np.array_equal(np.asarray(a["prim"]), np.asarray(b["prim"]))
        same_t = np.array_equal(np.asarray(a["t"]), np.asarray(b["t"]))
        print(f"{label} {name}: prim equal={same_prim} t equal={same_t}")
    for name, f in (("current", f_cur), ("packed-node", f_pk), ("packed-both", f_pk2)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(o, d))
            ts.append(time.perf_counter() - t0)
        print(f"{label} {name}: {min(ts)*1e3:.1f} ms")


for xml in ("bunny", "whiskey"):
    ps = load_xml(f"/root/reference/scene/xml/{xml}.xml", override_res=(128, 128))
    bench(ps.scene, ps.camera, xml)
