"""Pallas TPU kernel: packet BVH traversal (closest-hit + any-hit).

TPU re-design of the reference's per-thread stackless walk
(src/renderer/tracing_func.cuh:44-181). A thread-per-ray walk needs per-lane
dynamic gathers, which the VPU hates; instead each *grid program* owns a
tile of rays that traverses the tree as a packet:

- the node pointer is a SCALAR in the while_loop carry: node AABB + leaf
  metadata are scalar loads from VMEM-resident SoA arrays (no vector
  gathers anywhere);
- the slab test and Möller-Trumbore run VECTORIZED over the (R, 128) ray
  tile against scalar node/triangle data (triangle constants broadcast);
- descend (ptr+1) when ANY lane hits an interior box, else jump skip[ptr] —
  the same skip encoding as accel/bvh_build.py;
- leaves test up to max_leaf primitives, each a scalar-constant triangle
  or sphere vs the whole tile.

The whole BVH + primitive SoA lives in VMEM (guarded by VMEM_BUDGET; larger
scenes fall back to the XLA gather traversal in accel/traverse.py). Packet
coherence is the perf lever — callers sort rays (Morton / material) so tiles
agree on their subtree (the analogue of the reference's ray sorting,
src/pt_impl/wf_path_tracer.cu:68-80).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import BVHArrays, Geometry

TILE = 512  # rays per packet (4 sublane rows x 128 lanes)
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
HIT_EPS = 1e-4


def scene_fits_vmem(geom: Geometry, bvh: BVHArrays) -> bool:
    nodes = bvh.num_nodes * (6 * 4 + 3 * 4)
    prims = geom.num_prims * (9 * 4 + 4 + 1)
    return (nodes + prims) < VMEM_BUDGET_BYTES


def _kernel(flip,  # python bool: occlusion mode
            max_leaf,  # python int
            # refs:
            nminx, nminy, nminz, nmaxx, nmaxy, nmaxz, nskip, nbase, ncount,
            p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z, sph,
            ox, oy, oz, dx, dy, dz, tfar,
            out_t, out_prim, out_b1, out_b2):
    M = nskip.shape[0]

    o_x = ox[:]
    o_y = oy[:]
    o_z = oz[:]
    d_x = dx[:]
    d_y = dy[:]
    d_z = dz[:]
    t_lim = tfar[:]

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < 1e-8, jnp.where(v < 0, -1e-8, 1e-8), v)

    ix = safe_inv(d_x)
    iy = safe_inv(d_y)
    iz = safe_inv(d_z)

    t_init = t_lim * (1.0 - 1e-3) if flip else jnp.full_like(o_x, jnp.inf)
    init = (
        jnp.int32(0),                                   # ptr
        t_init,                                         # t
        jnp.full(o_x.shape, -1, jnp.int32),             # prim
        jnp.zeros_like(o_x),                            # b1
        jnp.zeros_like(o_x),                            # b2
    )

    def cond(c):
        ptr = c[0]
        if flip:
            # any-hit: stop early once every lane found an occluder
            return (ptr < M) & jnp.any(c[2] < 0)
        return ptr < M

    def body(c):
        ptr, t_best, prim, b1, b2 = c
        lo_x = nminx[ptr]
        lo_y = nminy[ptr]
        lo_z = nminz[ptr]
        hi_x = nmaxx[ptr]
        hi_y = nmaxy[ptr]
        hi_z = nmaxz[ptr]
        cnt = ncount[ptr]
        base = nbase[ptr]
        skip = nskip[ptr]

        tx0 = (lo_x - o_x) * ix
        tx1 = (hi_x - o_x) * ix
        ty0 = (lo_y - o_y) * iy
        ty1 = (hi_y - o_y) * iy
        tz0 = (lo_z - o_z) * iz
        tz1 = (hi_z - o_z) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        live = prim < 0 if flip else jnp.full(o_x.shape, True)
        box_hit = (tn <= tf) & (tf > HIT_EPS) & (tn < t_best) & live
        any_hit = jnp.any(box_hit)
        is_leaf = cnt > 0

        def do_leaf(carry):
            t_best, prim, b1, b2 = carry
            for k in range(max_leaf):
                pid = base + k
                pidc = jnp.minimum(pid, p0x.shape[0] - 1)
                valid = k < cnt
                ax = p0x[pidc]
                ay = p0y[pidc]
                az = p0z[pidc]
                ux = e1x[pidc]
                uy = e1y[pidc]
                uz = e1z[pidc]
                vx = e2x[pidc]
                vy = e2y[pidc]
                vz = e2z[pidc]
                is_sph = sph[pidc] > 0

                # Möller-Trumbore against scalar triangle
                hx = d_y * vz - d_z * vy
                hy = d_z * vx - d_x * vz
                hz = d_x * vy - d_y * vx
                a = ux * hx + uy * hy + uz * hz
                f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
                sx = o_x - ax
                sy = o_y - ay
                sz = o_z - az
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * uz - sz * uy
                qy = sz * ux - sx * uz
                qz = sx * uy - sy * ux
                v = f * (d_x * qx + d_y * qy + d_z * qz)
                t_tri = f * (vx * qx + vy * qy + vz * qz)
                tri_ok = (
                    (jnp.abs(a) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t_tri > HIT_EPS)
                )

                # sphere: center = (ax, ay, az), radius = ux
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
                ok = jnp.where(is_sph, sph_ok, tri_ok) & valid & (t_k < t_best) & live
                t_best = jnp.where(ok, t_k, t_best)
                prim = jnp.where(ok, pid, prim)
                b1 = jnp.where(ok, jnp.where(is_sph, 0.0, u), b1)
                b2 = jnp.where(ok, jnp.where(is_sph, 0.0, v), b2)
            return t_best, prim, b1, b2

        t_best, prim, b1, b2 = jax.lax.cond(
            any_hit & is_leaf, do_leaf, lambda c: c, (t_best, prim, b1, b2)
        )
        ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
        return ptr_next, t_best, prim, b1, b2

    _, t_best, prim, b1, b2 = jax.lax.while_loop(cond, body, init)
    out_t[:] = t_best
    out_prim[:] = prim
    out_b1[:] = b1
    out_b2[:] = b2


@functools.partial(jax.jit, static_argnames=("max_leaf", "occlusion", "interpret"))
def traverse_pallas(geom: Geometry, bvh: BVHArrays, o, d, t_far=None,
                    max_leaf: int = 4, occlusion: bool = False,
                    interpret: bool = False):
    """Packet traversal over ray tiles. Returns dict(t, prim, hit, b1, b2)
    (closest-hit) or with prim>=0 marking occluded lanes (occlusion)."""
    B = o.shape[0]
    pad = (-B) % TILE
    Bp = B + pad
    R = TILE // 128

    def prep(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    o_p = prep(o)
    d_p = prep(d)
    tf = (
        prep(t_far) if t_far is not None else jnp.full((Bp,), 1e8, jnp.float32)
    )
    grid = Bp // TILE

    ray_spec = pl.BlockSpec(
        (R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda x: pl.BlockSpec(memory_space=pltpu.VMEM)

    def c3(x, j):
        return x[..., j].reshape(Bp // 128, 128)

    args = (
        bvh.node_min[:, 0], bvh.node_min[:, 1], bvh.node_min[:, 2],
        bvh.node_max[:, 0], bvh.node_max[:, 1], bvh.node_max[:, 2],
        bvh.node_skip, bvh.node_base, bvh.node_count,
        geom.p0[:, 0], geom.p0[:, 1], geom.p0[:, 2],
        geom.e1[:, 0], geom.e1[:, 1], geom.e1[:, 2],
        geom.e2[:, 0], geom.e2[:, 1], geom.e2[:, 2],
        geom.is_sphere.astype(jnp.int32),
        c3(o_p, 0), c3(o_p, 1), c3(o_p, 2),
        c3(d_p, 0), c3(d_p, 1), c3(d_p, 2),
        tf.reshape(Bp // 128, 128),
    )
    n_scene = 19
    in_specs = [full(None)] * n_scene + [ray_spec] * 7
    out_specs = (ray_spec, ray_spec, ray_spec, ray_spec)
    out_shape = (
        jax.ShapeDtypeStruct((Bp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((Bp // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((Bp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((Bp // 128, 128), jnp.float32),
    )
    kern = functools.partial(_kernel, occlusion, max_leaf)
    t, prim, b1, b2 = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    t = t.reshape(-1)[:B]
    prim = prim.reshape(-1)[:B]
    b1 = b1.reshape(-1)[:B]
    b2 = b2.reshape(-1)[:B]
    if occlusion:
        return {"occluded": prim >= 0}
    return {"t": t, "prim": prim, "hit": prim >= 0, "b1": b1, "b2": b2}
