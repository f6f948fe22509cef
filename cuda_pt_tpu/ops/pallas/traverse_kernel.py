"""Pallas TPU kernel: packet BVH traversal with chunked HBM streaming.

TPU re-design of the reference's per-thread stackless walk + shared-memory
node cache (src/renderer/tracing_func.cuh:44-181, src/core/bvh.cuh:182-251).
A thread-per-ray walk needs per-lane dynamic gathers, which the VPU hates;
instead each *grid program* owns a (R, 128) tile of rays that traverses a
sub-BVH as a packet, and the scene is partitioned into spatially-coherent
CHUNKS that stream HBM→VMEM through the pallas grid pipeline:

  grid = (ray_tiles, chunks): the chunk axis is innermost, so each ray
  tile's best-hit state stays resident in VMEM while chunk node/prim blocks
  are double-buffered in by the pallas pipeline — the TPU-idiomatic analogue
  of the reference's "top levels in smem, rest walked from gmem" design.
  A chunk whose root AABB misses every lane costs one loop iteration.

Mosaic-lowering-safe data access (round-1 kernel used scalar dynamic loads
from 1D VMEM refs — the known-risky pattern, ROADMAP r1 #3):

- nodes/prims are packed 8 slots x 16 float32 fields per 128-lane row;
  fetching node i is a DYNAMIC SUBLANE slice ``ref[pl.ds(i // 8, 1), :]``
  (well-supported), never a dynamic lane index;
- scalar fields come out of the fetched (1, 128) row via masked full
  reductions (lane-iota == slot*16+field), never vector->scalar extracts;
- the slab test and Möller-Trumbore run VECTORIZED over the (R, 128) ray
  tile against scalar node/triangle constants.

Integer fields (skip/base/count/prim-id) are stored as exact small floats;
prim ids are exact below 2^24 (the reference caps scenes at 64M prims —
beyond 16M this layout needs a second int32 plane; documented limit).

Packet coherence is the perf lever — callers sort rays (Morton / material)
so tiles agree on their subtree (the analogue of the reference's ray
sorting, src/pt_impl/wf_path_tracer.cu:68-80).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import BVHArrays, Geometry, TraversalForest

TILE = 512  # rays per packet (4 sublane rows x 128 lanes)
SLOTS = 8  # nodes/prims per 128-lane row
SLOT_F = 16  # float32 fields per slot
SLOTS16 = 16  # bf16 node format: nodes per row
SLOT_F16 = 8  # bf16 node format: f32 fields per slot (3 packed AABB + 3 int)
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
HIT_EPS = 1e-4
_BIG = 1e30
_BF16_MAX = 3.3895314e38  # largest finite bf16


def scene_fits_vmem(geom: Geometry, bvh: BVHArrays) -> bool:
    """Whole-scene-resident fast path: one chunk, no streaming."""
    packed = (bvh.num_nodes + geom.num_prims) * SLOT_F * 4  # 64 B each
    return packed < VMEM_BUDGET_BYTES


def _pack_rows(cols, pad_vals):
    """Pack per-item field columns into (rows, 128) f32: 8 slots of 16
    fields per row. cols: list of (M,) arrays; pad_vals: per-field fill for
    the tail slots (sentinels that make padding inert)."""
    M = cols[0].shape[0]
    Mp = -(-max(M, 1) // SLOTS) * SLOTS + SLOTS  # at least one full pad group
    out = []
    for c, pv in zip(cols, pad_vals):
        c = jnp.asarray(c, jnp.float32)
        out.append(jnp.concatenate([c, jnp.full((Mp - M,), pv, jnp.float32)]))
    while len(out) < SLOT_F:
        out.append(jnp.zeros((Mp,), jnp.float32))
    arr = jnp.stack(out, axis=1)  # (Mp, 16)
    return arr.reshape(Mp // SLOTS, SLOTS * SLOT_F)


def pack_nodes(bvh: BVHArrays) -> jnp.ndarray:
    """(Rn, 128) packed node rows. Padding nodes have an empty AABB and
    skip pointing past the end, so walking into them exits immediately."""
    M = bvh.num_nodes
    Mp = -(-max(M, 1) // SLOTS) * SLOTS + SLOTS
    return _pack_rows(
        [
            bvh.node_min[:, 0], bvh.node_min[:, 1], bvh.node_min[:, 2],
            bvh.node_max[:, 0], bvh.node_max[:, 1], bvh.node_max[:, 2],
            bvh.node_skip.astype(jnp.float32),
            bvh.node_base.astype(jnp.float32),
            bvh.node_count.astype(jnp.float32),
        ],
        [_BIG, _BIG, _BIG, -_BIG, -_BIG, -_BIG, float(Mp), 0.0, 0.0],
    )


def pack_prims(geom: Geometry, gid=None) -> jnp.ndarray:
    """(Rp, 128) packed prim rows; field 10 = global prim id (exact < 2^24).
    Padding prims are degenerate triangles (always rejected)."""
    if gid is None:
        gid = jnp.arange(geom.num_prims, dtype=jnp.float32)
    return _pack_rows(
        [
            geom.p0[:, 0], geom.p0[:, 1], geom.p0[:, 2],
            geom.e1[:, 0], geom.e1[:, 1], geom.e1[:, 2],
            geom.e2[:, 0], geom.e2[:, 1], geom.e2[:, 2],
            geom.is_sphere.astype(jnp.float32),
            jnp.asarray(gid, jnp.float32),
        ],
        [0.0] * 9 + [0.0, -1.0],
    )


def _bf16_directed(x, up: bool):
    """Round f32 → bf16 bits with directed rounding (numpy, host-side).
    up=False: result <= x (for box minima); up=True: result >= x (maxima)."""
    import numpy as np

    x = np.clip(np.asarray(x, np.float32), -_BF16_MAX, _BF16_MAX)
    u = x.view(np.uint32)
    t = u & np.uint32(0xFFFF0000)  # truncate: rounds toward zero
    tv = t.view(np.float32)
    # Truncation moves toward zero for BOTH signs (positive: down, negative:
    # up), so whenever the truncated value is on the wrong side we step one
    # bf16 ulp AWAY from zero — on IEEE bit patterns that is always +1 in
    # the (sign-inclusive) unsigned ordering.
    sv = (((t >> 16) + np.uint32(1)) << 16).view(np.float32)
    need_up = up & (tv < x)
    need_dn = (not up) & (tv > x)
    out = np.where(need_up | need_dn, sv, tv)
    return np.clip(out, -_BF16_MAX, _BF16_MAX).astype(np.float32)


def _pack2(hi_f32, lo_f32):
    """Two bf16 payloads in one f32 lane: hi in bits 31..16, lo in 15..0."""
    import numpy as np

    h = np.asarray(hi_f32, np.float32).view(np.uint32) & np.uint32(0xFFFF0000)
    l_ = np.asarray(lo_f32, np.float32).view(np.uint32) >> 16
    return (h | l_).view(np.float32)


def pack_nodes_bf16(bvh: BVHArrays) -> jnp.ndarray:
    """(R, 128) rows of 16 node slots x 8 f32 fields — 32 B/node.

    Fields per slot: 0 = lo_x|hi_x (packed bf16, lo rounded down / hi up:
    the box only GROWS, so traversal stays conservative-exact), 1 = lo_y|
    hi_y, 2 = lo_z|hi_z, 3 = skip, 4 = base, 5 = count (exact f32 ints)."""
    import numpy as np

    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    M = nmin.shape[0]
    Mp = -(-max(M, 1) // SLOTS16) * SLOTS16 + SLOTS16
    lo = _bf16_directed(nmin, up=False)
    hi = _bf16_directed(nmax, up=True)
    cols = [
        _pack2(lo[:, 0], hi[:, 0]),
        _pack2(lo[:, 1], hi[:, 1]),
        _pack2(lo[:, 2], hi[:, 2]),
        np.asarray(bvh.node_skip, np.float32),
        np.asarray(bvh.node_base, np.float32),
        np.asarray(bvh.node_count, np.float32),
    ]
    # padding nodes: empty box (lo=+BIG, hi=-BIG), skip past the end
    pads = [_pack2(_BIG, -_BIG)] * 3 + [float(Mp), 0.0, 0.0]
    out = []
    for c, pv in zip(cols, pads):
        out.append(np.concatenate([c, np.full(Mp - M, pv, np.float32)]))
    while len(out) < SLOT_F16:
        out.append(np.zeros(Mp, np.float32))
    arr = np.stack(out, axis=1).reshape(Mp // SLOTS16, SLOTS16 * SLOT_F16)
    return jnp.asarray(arr)


def single_chunk_forest(geom: Geometry, bvh: BVHArrays) -> TraversalForest:
    """Whole scene as one VMEM-resident chunk (pure jnp — safe under jit;
    XLA hoists it out of render loops as loop-invariant)."""
    return TraversalForest(
        nodes=pack_nodes(bvh)[None],
        prims=pack_prims(geom)[None],
        n_nodes=jnp.asarray([bvh.num_nodes], jnp.int32),
    )


def build_forest(geom: Geometry, chunk_prims: int = 65536, max_leaf: int = 4,
                 node_fmt: str = "f32"):
    """Host-side forest build: Morton-partition prims into chunks, build a
    skip-encoded sub-BVH per chunk (accel/bvh_build.py), pack rows.

    node_fmt="bf16" packs nodes at 32 B each with conservatively-rounded
    bf16 AABBs (2x node VMEM capacity, identical hits — boxes only grow).

    Runs on concrete arrays (scene-compile time), NOT under jit. Chunks are
    padded to a common row count so they stream as equal-shaped blocks."""
    import numpy as np

    from ...accel import bvh_build

    p0 = np.asarray(geom.p0)
    e1 = np.asarray(geom.e1)
    e2 = np.asarray(geom.e2)
    sph = np.asarray(geom.is_sphere)
    N = p0.shape[0]
    lo, hi, cent = bvh_build.prim_bounds(p0, e1, e2, sph)

    # spatial ordering: Morton codes of centroids over the scene bounds
    smin = lo.min(axis=0)
    ext = np.maximum(hi.max(axis=0) - smin, 1e-8)
    q = np.clip((cent - smin) / ext * 1023.0, 0, 1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    order = np.argsort(code, kind="stable")

    chunks = [order[i : i + chunk_prims] for i in range(0, N, chunk_prims)]
    node_arrs, prim_arrs, counts = [], [], []
    for ids in chunks:
        nodes = bvh_build.build_bvh(lo[ids], hi[ids], cent[ids], max_leaf=max_leaf)
        sub = ids[nodes["order"]]  # chunk-local BVH order -> global prim ids
        bvh_c = BVHArrays(
            node_min=jnp.asarray(nodes["node_min"]),
            node_max=jnp.asarray(nodes["node_max"]),
            node_skip=jnp.asarray(nodes["node_skip"]),
            node_base=jnp.asarray(nodes["node_base"]),
            node_count=jnp.asarray(nodes["node_count"]),
        )
        node_arrs.append(
            pack_nodes_bf16(bvh_c) if node_fmt == "bf16" else pack_nodes(bvh_c)
        )
        prim_arrs.append(
            _pack_rows(
                [
                    jnp.asarray(p0[sub, 0]), jnp.asarray(p0[sub, 1]),
                    jnp.asarray(p0[sub, 2]),
                    jnp.asarray(e1[sub, 0]), jnp.asarray(e1[sub, 1]),
                    jnp.asarray(e1[sub, 2]),
                    jnp.asarray(e2[sub, 0]), jnp.asarray(e2[sub, 1]),
                    jnp.asarray(e2[sub, 2]),
                    jnp.asarray(sph[sub].astype(np.float32)),
                    jnp.asarray(sub.astype(np.float32)),
                ],
                [0.0] * 9 + [0.0, -1.0],
            )
        )
        counts.append(nodes["node_min"].shape[0])

    rn = max(a.shape[0] for a in node_arrs)
    rp = max(a.shape[0] for a in prim_arrs)
    if node_fmt == "bf16":
        pad_node_row = jnp.tile(
            jnp.asarray(
                [float(_pack2(_BIG, -_BIG))] * 3
                + [float(rn * SLOTS16), 0.0, 0.0]
                + [0.0] * (SLOT_F16 - 6),
                jnp.float32,
            ),
            (SLOTS16,),
        )
    else:
        pad_node_row = jnp.tile(
            jnp.asarray(
                [_BIG, _BIG, _BIG, -_BIG, -_BIG, -_BIG, float(rn * SLOTS), 0.0, 0.0]
                + [0.0] * (SLOT_F - 9),
                jnp.float32,
            ),
            (SLOTS,),
        )
    # padding prims: degenerate geometry with gid = -1 (never referenced by
    # any node, and inert even if they were)
    pad_prim_row = jnp.tile(
        jnp.asarray([0.0] * 10 + [-1.0] + [0.0] * (SLOT_F - 11), jnp.float32),
        (SLOTS,),
    )

    def padto(a, rows, node_pad=False):
        pad = rows - a.shape[0]
        if pad == 0:
            return a
        row = pad_node_row if node_pad else pad_prim_row
        return jnp.concatenate([a, jnp.tile(row[None], (pad, 1))], axis=0)

    nodes = jnp.stack([padto(a, rn, True) for a in node_arrs])
    prims = jnp.stack([padto(a, rp) for a in prim_arrs])
    return TraversalForest(
        nodes=nodes, prims=prims, n_nodes=jnp.asarray(counts, jnp.int32),
        node_fmt=node_fmt,
    )


def _field(row, idx):
    """Scalar field extraction from a (1, 128) row via masked reduction
    (no vector->scalar extract, no dynamic lane indexing)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.sum(jnp.where(lane == idx, row, 0.0))


def _unpack2_field(row, idx):
    """_pack2 inverse fused with scalar extraction: (hi-bits value, lo-bits
    value) of lane ``idx`` of a (1, 128) f32 row. All bitcasts stay on the
    VECTOR row — Mosaic's tpu.bitcast rejects scalar operands (caught by the
    AOT TPU-export gate, tests/test_pallas_kernels.py), so bit-twiddle
    first, extract the scalar last."""
    u = jax.lax.bitcast_convert_type(row, jnp.uint32)
    a = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    b = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return _field(a, idx), _field(b, idx)


def _kernel(flip, max_leaf, rn, node_fmt, count_iters,
            nodes, prims,
            ox, oy, oz, dx, dy, dz, tfar,
            out_t, out_prim, out_b1, out_b2, out_it=None):
    c = pl.program_id(1)

    o_x = ox[:]
    o_y = oy[:]
    o_z = oz[:]
    d_x = dx[:]
    d_y = dy[:]
    d_z = dz[:]
    t_lim = tfar[:]

    @pl.when(c == 0)
    def _init():
        out_t[:] = t_lim * (1.0 - 1e-3) if flip else jnp.full_like(o_x, jnp.inf)
        out_prim[:] = jnp.full(o_x.shape, -1, jnp.int32)
        out_b1[:] = jnp.zeros_like(o_x)
        out_b2[:] = jnp.zeros_like(o_x)
        if count_iters:
            out_it[:] = jnp.zeros_like(o_x)

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < 1e-8, jnp.where(v < 0, -1e-8, 1e-8), v)

    ix = safe_inv(d_x)
    iy = safe_inv(d_y)
    iz = safe_inv(d_z)

    n_slots = SLOTS16 if node_fmt == "bf16" else SLOTS
    M_pad = rn * n_slots
    init = (jnp.int32(0), out_t[:], out_prim[:], out_b1[:], out_b2[:],
            jnp.int32(0))

    def cond(cr):
        ptr = cr[0]
        if flip:
            # any-hit: stop early once every lane found an occluder
            return (ptr < M_pad) & jnp.any(cr[2] < 0)
        return ptr < M_pad

    def body(cr):
        ptr, t_best, prim, b1, b2, it = cr
        row = nodes[0, pl.ds(ptr // n_slots, 1), :]
        if node_fmt == "bf16":
            sb = (ptr % SLOTS16) * SLOT_F16
            lo_x, hi_x = _unpack2_field(row, sb + 0)
            lo_y, hi_y = _unpack2_field(row, sb + 1)
            lo_z, hi_z = _unpack2_field(row, sb + 2)
            skip = _field(row, sb + 3).astype(jnp.int32)
            base = _field(row, sb + 4).astype(jnp.int32)
            cnt = _field(row, sb + 5).astype(jnp.int32)
        else:
            sb = (ptr % SLOTS) * SLOT_F
            lo_x = _field(row, sb + 0)
            lo_y = _field(row, sb + 1)
            lo_z = _field(row, sb + 2)
            hi_x = _field(row, sb + 3)
            hi_y = _field(row, sb + 4)
            hi_z = _field(row, sb + 5)
            skip = _field(row, sb + 6).astype(jnp.int32)
            base = _field(row, sb + 7).astype(jnp.int32)
            cnt = _field(row, sb + 8).astype(jnp.int32)

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
                prow = prims[0, pl.ds(pid // SLOTS, 1), :]
                pb = (pid % SLOTS) * SLOT_F
                ax = _field(prow, pb + 0)
                ay = _field(prow, pb + 1)
                az = _field(prow, pb + 2)
                ux = _field(prow, pb + 3)
                uy = _field(prow, pb + 4)
                uz = _field(prow, pb + 5)
                vx = _field(prow, pb + 6)
                vy = _field(prow, pb + 7)
                vz = _field(prow, pb + 8)
                is_sph = _field(prow, pb + 9) > 0.0
                gid = _field(prow, pb + 10).astype(jnp.int32)

                # Möller-Trumbore against scalar triangle constants
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
                # logical blend, not jnp.where: Mosaic cannot legalize
                # arith.select on i1 vectors (caught on the first live-chip
                # compile of this kernel)
                shape_ok = (is_sph & sph_ok) | (~is_sph & tri_ok)
                ok = shape_ok & (k < cnt) & (t_k < t_best) & live
                t_best = jnp.where(ok, t_k, t_best)
                prim = jnp.where(ok, gid, prim)
                b1 = jnp.where(ok, jnp.where(is_sph, 0.0, u), b1)
                b2 = jnp.where(ok, jnp.where(is_sph, 0.0, v), b2)
            return t_best, prim, b1, b2

        t_best, prim, b1, b2 = jax.lax.cond(
            any_hit & is_leaf, do_leaf, lambda cr_: cr_, (t_best, prim, b1, b2)
        )
        ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
        return ptr_next, t_best, prim, b1, b2, it + 1

    _, t_best, prim, b1, b2, it = jax.lax.while_loop(cond, body, init)
    out_t[:] = t_best
    out_prim[:] = prim
    out_b1[:] = b1
    out_b2[:] = b2
    if count_iters:
        # per-tile node-fetch count, accumulated over the chunk axis (every
        # lane of the tile carries the same value — packet-wide work metric)
        out_it[:] = out_it[:] + jnp.full_like(o_x, 1.0) * it.astype(jnp.float32)


# Global interpret-mode default (CPU tests flip this; on TPU the kernel
# compiles through Mosaic). Resolved at trace time by traverse_forest.
INTERPRET = False


def traverse_forest(forest: TraversalForest, o, d, t_far=None,
                    max_leaf: int = 4, occlusion: bool = False,
                    interpret=None, count_iters: bool = False,
                    tile: int | None = None):
    """Packet traversal of a chunked forest over ray tiles.

    Returns dict(t, prim, hit, b1, b2) (closest-hit) or {"occluded"}
    (any-hit). Grid = (ray_tiles, chunks), chunk axis innermost: per-tile
    best-hit state stays in VMEM while chunk blocks stream through.
    Callers jit the surrounding render; this traces inline.

    count_iters additionally returns "tile_iters": per-ray-tile node-fetch
    counts summed over chunks — the packet-divergence work metric (each
    iteration slab-tests ONE node against the whole TILE-ray packet, so
    lane-work = tile_iters * TILE; see scripts/packet_divergence.py)."""
    if interpret is None:
        interpret = INTERPRET
    if tile is None:
        tile = TILE  # module knob: benches sweep it (BENCH_TILE)
    assert tile % 128 == 0 and tile > 0, "packet size must be lane-multiple"
    B = o.shape[0]
    pad = (-B) % tile
    Bp = B + pad
    R = tile // 128
    C, rn = forest.nodes.shape[0], forest.nodes.shape[1]
    rp = forest.prims.shape[1]

    def prep(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    o_p = prep(o)
    d_p = prep(d)
    tf = (
        prep(t_far) if t_far is not None else jnp.full((Bp,), 1e8, jnp.float32)
    )
    T_ = Bp // tile

    # Ray tiles are (1, R, 128) blocks over a (T_, R, 128) array so the last
    # two block dims always EQUAL the array dims — Mosaic requires blocks to
    # tile the sublane dim in multiples of 8 otherwise, which a (R<8, 128)
    # block over a multi-tile (T_*R, 128) array violates (caught on the first
    # live-chip run; the AOT export gate only covered the single-tile shape).
    def c2(x, j):
        return x[..., j].reshape(T_, R, 128)

    def chunk_spec(rows):
        return pl.BlockSpec(
            (1, rows, 128), lambda t, c: (c, 0, 0), memory_space=pltpu.VMEM
        )

    ray_spec = pl.BlockSpec(
        (1, R, 128), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
    )

    args = (
        forest.nodes, forest.prims,
        c2(o_p, 0), c2(o_p, 1), c2(o_p, 2),
        c2(d_p, 0), c2(d_p, 1), c2(d_p, 2),
        tf.reshape(T_, R, 128),
    )
    in_specs = [chunk_spec(rn), chunk_spec(rp)] + [ray_spec] * 7
    out_specs = [ray_spec, ray_spec, ray_spec, ray_spec]
    out_shape = [
        jax.ShapeDtypeStruct((T_, R, 128), jnp.float32),
        jax.ShapeDtypeStruct((T_, R, 128), jnp.int32),
        jax.ShapeDtypeStruct((T_, R, 128), jnp.float32),
        jax.ShapeDtypeStruct((T_, R, 128), jnp.float32),
    ]
    if count_iters:
        out_specs.append(ray_spec)
        out_shape.append(jax.ShapeDtypeStruct((T_, R, 128), jnp.float32))
    kern = functools.partial(_kernel, occlusion, max_leaf, rn,
                             forest.node_fmt, count_iters)
    outs = pl.pallas_call(
        kern,
        grid=(T_, C),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    t, prim, b1, b2 = outs[:4]

    t = t.reshape(-1)[:B]
    prim = prim.reshape(-1)[:B]
    b1 = b1.reshape(-1)[:B]
    b2 = b2.reshape(-1)[:B]
    if occlusion:
        res = {"occluded": prim >= 0}
    else:
        res = {"t": t, "prim": prim, "hit": prim >= 0, "b1": b1, "b2": b2}
    if count_iters:
        # rows within a tile carry identical values; one row per tile
        res["tile_iters"] = outs[4][:, 0, 0].astype(jnp.int32)
    return res


def traverse_pallas(geom: Geometry, bvh: BVHArrays, o, d, t_far=None,
                    max_leaf: int = 4, occlusion: bool = False,
                    interpret=None, count_iters: bool = False):
    """Single-chunk compatibility wrapper: packs the scene's global BVH as
    one VMEM-resident chunk (scene must pass scene_fits_vmem)."""
    forest = single_chunk_forest(geom, bvh)
    return traverse_forest(forest, o, d, t_far, max_leaf=max_leaf,
                           occlusion=occlusion, interpret=interpret,
                           count_iters=count_iters)
