"""Minimal NanoVDB (.nvdb) reader → dense NumPy grids.

TPU-native replacement for the reference's GridVolumeManager
(nanovdb::io::readGrid + deviceUpload, src/impl/vol_grid.cu:216-295): since
TPUs cannot chase NanoVDB tree pointers, we decode the sparse tree into a
dense (D, H, W) array once on the host and upload it as an HBM array that
the trilinear sampler in media/grid.py gathers from.

Implements the published NanoVDB 32.x memory layout for float grids:
FileHeader → FileMetaData (+ grid name) → GridData blob; leaf nodes
(8³ voxels, 2144 bytes for float) are read directly from the tree's
leaf-node segment and scattered into the dense array at their origin
coordinates. Constant-value tiles in the internal nodes (lower 16³-child
nodes, 33,856 B; upper 32³-child nodes, 270,400 B — the standard 5-4-3
float tree) are expanded too: active value-mask entries without a child
fill their 8³ / 128³ footprint with the tile value. The ZIP codec
(zlib-deflated grid blob prefixed by a uint64 compressed size) is
decompressed transparently; BLOSC and non-float grid types raise —
callers fall back gracefully (scene/xml_parser.py). Root-level tiles
remain a documented limit (read as zero density).

Also supports ``.npy``/``.npz`` dense grids as the framework-native volume
format.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x304244566F6E614E  # "NanoVDB0"
_MAGIC_GRID = 0x314244566F6E614E  # "NanoVDB1" (grid data magic, newer files)

# GridType enum (NanoVDB.h): 1 = float
_GRID_TYPE_FLOAT = 1

_LEAF_SIZE_FLOAT = 2144  # 96-byte header + 512 float values
_LEAF_VALUES_OFF = 96

# InternalData<float> layout (NanoVDB.h, 5-4-3 tree). Per node:
#   mBBox (2×Coord, 24 B) | mFlags (8 B) | mValueMask | mChildMask |
#   min/max/avg/stddev (16 B) | pad to 32 | mTable (8 B/tile union)
# lower (LOG2DIM=4): 4096 tiles, masks 512 B → table at 1088, size 33856
# upper (LOG2DIM=5): 32768 tiles, masks 4096 B → table at 8256, size 270400
_INTERNAL = {
    # level: (log2dim, node_size, mask_bytes, table_off, child_span)
    1: (4, 33856, 512, 1088, 8),      # lower: children are 8³ leaves
    2: (5, 270400, 4096, 8256, 128),  # upper: children are 128³ lower nodes
}


def load_dense(path: str):
    """Load a density grid from .nvdb / .npy / .npz.

    Returns (density (D, H, W) float32, bbox_min (3,), bbox_max (3,)).
    """
    if path.endswith(".npy"):
        d = np.load(path).astype(np.float32)
        return d, np.zeros(3, np.float32), np.asarray(d.shape[::-1], np.float32)
    if path.endswith(".npz"):
        z = np.load(path)
        d = z["density"].astype(np.float32)
        bmin = z.get("bbox_min", np.zeros(3, np.float32))
        bmax = z.get("bbox_max", np.asarray(d.shape[::-1], np.float32))
        return d, bmin.astype(np.float32), bmax.astype(np.float32)
    return load_nvdb_density(path)


def load_nvdb_density(path: str):
    """Decode the first float grid of a .nvdb file to a dense array."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 16:
        raise ValueError("nvdb: file too small")
    magic = struct.unpack_from("<Q", buf, 0)[0]
    if magic not in (_MAGIC, _MAGIC_GRID):
        raise ValueError(f"nvdb: bad magic {magic:#x}")
    # FileHeader: magic(8) version(4) gridCount(2) codec(2)
    _version, grid_count, codec = struct.unpack_from("<IHH", buf, 8)
    if grid_count < 1:
        raise ValueError("nvdb: no grids")
    if codec not in (0, 1):  # 0 = NONE, 1 = ZIP (zlib); 2 = BLOSC unsupported
        raise ValueError(f"nvdb: compressed codec {codec} unsupported")
    off = 16

    # FileMetaData (176 bytes) + name
    (grid_size, _file_size, _name_key, _voxel_count) = struct.unpack_from(
        "<QQQQ", buf, off
    )
    grid_type, _grid_class = struct.unpack_from("<II", buf, off + 32)
    world_bbox = struct.unpack_from("<6d", buf, off + 40)
    index_bbox = struct.unpack_from("<6i", buf, off + 88)
    _voxel_size = struct.unpack_from("<3d", buf, off + 112)
    name_size = struct.unpack_from("<I", buf, off + 136)[0]
    node_counts = struct.unpack_from("<4I", buf, off + 140)
    off += 176 + name_size

    if grid_type != _GRID_TYPE_FLOAT:
        raise ValueError(f"nvdb: grid type {grid_type} unsupported (want float)")

    if codec == 1:
        # ZIP codec (nanovdb/util/IO.h): uint64 compressed byte count, then
        # a zlib-deflated GridData blob of `grid_size` bytes when inflated.
        import zlib

        comp_size = struct.unpack_from("<Q", buf, off)[0]
        blob = zlib.decompress(buf[off + 8 : off + 8 + comp_size])
        if len(blob) < grid_size:
            raise ValueError("nvdb: zip blob shorter than grid_size")
        buf = blob
        off = 0

    grid_start = off  # GridData begins here
    # TreeData offset: GridData is 672 bytes in v32.3
    tree_off = grid_start + 672
    node_offsets = struct.unpack_from("<4Q", buf, tree_off)  # leaf,lower,upper,root
    leaf_count = node_counts[0]

    i0 = np.asarray(index_bbox[:3])
    i1 = np.asarray(index_bbox[3:])
    dims = (i1 - i0 + 1).astype(np.int64)  # (x, y, z) extents
    dense = np.zeros((dims[2], dims[1], dims[0]), np.float32)  # (D=z, H=y, W=x)

    if leaf_count == 0:
        raise ValueError("nvdb: no readable leaf nodes")

    def read_leaves(leaf_off):
        if leaf_off + leaf_count * _LEAF_SIZE_FLOAT > len(buf):
            return None, None
        raw = np.frombuffer(
            buf, np.uint8, count=leaf_count * _LEAF_SIZE_FLOAT, offset=leaf_off
        ).reshape(leaf_count, _LEAF_SIZE_FLOAT)
        org = raw[:, :12].copy().view(np.int32).reshape(leaf_count, 3)
        return raw, org

    def plausible(org):
        """Fraction of leaf origins that are 8-aligned and inside the index
        bbox — the discriminator between the two offset conventions."""
        if org is None:
            return -1.0
        aligned = (org & 7 == 0).all(axis=1)
        inside = ((org >= i0 - 8) & (org <= i1)).all(axis=1)
        return float((aligned & inside).mean())

    # mNodeOffset convention differs across NanoVDB writer versions:
    # relative to TreeData (32.3 headers) vs relative to GridData. Probe
    # both and keep whichever yields structurally valid leaf origins.
    cand = [grid_start + node_offsets[0], tree_off + node_offsets[0]]
    raws = [read_leaves(c) for c in cand]
    scores = [plausible(o) for _, o in raws]
    best = int(np.argmax(scores))
    if scores[best] < 0.5:
        raise ValueError(f"nvdb: leaf segment not found (scores {scores})")
    raw, origins = raws[best]
    base = cand[best] - node_offsets[0]  # winning offset convention base

    # Expand constant-value tiles stored in the internal nodes: an active
    # value-mask bit without a child covers its whole child footprint with
    # one value (NanoVDB InternalData mTable union). Children overwrite
    # later (leaves are scattered after this).
    for level in (2, 1):  # upper first so lower tiles can refine
        count = node_counts[level]
        seg = base + node_offsets[level]
        log2dim, nsize, mask_b, table_off, child_span = _INTERNAL[level]
        if count == 0 or node_offsets[level] == 0:
            continue
        if seg + count * nsize > len(buf):
            continue  # segment missing/unparseable — skip tiles, keep leaves
        node_span = child_span << log2dim
        for k in range(count):
            nb = seg + k * nsize
            bmin_n = np.frombuffer(buf, np.int32, 3, nb)
            org = bmin_n & ~(node_span - 1)
            vmask = np.unpackbits(
                np.frombuffer(buf, np.uint8, mask_b, nb + 32), bitorder="little"
            )
            cmask = np.unpackbits(
                np.frombuffer(buf, np.uint8, mask_b, nb + 32 + mask_b),
                bitorder="little",
            )
            tile_idx = np.nonzero(vmask & ~cmask)[0]
            if tile_idx.size == 0:
                continue
            table = np.frombuffer(
                buf, np.float32, (1 << (3 * log2dim)) * 2, nb + table_off
            )[::2]
            dim = 1 << log2dim
            iz = tile_idx & (dim - 1)
            iy = (tile_idx >> log2dim) & (dim - 1)
            ix = tile_idx >> (2 * log2dim)
            for j in range(tile_idx.size):
                lo = org + np.asarray(
                    [ix[j], iy[j], iz[j]], np.int64
                ) * child_span - i0
                hi = lo + child_span
                cl = np.maximum(lo, 0)
                ch = np.minimum(hi, dims)
                if (cl >= ch).any():
                    continue
                dense[cl[2]:ch[2], cl[1]:ch[1], cl[0]:ch[0]] = table[tile_idx[j]]
    values = (
        raw[:, _LEAF_VALUES_OFF : _LEAF_VALUES_OFF + 2048]
        .copy()
        .view(np.float32)
        .reshape(leaf_count, 8, 8, 8)  # (x, y, z) fastest-last per NanoVDB
    )
    # NanoVDB leaf values are indexed [x][y][z] (z fastest) → transpose to z,y,x
    values = values.transpose(0, 3, 2, 1)

    for k in range(leaf_count):
        ox, oy, oz = (origins[k] & ~7) - i0  # leaf origin, snapped to 8
        if ox < 0 or oy < 0 or oz < 0:
            continue
        zs, ys, xs = int(oz), int(oy), int(ox)
        ze, ye, xe = zs + 8, ys + 8, xs + 8
        if ze > dense.shape[0] or ye > dense.shape[1] or xe > dense.shape[2]:
            continue
        dense[zs:ze, ys:ye, xs:xe] = values[k]

    bmin = np.asarray(world_bbox[:3], np.float32)
    bmax = np.asarray(world_bbox[3:], np.float32)
    return dense, bmin, bmax
