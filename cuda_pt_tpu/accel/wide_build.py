"""Collapse the binary SAH/SBVH tree into an 8-wide BVH (host side, NumPy).

Standard wide-BVH collapse (Wald-style): each wide node owns a *frontier*
of binary subtrees grown greedily — repeatedly expand the frontier entry
with the largest surface area until 8 slots are filled or only binary
leaves remain. Binary-leaf frontier entries become leaf children (prim
base/count straight from the binary node); interior entries become child
wide nodes.

The binary tree is recovered from the skip encoding (accel/bvh_build.py):
node i interior → left child i+1, right child skip[i+1]; leaf ⇔ count>0.
Works unchanged on C++ SAH and SBVH builder output (same array format).

The reference has no wide BVH — its SIMT walk gets per-thread ordered
descent for free (src/renderer/tracing_func.cuh:117-181). On a vector
machine the 8-wide node is what buys the same two properties (fewer
serial steps, near-child-first ordering); see WideBVHArrays in
scene/types.py and the traversal in accel/wide_traverse.py.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..scene.types import WideBVHArrays

BRANCH = 8
# Empty child slot sentinel. NOT derivable from the AABB: an inverted box
# (min=+inf, max=-inf) still passes the swap-based slab test (tn=-inf,
# tf=+inf), so traversal masks on child_node != EMPTY explicitly.
EMPTY = np.int32(np.iinfo(np.int32).min)


def _surface_area(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def collapse_wide(nodes: dict, max_leaf: int = 4,
                  box_dtype: str = "f32") -> WideBVHArrays:
    """nodes: the binary builder dict (node_min/max/skip/base/count).

    box_dtype="bf16" stores child AABBs as bfloat16 rounded *outward*
    (minima down, maxima up — ops/pallas/traverse_kernel._bf16_directed),
    halving node-gather bandwidth at the cost of a few extra conservative
    node visits; hits are never lost. The analogue of the reference's
    half-precision CompactNode (src/core/bvh.cuh:182-251)."""
    nmin = np.asarray(nodes["node_min"], np.float32)
    nmax = np.asarray(nodes["node_max"], np.float32)
    skip = np.asarray(nodes["node_skip"], np.int64)
    base = np.asarray(nodes["node_base"], np.int64)
    cnt = np.asarray(nodes["node_count"], np.int64)
    M = len(cnt)
    is_leaf = cnt > 0
    sa = _surface_area(nmin, nmax)

    cmin_rows: list = []
    cmax_rows: list = []
    cnode_rows: list = []
    leaf_base: list = []
    leaf_count: list = []
    # patch list: (wide_id, slot, binary_node) for interior children whose
    # wide id is assigned when their own row is built (BFS order).
    queue: deque = deque()

    def new_wide(bnode: int) -> int:
        wid = len(cmin_rows)
        cmin_rows.append(np.full((BRANCH, 3), np.inf, np.float32))
        cmax_rows.append(np.full((BRANCH, 3), -np.inf, np.float32))
        cnode_rows.append(np.full(BRANCH, EMPTY, np.int32))
        queue.append((wid, bnode))
        return wid

    def new_leaf(bnode: int) -> int:
        lid = len(leaf_base)
        leaf_base.append(int(base[bnode]))
        leaf_count.append(int(cnt[bnode]))
        return -(lid + 1)

    if M == 1 or is_leaf[0]:
        # degenerate: root is a leaf — one wide node with a single leaf child
        wid = len(cmin_rows)
        cmin_rows.append(np.full((BRANCH, 3), np.inf, np.float32))
        cmax_rows.append(np.full((BRANCH, 3), -np.inf, np.float32))
        cnode_rows.append(np.full(BRANCH, EMPTY, np.int32))
        cmin_rows[wid][0] = nmin[0]
        cmax_rows[wid][0] = nmax[0]
        cnode_rows[wid][0] = new_leaf(0)
        nchild = np.array([1], np.int32)
        return _finish(cmin_rows, cmax_rows, cnode_rows, leaf_base, leaf_count,
                       nchild, max_leaf, box_dtype)

    new_wide(0)
    nchild: list = []
    while queue:
        wid, b = queue.popleft()
        frontier = [b + 1, int(skip[b + 1])]
        while len(frontier) < BRANCH:
            cands = [f for f in frontier if not is_leaf[f]]
            if not cands:
                break
            pick = max(cands, key=lambda f: sa[f])
            frontier.remove(pick)
            frontier.append(pick + 1)
            frontier.append(int(skip[pick + 1]))
        for slot, f in enumerate(frontier):
            cmin_rows[wid][slot] = nmin[f]
            cmax_rows[wid][slot] = nmax[f]
            cnode_rows[wid][slot] = new_leaf(f) if is_leaf[f] else new_wide(f)
        while len(nchild) <= wid:
            nchild.append(0)
        nchild[wid] = len(frontier)

    return _finish(cmin_rows, cmax_rows, cnode_rows, leaf_base, leaf_count,
                   np.asarray(nchild, np.int32), max_leaf, box_dtype)


def _finish(cmin_rows, cmax_rows, cnode_rows, leaf_base, leaf_count, nchild,
            max_leaf, box_dtype="f32") -> WideBVHArrays:
    import jax.numpy as jnp

    cmin = np.stack(cmin_rows)
    cmax = np.stack(cmax_rows)
    cnode = np.stack(cnode_rows)
    box_jdtype = jnp.float32
    if box_dtype == "bf16":
        from ..ops.pallas.traverse_kernel import _bf16_directed

        fin = np.isfinite(cmin)  # keep empty-slot ±inf sentinels intact
        cmin = np.where(fin, _bf16_directed(cmin, up=False), cmin)
        cmax = np.where(fin, _bf16_directed(cmax, up=True), cmax)
        box_jdtype = jnp.bfloat16

    # Safe stack bound: popping a node replaces 1 entry by its c children
    # (net +c-1); the worst lane is the root path maximizing sum(c-1).
    # g(w) = (c_w - 1) + max over interior children g(child); bound = g(root)+1.
    W = cmin.shape[0]
    g = np.zeros(W, np.int64)
    for w in range(W - 1, -1, -1):  # children have larger ids (BFS order)
        kids = cnode[w]
        gc = 0
        for e in kids[: nchild[w]]:
            if e >= 0:
                gc = max(gc, int(g[e]))
        g[w] = (int(nchild[w]) - 1) + gc
    max_stack = int(g[0]) + 2 if W else 2

    if not leaf_base:  # keep arrays non-empty for gather safety
        leaf_base, leaf_count = [0], [0]
    return WideBVHArrays(
        child_min=jnp.asarray(cmin, box_jdtype),
        child_max=jnp.asarray(cmax, box_jdtype),
        child_node=jnp.asarray(cnode),
        leaf_base=jnp.asarray(np.asarray(leaf_base, np.int32)),
        leaf_count=jnp.asarray(np.asarray(leaf_count, np.int32)),
        max_leaf=max_leaf,
        max_stack=max_stack,
    )


def from_bvharrays(bvh, box_dtype: str = "f32") -> WideBVHArrays:
    """Collapse an already-device BVHArrays (pulls arrays to host once)."""
    nodes = {
        "node_min": np.asarray(bvh.node_min),
        "node_max": np.asarray(bvh.node_max),
        "node_skip": np.asarray(bvh.node_skip),
        "node_base": np.asarray(bvh.node_base),
        "node_count": np.asarray(bvh.node_count),
    }
    return collapse_wide(nodes, max_leaf=bvh.max_leaf, box_dtype=box_dtype)


def with_wide(scene, box_dtype: str = "f32"):
    """Return scene with a wide BVH attached and traversal pinned to it."""
    wide = from_bvharrays(scene.bvh, box_dtype=box_dtype)
    return scene.replace(wide=wide, traversal="wide")
