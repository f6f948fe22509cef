"""Compiled scene: flat SoA device arrays (the TPU analogue of the reference's
GPU scene upload).

The reference scatters scene state across device vtables (c_material[48],
c_emitter[9], constant memory — src/pt_impl/path_tracer.cu:35-36), SoA prim
arrays (src/core/aos.cuh) and textures. On TPU there is no device-side
polymorphism, so everything becomes dense parameter tables indexed by small
integer type/id fields and dispatched with masked selects (SURVEY.md §7
decision 1). All arrays are static-shape; all tables are differentiable
pytree leaves unless noted.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Enums (host-side ints; mirror src/core/enums.cuh but TPU-dispatch oriented)
# ---------------------------------------------------------------------------

BSDF_LAMBERTIAN = 0
BSDF_SPECULAR = 1
BSDF_TRANSLUCENT = 2
BSDF_PLASTIC = 3
BSDF_PLASTIC_FORWARD = 4
BSDF_GGX_CONDUCTOR = 5
BSDF_DISPERSION = 6
BSDF_FORWARD = 7
# rough dielectric (GGX transmission, Walter et al. 2007) — beyond the
# reference, which has smooth dielectrics and rough conductors only
BSDF_GGX_DIELECTRIC = 8
# Oren-Nayar rough diffuse (fast A/B form) — beyond the reference
BSDF_OREN_NAYAR = 9
NUM_BSDF_TYPES = 10

EMITTER_NULL = 0
EMITTER_POINT = 1
EMITTER_AREA = 2
EMITTER_AREA_SPOT = 3
EMITTER_ENVMAP = 4

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_DUAL_HG = 2
PHASE_RAYLEIGH = 3
PHASE_SGGX = 4  # falls back to isotropic like the reference (scene.cu:762-766)

MEDIUM_NONE = -1
MEDIUM_HOMOGENEOUS = 0
MEDIUM_GRID = 1

# BSDF scalar param columns (BSDFTable.params[:, col])
P_IOR = 0  # dielectric index of refraction
P_ROUGH_X = 1  # GGX alpha_x
P_ROUGH_Y = 2  # GGX alpha_y
P_THICKNESS = 3  # plastic coating thickness
P_CAUCHY_A = 4  # dispersion Cauchy A
P_CAUCHY_B = 5  # dispersion Cauchy B (um^2)
P_PENETRATION = 6  # lambertian transmission mix (reference lambert k_g usage)
NUM_BSDF_PARAMS = 8

# Texture slots per BSDF (reference: 5 slots, src/core/textures.cuh:64-170)
TEX_DIFFUSE = 0
TEX_SPECULAR = 1
TEX_GLOSSY = 2
TEX_NORMAL = 3
TEX_ROUGHNESS = 4
NUM_TEX_SLOTS = 5


# ---------------------------------------------------------------------------
# Pytree tables
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class Geometry:
    """Per-primitive SoA. Spheres ride in triangle slots: p0 = center,
    e1[...,0] = radius (reference packs spheres into one float4,
    src/core/aos.cuh:146-152)."""

    p0: jnp.ndarray  # (N, 3)
    e1: jnp.ndarray  # (N, 3) p1 - p0
    e2: jnp.ndarray  # (N, 3) p2 - p0
    n0: jnp.ndarray  # (N, 3) shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (N, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    obj_idx: jnp.ndarray  # (N,) int32 object id
    is_sphere: jnp.ndarray  # (N,) bool

    @property
    def num_prims(self) -> int:
        return self.p0.shape[0]


@flax.struct.dataclass
class ObjectTable:
    """Per-object metadata (reference ObjInfo/CompactedObjInfo,
    src/core/object.cuh:31-99)."""

    bsdf_id: jnp.ndarray  # (O,) int32
    emitter_id: jnp.ndarray  # (O,) int32; 0 = not an emitter (slot 0 = dummy)
    medium_in: jnp.ndarray  # (O,) int32; MEDIUM_NONE = vacuum
    cullable: jnp.ndarray  # (O,) bool — alpha/cullable interface flag
    prim_base: jnp.ndarray  # (O,) int32 (into *reordered* Geometry)
    prim_count: jnp.ndarray  # (O,) int32
    inv_area: jnp.ndarray  # (O,) float32 1 / total surface area


@flax.struct.dataclass
class EmitterTable:
    """Emitter parameter table; slot 0 is the null emitter (reference
    c_emitter[0] dummy, src/core/emitter.cuh)."""

    etype: jnp.ndarray  # (E,) int32
    emission: jnp.ndarray  # (E, 3) float32 — Le / intensity (differentiable)
    scaler: jnp.ndarray  # (E,) float32 — emission multiplier (differentiable)
    pos: jnp.ndarray  # (E, 3) point/spot position
    extra: jnp.ndarray  # (E, 4): spot {cos_min,...} | envmap {scale, azimuth, zenith}
    obj_id: jnp.ndarray  # (E,) int32 bound object (-1 for point/envmap)
    tex_id: jnp.ndarray  # (E,) int32 emission texture / envmap image (-1)
    # Area-light primitive sampling: per-emitter padded CDF over its prims
    # (area-weighted). prim_sel[e, k] is a global prim index.
    prim_cdf: jnp.ndarray  # (E, K) float32 inclusive CDF, last = 1
    prim_sel: jnp.ndarray  # (E, K) int32
    # Power-weighted emitter selection (beyond the reference's uniform pick,
    # src/renderer/tracing_func.cuh:210-225): pmf/cdf over emitter slots
    # (slot 0 = 0). Built as 75% power-proportional + 25% uniform defensive
    # mix; any positive pmf keeps NEE/MIS/LT unbiased, so hot-reload edits
    # that leave it stale only cost variance, never correctness.
    sel_pmf: jnp.ndarray  # (E,) float32
    sel_cdf: jnp.ndarray  # (E,) float32 inclusive, last = 1


@flax.struct.dataclass
class BSDFTable:
    btype: jnp.ndarray  # (M,) int32
    k_d: jnp.ndarray  # (M, 3) diffuse albedo
    k_s: jnp.ndarray  # (M, 3) specular albedo / coating tint
    k_g: jnp.ndarray  # (M, 3) glossy / global multiplier (reference k_g)
    eta: jnp.ndarray  # (M, 3) conductor spectral eta
    k: jnp.ndarray  # (M, 3) conductor spectral extinction
    params: jnp.ndarray  # (M, NUM_BSDF_PARAMS) float32
    tex_ids: jnp.ndarray  # (M, NUM_TEX_SLOTS) int32, -1 = none


@flax.struct.dataclass
class TextureAtlas:
    """All images flattened into one texel pool + per-texture descriptors.

    Variable-size images with static-shape gathers: texel (y, x) of texture t
    lives at texels[offset[t] + y * width[t] + x].
    """

    texels: jnp.ndarray  # (T, 4) float32 RGBA
    offset: jnp.ndarray  # (K,) int32
    width: jnp.ndarray  # (K,) int32
    height: jnp.ndarray  # (K,) int32


@flax.struct.dataclass
class MediumTable:
    """Participating media (homogeneous now; grid handled by GridMediumData)."""

    mtype: jnp.ndarray  # (V,) int32 MEDIUM_*
    sigma_a: jnp.ndarray  # (V, 3) absorption (differentiable)
    sigma_s: jnp.ndarray  # (V, 3) scattering (differentiable)
    scale: jnp.ndarray  # (V,) density scale (differentiable)
    phase_type: jnp.ndarray  # (V,) int32 PHASE_*
    phase_g: jnp.ndarray  # (V, 2) HG g (two lobes for dual-HG)
    phase_w: jnp.ndarray  # (V,) dual-HG lobe weight
    emission_scale: jnp.ndarray  # (V,) blackbody emission scale
    grid_id: jnp.ndarray  # (V,) int32 index into grid data (-1 = homogeneous)


@flax.struct.dataclass
class GridMediumData:
    """Dense grids decoded from NanoVDB files (padded to a common shape)."""

    density: jnp.ndarray  # (G, D, H, W) float32
    emission: jnp.ndarray  # (G, D, H, W) float32 temperature
    bbox_min: jnp.ndarray  # (G, 3) world-space
    bbox_max: jnp.ndarray  # (G, 3)
    majorant: jnp.ndarray  # (G,) max density (delta-tracking majorant)
    avg_density: jnp.ndarray  # (G,) residual-ratio-tracking control


@flax.struct.dataclass
class BVHArrays:
    """Stackless skip-encoded BVH in SoA form (reference LinearNode encoding,
    src/core/bvh.cuh:154-177 & 345-359, re-laid-out for batched gathers)."""

    node_min: jnp.ndarray  # (M, 3)
    node_max: jnp.ndarray  # (M, 3)
    node_skip: jnp.ndarray  # (M,) int32 — absolute next index on AABB miss
    node_base: jnp.ndarray  # (M,) int32 — leaf prim base (0 for interior)
    node_count: jnp.ndarray  # (M,) int32 — leaf prim count (0 for interior)
    # static: the leaf capacity this tree was BUILT with. Traversal unrolls
    # exactly this many prim tests per leaf — using a smaller constant than
    # the build's silently skips prims (whiskey's max_node_num=8 scenes
    # rendered with the default 4 missed closer hits on ~15% of camera rays).
    max_leaf: int = flax.struct.field(pytree_node=False, default=4)

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


@flax.struct.dataclass
class WideBVHArrays:
    """8-wide BVH (collapsed from the binary SAH/SBVH tree) for the ordered
    stack traversal in accel/wide_traverse.py.

    TPU rationale: the binary skip walk (accel/traverse.py) costs one
    serial lax.while_loop step per *node* per worst lane; an 8-ary node
    tests all 8 child AABBs in one step's vector ops, cutting the serial
    step count ~4-6x, and — unlike skip encoding, which is pinned to DFS
    order — a real stack lets children be visited near-first so t_best
    prunes far subtrees. The reference gets ordering implicitly from SIMT
    per-thread stacks (src/renderer/tracing_func.cuh:117-181); this is the
    vector-machine redesign, not a translation.

    Child slot encoding in ``child_node``: >= 0 → wide node id of an
    interior child; < 0 → leaf reference ``-(leaf_id+1)`` into
    ``leaf_base/leaf_count``. Empty slots carry an inverted AABB
    (min=+inf, max=-inf) so the slab test rejects them with no extra mask
    array."""

    child_min: jnp.ndarray  # (W, 8, 3) f32 child AABB minima
    child_max: jnp.ndarray  # (W, 8, 3) f32 child AABB maxima
    child_node: jnp.ndarray  # (W, 8) int32 — see encoding above
    leaf_base: jnp.ndarray  # (L,) int32 prim base per leaf
    leaf_count: jnp.ndarray  # (L,) int32 prim count per leaf
    # static: leaf capacity the source tree was built with (same contract
    # as BVHArrays.max_leaf) and a safe per-lane traversal stack bound
    # (1 + max over root paths of sum(children-1), computed at build).
    max_leaf: int = flax.struct.field(pytree_node=False, default=4)
    max_stack: int = flax.struct.field(pytree_node=False, default=32)

    @property
    def num_nodes(self) -> int:
        return self.child_min.shape[0]

    @property
    def num_leaves(self) -> int:
        return self.leaf_base.shape[0]


@flax.struct.dataclass
class TraversalForest:
    """Chunked, row-packed BVH forest for the Pallas streaming traversal
    (ops/pallas/traverse_kernel.py). The scene is partitioned into C
    spatially-coherent chunks, each with its own skip-encoded sub-BVH;
    chunk arrays stream HBM→VMEM through the pallas grid (the TPU analogue
    of the reference's smem CompactNode cache + gmem walk,
    src/core/bvh.cuh:182-251).

    Row packing: 8 slots of 16 float32 fields per 128-lane row — node i of
    chunk c lives at nodes[c, i // 8, (i % 8) * 16 : ...]. Integer fields
    are stored as exact small floats (ids < 2^24)."""

    nodes: jnp.ndarray  # (C, Rn, 128) f32
    prims: jnp.ndarray  # (C, Rp, 128) f32
    n_nodes: jnp.ndarray  # (C,) int32 real node count per chunk
    # static: node row format. "f32" = 8 slots x 16 fields (64 B/node);
    # "bf16" = 16 slots x 8 fields with conservatively-rounded bf16 AABBs
    # (32 B/node, 2x VMEM capacity — the analogue of the reference's
    # half-precision CompactNode, src/core/bvh.cuh:182-251).
    node_fmt: str = flax.struct.field(pytree_node=False, default="f32")

    @property
    def num_chunks(self) -> int:
        return self.nodes.shape[0]


@flax.struct.dataclass
class EnvImportance:
    """Luminance-CDF tables for envmap importance sampling (one envmap per
    scene, like the reference). Empty (1×1) tables → cosine-hemisphere NEE
    fallback (the reference's only strategy, src/core/emitter.cuh:313-359)."""

    row_cdf: jnp.ndarray  # (H,) inclusive CDF over rows (sin-weighted)
    col_cdf: jnp.ndarray  # (H, W) inclusive CDF over columns per row
    pmf: jnp.ndarray  # (H, W) texel probability mass (for MIS pdf lookups)

    @property
    def enabled(self) -> bool:
        return self.pmf.shape[0] > 1 or self.pmf.shape[1] > 1


@flax.struct.dataclass
class Scene:
    """Everything the integrator needs, as one pytree."""

    geom: Geometry
    objects: ObjectTable
    emitters: EmitterTable
    bsdfs: BSDFTable
    textures: TextureAtlas
    media: MediumTable
    grids: GridMediumData
    bvh: BVHArrays
    env_emitter: jnp.ndarray  # () int32 — envmap emitter id, 0 if none
    cam_medium: jnp.ndarray  # () int32 — medium containing the camera
    num_emitters: jnp.ndarray  # () int32 — real emitters (excluding slot 0)
    env_importance: EnvImportance = None
    # Optional pre-packed chunked BVH for the Pallas streaming traversal
    # (scene/builder.py compile(..., forest_chunk=K); None → packed lazily
    # for VMEM-resident scenes, XLA gather loop otherwise).
    forest: TraversalForest = None
    # Optional 8-wide collapsed BVH (accel/wide_build.with_wide); used when
    # traversal == "wide". None → the binary gather loop serves instead.
    wide: WideBVHArrays = None
    # STATIC upper bound of BSDF families present (compile-time dispatch
    # pruning: absent families are skipped entirely in bsdf/eval.py). Type
    # hot-reload to a family outside this set requires a scene recompile —
    # set to all families if that flexibility matters more than speed.
    present_bsdfs: tuple = flax.struct.field(
        pytree_node=False, default=tuple(range(NUM_BSDF_TYPES))
    )
    # STATIC per-scene traversal backend: "" = defer to the module global
    # (models/path_tracer.TRAVERSAL_IMPL), "xla" = batched gather loop,
    # "pallas" = packet kernel, "wide" = 8-ary ordered-stack loop (needs
    # scene.wide). Static so flipping it retraces — set by
    # accel/autotune.autotune_traversal (measured, per scene+backend).
    traversal: str = flax.struct.field(pytree_node=False, default="")
