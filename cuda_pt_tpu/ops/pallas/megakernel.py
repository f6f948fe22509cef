"""Fused Pallas TPU megakernel: the ENTIRE path-trace loop in one kernel.

This is the true TPU-native analogue of the reference's render_pt_kernel
(src/pt_impl/megakernel_pt.cu:32-201): one kernel owns a (R, 128) ray tile
and runs the full bounce loop — BVH walk, NEE with shadow-ray walk, MIS,
four BSDF families (lambertian, mirror, smooth dielectric, GGX conductor
with VNDF sampling), Russian roulette, pcg2d RNG — entirely in
VMEM/registers.
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

Scene envelope (megakernel_ok), round 4: all 9 surface BSDF families
(incl. wavelength-locked dispersion in-kernel), area / point / area-spot
emitters (≤ 7, ≤ 56 emitter prims), envmaps (miss rays recorded in-kernel,
radiance + MIS resolved by an XLA epilogue — exact, BSDF-sampling-only),
and kd-textured lambert/Oren-Nayar via DEFERRED texturing: the kernel
traces with base kd and records per-bounce (bid, uv) + contribution
groups; the epilogue rebuilds the texture prefix products with batched
XLA gathers (per-lane texel gathers never enter the kernel — TPUs have
none). Compact pack formats (bf16 nodes with conservative rounding, bf16
attrs, t9 9-field triangle prims) auto-engage above AUTO_COMPACT_BYTES so
whiskey-class meshes stay VMEM-resident. Still composed-only: media / ToF,
textured non-diffuse slots (specular/glossy/normal/roughness maps), sphere
emitter prims, textured scenes containing spheres.

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
SLOTS16 = tk.SLOTS16
SLOT_F16 = tk.SLOT_F16
HIT_EPS = tk.HIT_EPS
_INV_PI = 0.3183098861837907
_TWO_PI = 6.283185307179586
_INV_U32 = 2.3283064365386963e-10
MAX_EMITTERS = 8  # slots in the single emitter row (slot 0 = null)
MAX_EMITTER_PRIMS = 56  # 7 rows of 8 slots
MAX_BSDFS = 32  # material lookup is a masked scalar loop over bsdf ids
# Auto-selection stability gate: cornell-class packs (<~1 MB) have never
# faulted on silicon; whiskey-class (~10.7 MB resident) runs 0.64 s/frame
# when it runs but crashes the TPU worker non-deterministically (~50% of
# sessions, EXP_FUSED_BIG.json + docs/TUNNEL.md §5). Until the fault is
# isolated, megakernel_ok(strict=True) — the api.Renderer auto-pick — caps
# the resident pack; explicit traversal='fused' bypasses the cap.
AUTO_MAX_PACK_BYTES = 6 * 1024 * 1024
# Non-strict VMEM ceiling for the WHOLE fused working set (pack + ray-state
# tile + Mosaic slack), against the ~16 MB/core physical VMEM. Explicit
# traversal='fused' uses this; exceeding it fails Mosaic allocation at
# compile, so gate it here and fall back instead (ADVICE r3).
FUSED_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fused_pack_bytes(scene: T.Scene, node_fmt: str = "f32",
                     attr_fmt: str = "f32", prim_fmt: str = "f32") -> int:
    """Resident bytes of the full make_pack() result: nodes (64 B f32 /
    32 B bf16) + prims (64 B f32 / 36.6 B t9) + attrs (64 B f32 / 32 B
    bf16) + the small emitter/bsdf tables."""
    import numpy as np

    n = int(scene.bvh.num_nodes)
    p = int(scene.geom.num_prims)
    nb = int(np.asarray(scene.bsdfs.btype).shape[0])
    node_b = 32 if node_fmt == "bf16" else 64
    prim_b = (512 // 14 + 1) if prim_fmt == "t9" else 64
    attr_b = 32 if attr_fmt == "bf16" else 64
    small = (2 * nb + SLOTS + MAX_EMITTER_PRIMS) * SLOT_F * 4
    return n * node_b + p * prim_b + p * attr_b + small


def resident_pack_bytes(scene: T.Scene) -> int:
    """Bytes make_pack() will actually keep resident, after the automatic
    compaction (bf16 nodes/attrs + t9 prims) kicks in above
    AUTO_COMPACT_BYTES."""
    import numpy as np

    if fused_pack_bytes(scene) > AUTO_COMPACT_BYTES:
        tri = not bool(np.asarray(scene.geom.is_sphere).any())
        return fused_pack_bytes(scene, node_fmt="bf16", attr_fmt="bf16",
                                prim_fmt="t9" if tri else "f32")
    return fused_pack_bytes(scene)


def _tile_state_bytes(tile: int = None, d1: int = 6,
                      textured: bool = False) -> int:
    """Per-tile VMEM for ray-state I/O (8 in + 3 out vectors) plus a 2×
    pipelining/live-range allowance for the loop carries; textured scenes
    add 6×(max_depth+1) per-bounce group buffers (carried AND output)."""
    t = TILE if tile is None else tile
    base = 11 * t * 4 * 2
    if textured:
        # trace_megakernel caps textured tiles at 4096: the 6*(depth+1)
        # per-bounce group buffers are carried AND output
        t = min(t, 4096)
        base += 6 * d1 * t * 4 * 4
    return base


def megakernel_ok(scene: T.Scene, md=None, strict: bool = False,
                  renderer: str = "pt") -> bool:
    """Static envelope check (host-side, concrete arrays). strict=True adds
    the AUTO_MAX_PACK_BYTES stability cap (see above). renderer="vpt"
    admits homogeneous participating media (fused VPT: free-flight channel
    MIS + phase sampling + interface-walked shadow transmittance in-kernel,
    the megakernel_vpt.cu analogue); "pt" keeps media composed-only."""
    import numpy as np

    tids0 = np.asarray(scene.bsdfs.tex_ids)
    is_textured = bool(tids0.size) and bool(
        (tids0[:, T.TEX_DIFFUSE] >= 0).any())
    d1 = (int(md.max_depth) + 1) if md is not None else 6
    if (resident_pack_bytes(scene)
            + _tile_state_bytes(d1=d1, textured=is_textured)
            > FUSED_VMEM_BUDGET_BYTES):
        return False
    if strict:
        if resident_pack_bytes(scene) > AUTO_MAX_PACK_BYTES:
            return False
    if set(scene.present_bsdfs) - {T.BSDF_LAMBERTIAN, T.BSDF_SPECULAR,
                                   T.BSDF_TRANSLUCENT, T.BSDF_GGX_CONDUCTOR,
                                   T.BSDF_PLASTIC, T.BSDF_GGX_DIELECTRIC,
                                   T.BSDF_OREN_NAYAR, T.BSDF_FORWARD,
                                   T.BSDF_DISPERSION}:
        return False
    if int(np.asarray(scene.bsdfs.btype).shape[0]) > MAX_BSDFS:
        return False
    et = np.asarray(scene.emitters.etype)
    if et.shape[0] > MAX_EMITTERS:
        return False
    # envmap allowed since round 4: miss rays are recorded in-kernel and
    # resolved by an XLA epilogue (exact radiance, BSDF-sampling-only with
    # MIS weight 1 — unbiased; env NEE stays a composed-path feature).
    ok_types = {T.EMITTER_NULL, T.EMITTER_AREA, T.EMITTER_POINT,
                T.EMITTER_AREA_SPOT, T.EMITTER_ENVMAP}
    if set(int(x) for x in et) - ok_types:
        return False
    env_mask = et == T.EMITTER_ENVMAP
    geo_tex = np.where(env_mask, -1, np.asarray(scene.emitters.tex_id))
    if geo_tex.max(initial=-1) >= 0:
        return False  # textured AREA emitters stay composed-only
    tids = np.asarray(scene.bsdfs.tex_ids)
    if tids.size:
        # diffuse-textured lambert/Oren-Nayar rides the fused path via the
        # deferred-texture epilogue (round 4); any other texture slot or
        # family stays composed-only. uv capture is triangle-only.
        bt = np.asarray(scene.bsdfs.btype)
        other = np.delete(tids, T.TEX_DIFFUSE, axis=1)
        if other.max(initial=-1) >= 0:
            return False
        has_dt = tids[:, T.TEX_DIFFUSE] >= 0
        ok_fam = np.isin(bt, (T.BSDF_LAMBERTIAN, T.BSDF_OREN_NAYAR))
        if bool((has_dt & ~ok_fam).any()):
            return False
        if bool(has_dt.any()) and bool(np.asarray(scene.geom.is_sphere).any()):
            return False
    has_media = (
        int(np.asarray(scene.objects.medium_in).max(initial=-1)) >= 0
        or int(np.asarray(scene.cam_medium)) >= 0)
    if has_media or renderer == "vpt":
        if renderer != "vpt":
            return False
        mt = np.asarray(scene.media.mtype)
        if mt.shape[0] > MAX_MEDIA:
            return False
        if (mt == T.MEDIUM_GRID).any():
            # grid media ride the SPLIT swf driver (round 5): delta-
            # tracked flight + ratio-tracked NEE transmittance in XLA
            # around the shade kernel. Not yet combined with: envmaps
            # (escaping rays would skip the grid transmittance) or
            # emissive grids (blackbody resolve stays composed).
            if (np.asarray(scene.emitters.etype) == T.EMITTER_ENVMAP).any():
                return False
            es = np.asarray(scene.media.emission_scale)
            if bool((es[mt == T.MEDIUM_GRID] > 0.0).any()):
                return False
        pt_ = np.asarray(scene.media.phase_type)
        ok_phase = {T.PHASE_ISOTROPIC, T.PHASE_HG, T.PHASE_DUAL_HG,
                    T.PHASE_RAYLEIGH, T.PHASE_SGGX}
        if set(int(x) for x in pt_) - ok_phase:
            return False
        # deferred textures and fused VPT are not combined yet
        tids_m = np.asarray(scene.bsdfs.tex_ids)
        if tids_m.size and tids_m.max(initial=-1) >= 0:
            return False
    if md is not None and (md.max_time > 0.0):
        return False
    # emitter prim slots: one per (emitter, k) with k < its prim count
    n_eprims = 0
    cdf = np.asarray(scene.emitters.prim_cdf)
    sel = np.asarray(scene.emitters.prim_sel)
    sph = np.asarray(scene.geom.is_sphere)
    for e in range(et.shape[0]):
        if et[e] in (T.EMITTER_AREA, T.EMITTER_AREA_SPOT):
            k = _real_k(cdf[e], sel[e])
            n_eprims += k
            if sph[sel[e, :k]].any():
                # sphere emitter prims: sampling matches, but keep the
                # envelope tight (non-emitting spheres are fine)
                return False
    if n_eprims > MAX_EMITTER_PRIMS:
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


MAX_MEDIA = 8  # slots in the single media row (fused VPT)


def _prim_medium_null(scene: T.Scene):
    """Per-prim (medium_in, is_null_interface) host-side: null = forward
    BSDF or cullable object (volume_pt.transmittance_estimate's rule)."""
    import numpy as np

    obj = np.asarray(scene.geom.obj_idx)
    med = np.asarray(scene.objects.medium_in)[obj].astype(np.float32)
    bid = np.maximum(np.asarray(scene.objects.bsdf_id)[obj], 0)
    bt = np.asarray(scene.bsdfs.btype)[bid]
    cul = np.asarray(scene.objects.cullable)[obj]
    nul = ((bt == T.BSDF_FORWARD) | cul).astype(np.float32)
    return med, nul


def pack_attrs(scene: T.Scene) -> jnp.ndarray:
    """Per-prim shading attributes, 1 slot x 16 fields (packed like prims):
    n0(3) n1(3) n2(3) eid inv_area_obj bsdf_id medium_in is_null — captured
    scalar-wise during the leaf test (surface_interaction's gathers);
    material params resolve from bsdf_id after the walk via pack_bsdfs."""
    g = scene.geom
    obj = g.obj_idx
    bid = jnp.maximum(scene.objects.bsdf_id[obj], 0)
    eid = scene.objects.emitter_id[obj].astype(jnp.float32)
    inv_a = scene.objects.inv_area[obj]
    med, nul = _prim_medium_null(scene)
    return tk._pack_rows(
        [
            g.n0[:, 0], g.n0[:, 1], g.n0[:, 2],
            g.n1[:, 0], g.n1[:, 1], g.n1[:, 2],
            g.n2[:, 0], g.n2[:, 1], g.n2[:, 2],
            eid, inv_a, bid.astype(jnp.float32),
            jnp.asarray(med), jnp.asarray(nul),
        ],
        [0.0] * 9 + [0.0, 0.0, 0.0, -1.0, 0.0],
    )


def pack_media(scene: T.Scene) -> jnp.ndarray:
    """(1, 128) homogeneous-media row, 8 slots x 16 fields per medium:
    sigma_a*scale(3) sigma_s*scale(3) sigma_t*scale(3) phase_type g1 g2 w
    (media/homogeneous.sigma_at + media/phase.py params)."""
    import numpy as np

    m = scene.media
    V = int(np.asarray(m.mtype).shape[0])
    assert V <= MAX_MEDIA
    sc = np.asarray(m.scale, np.float32)[:, None]
    sa = np.asarray(m.sigma_a, np.float32) * sc
    ss = np.asarray(m.sigma_s, np.float32) * sc
    st = sa + ss
    # grid media: the kernel must contribute NO analytic exp factor (the
    # split driver delta-tracks flight in XLA and ratio-tracks NEE
    # transmittance in the post-pass), so their sigma rows are zeroed —
    # exp(-0*t) = 1 everywhere the hom code touches them. Field 13 flags
    # them for the flight-override gate.
    is_grid = (np.asarray(m.mtype) == T.MEDIUM_GRID).astype(np.float32)
    gz = (1.0 - is_grid)[:, None]
    sa = sa * gz
    ss = ss * gz
    st = st * gz
    cols = [
        sa[:, 0], sa[:, 1], sa[:, 2],
        ss[:, 0], ss[:, 1], ss[:, 2],
        st[:, 0], st[:, 1], st[:, 2],
        np.asarray(m.phase_type, np.float32),
        np.asarray(m.phase_g, np.float32)[:, 0],
        np.asarray(m.phase_g, np.float32)[:, 1],
        np.asarray(m.phase_w, np.float32),
        is_grid,
    ]
    out = []
    for c in cols:
        out.append(np.concatenate([np.asarray(c, np.float32),
                                   np.zeros(MAX_MEDIA - V, np.float32)]))
    while len(out) < SLOT_F:
        out.append(np.zeros(MAX_MEDIA, np.float32))
    return jnp.asarray(
        np.stack(out, axis=1).reshape(1, MAX_MEDIA * SLOT_F), jnp.float32)


def pack_bsdfs(scene: T.Scene) -> jnp.ndarray:
    """(rows, 128) material table, TWO slots per bsdf (32 fields):
    slot A: btype kd(3) ks(3) kg(3) ior ax ay; slot B: eta(3) k(3)
    thickness cauchy_a cauchy_b. Resolved per-lane after the walk with a
    masked loop over bsdf ids (the in-kernel make_ctx, bsdf/eval.py:43-74)."""
    import numpy as np

    b = scene.bsdfs
    NB = int(np.asarray(b.btype).shape[0])
    P = np.asarray(b.params)
    cols_a = np.zeros((NB, SLOT_F), np.float32)
    cols_b = np.zeros((NB, SLOT_F), np.float32)
    cols_a[:, 0] = np.asarray(b.btype, np.float32)
    cols_a[:, 1:4] = np.asarray(b.k_d)
    cols_a[:, 4:7] = np.asarray(b.k_s)
    cols_a[:, 7:10] = np.asarray(b.k_g)
    cols_a[:, 10] = P[:, T.P_IOR]
    cols_a[:, 11] = np.maximum(P[:, T.P_ROUGH_X], 1e-4)
    cols_a[:, 12] = np.maximum(P[:, T.P_ROUGH_Y], 1e-4)
    cols_b[:, 0:3] = np.asarray(b.eta)
    cols_b[:, 3:6] = np.asarray(b.k)
    cols_b[:, 6] = P[:, T.P_THICKNESS]
    cols_b[:, 7] = P[:, T.P_CAUCHY_A]
    cols_b[:, 8] = P[:, T.P_CAUCHY_B]
    inter = np.stack([cols_a, cols_b], axis=1).reshape(2 * NB, SLOT_F)
    rows = -(-inter.shape[0] // SLOTS) * SLOTS
    out = np.zeros((rows, SLOT_F), np.float32)
    out[: inter.shape[0]] = inter
    return jnp.asarray(out.reshape(rows // SLOTS, SLOTS * SLOT_F))


def pack_emitters(scene: T.Scene) -> jnp.ndarray:
    """(1, 128) row, 8 slots x 16 fields per emitter:
    etype, em_r, em_g, em_b (emission*scaler), pos(3), sel_pmf, sel_cdf,
    kmax (real prim count - 1).

    When the scene has an envmap, the selection pmf/cdf are RENORMALIZED
    over the geometric (area/point) emitters only: the fused kernel never
    NEE-samples the environment (miss rays are resolved by the XLA epilogue
    with MIS weight 1), so both the NEE pdf and the emitter-hit MIS pmf
    must describe that restricted strategy to stay unbiased."""
    import numpy as np

    e = scene.emitters
    E = int(np.asarray(e.etype).shape[0])
    em = np.asarray(e.emission) * np.asarray(e.scaler)[:, None]
    cdfs = np.asarray(e.prim_cdf)
    sels = np.asarray(e.prim_sel)
    kmax = np.array(
        [max(_real_k(cdfs[i], sels[i]) - 1, 0) for i in range(E)], np.float32
    )
    et_np = np.asarray(e.etype)
    pmf = np.asarray(e.sel_pmf, np.float32).copy()
    cdf = np.asarray(e.sel_cdf, np.float32)
    env_mask = et_np == T.EMITTER_ENVMAP
    if env_mask.any():
        pmf[env_mask] = 0.0
        tot = float(pmf.sum())
        pmf = pmf / max(tot, 1e-12)
        cdf = np.cumsum(pmf).astype(np.float32)
        if cdf[-1] > 0:
            cdf /= cdf[-1]
        else:
            cdf[:] = 1.0
    # env slot rides as NULL in-kernel: it has no geometry (can't be hit)
    # and zero selection probability (can't be NEE-picked), so NULL is its
    # exact in-kernel semantics — the epilogue owns all env radiance.
    et_k = np.where(env_mask, T.EMITTER_NULL, et_np)
    # field 10: spot cone cos_falloff (AREA_SPOT gate, emitter.cuh:225-311);
    # -1 for everything else so the gate is always open
    falloff = np.where(et_np == T.EMITTER_AREA_SPOT,
                       np.asarray(e.extra)[:, 0], -1.0).astype(np.float32)
    cols = [
        np.asarray(et_k, np.float32),
        em[:, 0], em[:, 1], em[:, 2],
        np.asarray(e.pos)[:, 0], np.asarray(e.pos)[:, 1], np.asarray(e.pos)[:, 2],
        pmf,
        cdf,
        kmax,
        falloff,
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
        if et[eid] not in (T.EMITTER_AREA, T.EMITTER_AREA_SPOT):
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


def _kernel(max_depth, max_diffuse, max_specular, max_transmit,
            max_volume, max_leaf, rn, n_eslots, n_bsdfs, nee_m,
            node_fmt, attr_fmt, prim_fmt, tri_only, has_env, has_disp,
            textured, has_media, n_media, ambient_med, count_stats,
            seg, ablate, phase, has_grid,
            nodes, prims, attrs, erow, eprims, brows,
            *refs):
    if node_fmt == "w8":
        # SMEM scratch for the ordered stack walk (scratch_shapes refs
        # arrive after the outputs)
        w8_stack, w8_spn = refs[-2], refs[-1]
        refs = refs[:-2]
    if has_media:
        mrow = refs[0]
        refs = refs[1:]
    if textured:
        auv = refs[0]
        refs = refs[1:]
    # Texturing styles: deferred (whole-path mode: per-bounce contribution
    # groups + one epilogue cumprod, trace_megakernel) vs inline (segment
    # mode: the driver resolves THIS bounce's kd texel between calls and
    # multiplies it into the NEE contribution + carried throughput — exact,
    # no D1 groups; trace_megakernel_swf).
    deferred_tex = textured and not seg
    inline_tex = textured and seg
    if phase == "traverse":
        # ---- traverse-only phase (split driver, trace_megakernel_swf
        # split=True): walk_closest with SLIM capture -> (t, gid, u, v);
        # attributes resolve via XLA gathers between phases (11-16 ns per
        # point gather at 262k lanes, EXP_R5_MICRO) instead of per-leaf-
        # candidate blends (2.2x bunny / 1.5x whiskey, EXP_R5_SLIM).
        (ox, oy, oz, dx, dy, dz, act_in,
         t_out, gid_out, u_out, v_out) = refs
        r0 = r1 = ox  # unused by the walk; keeps the shared preamble alive
    elif seg:
        # ---- single-bounce segment mode (sorted-wavefront driver) -------
        # refs = (bounce_smem, state_in..., [hit_in...], state_out...);
        # bounce_body runs exactly ONCE per call; the bounce loop +
        # inter-bounce ray sorting live in trace_megakernel_swf. State
        # order: _SEG_STATE below. phase=="shade": the closest hit arrives
        # as input planes (from the traverse phase + XLA resolve) instead
        # of an in-kernel walk.
        bounce_ref = refs[0]
        n_state = (21 + (6 if has_env else 0) + (5 if has_media else 0)
                   + (6 if textured else 0) + (9 if has_grid else 0))
        n_hit = 0
        n_gf = 5 if (phase == "shade" and has_grid) else 0
        if phase == "shade":
            # t, hitf, ns(3), ng(3), eid, inva, bid [, sph][, uv2][, mn2]
            n_hit = (11 + (0 if tri_only else 1) + (2 if textured else 0)
                     + (2 if has_media else 0))
        sin = refs[1:1 + n_state]
        hin = refs[1 + n_state:1 + n_state + n_hit]
        # grid flight planes (t_med, is_med, weight rgb) follow the hit
        hin_grid = refs[1 + n_state + n_hit:1 + n_state + n_hit + n_gf]
        souts = refs[1 + n_state + n_hit + n_gf:
                     1 + 2 * n_state + n_hit + n_gf]
        ox, oy, oz = sin[2], sin[3], sin[4]
        dx, dy, dz = sin[5], sin[6], sin[7]
        r0, r1 = sin[0], sin[1]
    else:
        (ox, oy, oz, dx, dy, dz, r0, r1,
         out_r, out_g, out_b, *extra_outs) = refs
        if has_env:
            env_outs, extra_outs = extra_outs[:6], extra_outs[6:]
        else:
            env_outs = ()
        if count_stats:
            out_cn, out_cl = extra_outs[-2], extra_outs[-1]
            extra_outs = extra_outs[:-2]
        if textured:
            # per-bounce contribution groups + texture records + miss-bounce
            # (see trace_megakernel's deferred-texture epilogue)
            out_A, out_rec, out_mb = (extra_outs[0:3], extra_outs[3:6],
                                      extra_outs[6] if has_env else None)
    o_x0, o_y0, o_z0 = ox[:], oy[:], oz[:]
    d_x0, d_y0, d_z0 = dx[:], dy[:], dz[:]
    sx0, sy0 = r0[:], r1[:]
    shape = o_x0.shape
    f0 = jnp.zeros(shape, jnp.float32)
    f1 = jnp.ones(shape, jnp.float32)

    n_slots = SLOTS16 if node_fmt == "bf16" else SLOTS
    M_pad = rn * n_slots

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < 1e-8,
                               jnp.where(v < 0, -1e-8, 1e-8), v)

    def fetch_node(ptr):
        """Scalar node fields of slot ``ptr``. bf16 format: 32 B/node with
        conservatively-rounded packed AABBs (pack_nodes_bf16 — boxes only
        grow, so hits are identical), 3 paired extractions instead of 6."""
        if node_fmt == "bf16":
            row = nodes[pl.ds(ptr // SLOTS16, 1), :]
            sb = (ptr % SLOTS16) * SLOT_F16
            lo_x, hi_x = tk._unpack2_field(row, sb + 0)
            lo_y, hi_y = tk._unpack2_field(row, sb + 1)
            lo_z, hi_z = tk._unpack2_field(row, sb + 2)
            skip = _f(row, sb + 3).astype(jnp.int32)
            base = _f(row, sb + 4).astype(jnp.int32)
            cnt = _f(row, sb + 5).astype(jnp.int32)
        else:
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
        return lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, skip, base, cnt

    def fetch_prim(pid):
        """Prim geometry of slot ``pid``: (p0, e1, e2, is_sphere?, gid).
        t9 format (triangle-only): 9 fields, 14/row, gid == pid by
        construction (pack_prims_t9) so it is computed, not fetched."""
        if prim_fmt == "t9":
            prow = prims[pl.ds(pid // T9_PER_ROW, 1), :]
            pb = (pid % T9_PER_ROW) * 9
            is_sphf = None
            gid = f0 + pid.astype(jnp.float32)
        else:
            prow = prims[pl.ds(pid // SLOTS, 1), :]
            pb = (pid % SLOTS) * SLOT_F
            is_sphf = None if tri_only else (_f(prow, pb + 9) > 0.0)
            gid = _f(prow, pb + 10)
        ax = _f(prow, pb + 0)
        ay = _f(prow, pb + 1)
        az = _f(prow, pb + 2)
        ux = _f(prow, pb + 3)
        uy = _f(prow, pb + 4)
        uz = _f(prow, pb + 5)
        vx = _f(prow, pb + 6)
        vy = _f(prow, pb + 7)
        vz = _f(prow, pb + 8)
        return ax, ay, az, ux, uy, uz, vx, vy, vz, is_sphf, gid

    def fetch_attrs(pid):
        """Per-prim shading attrs. bf16 format packs 2 prims per 16-field
        slot (pack_attrs_bf16): 7 extractions instead of 12, half the VMEM.
        Normals quantized to bf16 (~0.4% — they are renormalized anyway);
        eid/bid are small ints, exact in bf16; inv_area stays f32 (MIS
        weight consistency with the NEE prim table)."""
        med_s = nul_s = None
        if attr_fmt == "bf16":
            arow = attrs[pl.ds(pid // (2 * SLOTS), 1), :]
            ab = (pid % (2 * SLOTS)) * (SLOT_F // 2)
            n0x, n0y = tk._unpack2_field(arow, ab + 0)
            n0z, n1x = tk._unpack2_field(arow, ab + 1)
            n1y, n1z = tk._unpack2_field(arow, ab + 2)
            n2x, n2y = tk._unpack2_field(arow, ab + 3)
            n2z, _sp = tk._unpack2_field(arow, ab + 4)
            eid_s, bid_s = tk._unpack2_field(arow, ab + 5)
            ia_s = _f(arow, ab + 6)
            if has_media:
                med_s, nul_s = tk._unpack2_field(arow, ab + 7)
        else:
            arow = attrs[pl.ds(pid // SLOTS, 1), :]
            ab = (pid % SLOTS) * SLOT_F
            n0x = _f(arow, ab + 0)
            n0y = _f(arow, ab + 1)
            n0z = _f(arow, ab + 2)
            n1x = _f(arow, ab + 3)
            n1y = _f(arow, ab + 4)
            n1z = _f(arow, ab + 5)
            n2x = _f(arow, ab + 6)
            n2y = _f(arow, ab + 7)
            n2z = _f(arow, ab + 8)
            eid_s = _f(arow, ab + 9)
            ia_s = _f(arow, ab + 10)
            bid_s = _f(arow, ab + 11)
            if has_media:
                med_s = _f(arow, ab + 12)
                nul_s = _f(arow, ab + 13)
        return (n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
                eid_s, ia_s, bid_s, med_s, nul_s)

    def fetch_uv(pid):
        """Per-vertex texture uvs of prim ``pid`` from the f32 uv table
        (pack_uvs: 6 fields x 21 prims per 128-lane row)."""
        urow = auv[pl.ds(pid // UV_PER_ROW, 1), :]
        ub = (pid % UV_PER_ROW) * 6
        return (_f(urow, ub + 0), _f(urow, ub + 1),
                _f(urow, ub + 2), _f(urow, ub + 3),
                _f(urow, ub + 4), _f(urow, ub + 5))

    # ---------------- BVH walks (adapted from traverse_kernel._kernel) ----
    def leaf_scan_closest(base, cnt, o_x, o_y, o_z,
                          d_x, d_y, d_z, carry):
        """Shared closest-hit leaf body: max_leaf prim tests with
        candidate attribute capture. Used by BOTH the binary skip
        walk and the 8-wide ordered stack walk (w8)."""
        (t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
         eidv, inva, sphv, bidv, uvc, mnc) = carry
        for k in range(max_leaf):
            pid = base + k
            (ax, ay, az, ux, uy, uz, vx, vy, vz,
             is_sph, gid) = fetch_prim(pid)

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

            if tri_only:
                # all-triangle scene (the reference's TRIANGLE_ONLY
                # flag, defines.cuh:26-27): the sphere quadratic and
                # its blends drop out of the hot loop statically
                t_k = t_tri
                shape_ok = tri_ok
            else:
                ocx = o_x - ax
                ocy = o_y - ay
                ocz = o_z - az
                bh = ocx * d_x + ocy * d_y + ocz * d_z
                cc = (ocx * ocx + ocy * ocy + ocz * ocz
                      - ux * ux)
                disc = bh * bh - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0s = -bh - sq
                t1s = -bh + sq
                t_sph = jnp.where(t0s > HIT_EPS, t0s, t1s)
                sph_ok = (disc > 0.0) & (t_sph > HIT_EPS)
                t_k = jnp.where(is_sph, t_sph, t_tri)
                shape_ok = (is_sph & sph_ok) | (~is_sph & tri_ok)
            ok = shape_ok & (k < cnt) & (t_k < t_best)

            if ablate == "slimleaf":
                # headroom probe for a traverse/shade split: capture only
                # (t, prim, u, v) per candidate — attrs would resolve via
                # XLA gathers between phases. Image is wrong (attrs stay
                # stale); timing bounds the split's best case.
                t_best = jnp.where(ok, t_k, t_best)
                prim = jnp.where(ok, gid, prim)
                nsx = jnp.where(ok, u, nsx)
                nsy = jnp.where(ok, v, nsy)
                continue

            # scalar attrs of this prim
            (n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
             eid_s, ia_s, bid_s, med_s, nul_s) = fetch_attrs(pid)

            # interpolated shading normal (tri) / center (sphere)
            w0 = 1.0 - u - v
            nx_t = w0 * n0x + u * n1x + v * n2x
            ny_t = w0 * n0y + u * n1y + v * n2y
            nz_t = w0 * n0z + u * n1z + v * n2z
            # geometric normal (tri): cross(e1, e2) — RAW; one
            # post-walk rsqrt replaces a normalize per candidate
            gx = uy * vz - uz * vy
            gy = uz * vx - ux * vz
            gz = ux * vy - uy * vx
            if tri_only:
                nx_i, ny_i, nz_i = nx_t, ny_t, nz_t
            else:
                nx_i = jnp.where(is_sph, ax, nx_t)
                ny_i = jnp.where(is_sph, ay, ny_t)
                nz_i = jnp.where(is_sph, az, nz_t)

            t_best = jnp.where(ok, t_k, t_best)
            prim = jnp.where(ok, gid, prim)
            nsx = jnp.where(ok, nx_i, nsx)
            nsy = jnp.where(ok, ny_i, nsy)
            nsz = jnp.where(ok, nz_i, nsz)
            ngx = jnp.where(ok, gx, ngx)
            ngy = jnp.where(ok, gy, ngy)
            ngz = jnp.where(ok, gz, ngz)
            eidv = jnp.where(ok, eid_s, eidv)
            inva = jnp.where(ok, ia_s, inva)
            if not tri_only:
                sphv = jnp.where(
                    ok, jnp.where(is_sph, 1.0, 0.0), sphv)
            bidv = jnp.where(ok, bid_s, bidv)
            if textured:
                uv0u, uv0v, uv1u, uv1v, uv2u, uv2v = fetch_uv(pid)
                tu_i = w0 * uv0u + u * uv1u + v * uv2u
                tv_i = w0 * uv0v + u * uv1v + v * uv2v
                uvc = (jnp.where(ok, tu_i, uvc[0]),
                       jnp.where(ok, tv_i, uvc[1]))
            if has_media:
                mnc = (jnp.where(ok, med_s, mnc[0]),
                       jnp.where(ok, nul_s, mnc[1]))
        return (t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
                eidv, inva, sphv, bidv, uvc, mnc)


    def walk_closest(o_x, o_y, o_z, d_x, d_y, d_z, live):
        """Closest hit + in-leaf attribute capture for lanes where ``live``.
        Dead lanes register no box hits, so a tile whose lanes have all
        died skips every leaf body (the packet-level compaction analogue).
        Returns a dict of (R, 128) vectors; ng is UNNORMALIZED (the caller
        normalizes once post-walk instead of per prim candidate).
        count_stats: also returns (node_iters, leaf_entries) scalars
        broadcast per lane — the roofline model's exact visit counts."""
        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        init = (jnp.int32(0), jnp.full(shape, jnp.inf), f0 - 1.0,  # t, prim
                f0, f0, f0,  # ns (or sphere center)
                f0, f0, f1,  # ng (raw cross product)
                f0,  # eid
                f0,  # inv_area
                f0,  # is_sphere
                f0,  # bsdf id
                (f0, f0) if textured else (),  # interpolated texture uv
                (f0 - 1.0, f0) if has_media else (),  # medium_in, is_null
                (f0, f0) if count_stats else ())  # node iters, leaf entries

        def cond(cr):
            return cr[0] < M_pad

        def body(cr):
            (ptr, t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
             eidv, inva, sphv, bidv, uvc, mnc, cstat) = cr
            (lo_x, lo_y, lo_z, hi_x, hi_y, hi_z,
             skip, base, cnt) = fetch_node(ptr)

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
                return leaf_scan_closest(base, cnt, o_x, o_y, o_z,
                                         d_x, d_y, d_z, carry)

            leaf_carry = (t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
                          eidv, inva, sphv, bidv, uvc, mnc)
            leaf_out = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                    lambda c: c, leaf_carry)
            if count_stats:
                take_leaf = jnp.where(any_hit & is_leaf, 1.0, 0.0)
                cstat = (cstat[0] + 1.0, cstat[1] + take_leaf)
            ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
            return (ptr_next,) + tuple(leaf_out) + (cstat,)

        out = jax.lax.while_loop(cond, body, init)
        (_, t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
         eidv, inva, sphv, bidv, uvc, mnc, cstat) = out
        return {
            "t": t_best, "hit": prim >= 0.0, "prim": prim,
            "nsx": nsx, "nsy": nsy, "nsz": nsz,
            "ngx": ngx, "ngy": ngy, "ngz": ngz,
            "eid": eidv, "inva": inva, "sph": sphv, "bid": bidv,
            "uv": uvc, "mn": mnc, "cstat": cstat,
        }

    def leaf_scan_any(base, cnt, o_x, o_y, o_z,
                      d_x, d_y, d_z, t_gate, occf):
        """Shared any-hit leaf body (shadow rays): occlusion flag
        update over max_leaf prim tests. Used by the binary skip
        walk and the 8-wide ordered stack walk (w8)."""
        # occluded flag carried as f32 through the cond too: Mosaic
        # cannot legalize scf.if with i1-vector operands/results
        occ2 = occf > 0.5
        for k in range(max_leaf):
            pid = base + k
            (ax, ay, az, ux, uy, uz, vx, vy, vz,
             is_sph, _gid) = fetch_prim(pid)

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
            if tri_only:
                t_k = t_tri
                shape_ok = tri_ok
            else:
                ocx = o_x - ax
                ocy = o_y - ay
                ocz = o_z - az
                bh = ocx * d_x + ocy * d_y + ocz * d_z
                cc = (ocx * ocx + ocy * ocy + ocz * ocz
                      - ux * ux)
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


    def walk_anyhit(o_x, o_y, o_z, d_x, d_y, d_z, t_lim, need):
        """Shadow test: True where a hit closer than t_lim*(1-1e-3) exists.
        Lanes with need=False never register hits (t_lim <= 0 sentinel)."""
        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        t_gate = jnp.where(need, t_lim * (1.0 - 1e-3), -1.0)
        # occluded carried as f32 0/1: bool vectors in while-carries are the
        # Mosaic-risky pattern (traverse_kernel history)
        init = (jnp.int32(0), f0, (f0, f0) if count_stats else ())

        def cond(cr):
            ptr, occf = cr[0], cr[1]
            return (ptr < M_pad) & jnp.any((occf < 0.5) & need)

        def body(cr):
            ptr, occf, cstat = cr
            occ = occf > 0.5
            (lo_x, lo_y, lo_z, hi_x, hi_y, hi_z,
             skip, base, cnt) = fetch_node(ptr)

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
                return leaf_scan_any(base, cnt, o_x, o_y, o_z,
                                     d_x, d_y, d_z, t_gate, occf)

            occf2 = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                 lambda o: o, occf)
            if count_stats:
                take_leaf = jnp.where(any_hit & is_leaf, 1.0, 0.0)
                cstat = (cstat[0] + 1.0, cstat[1] + take_leaf)
            ptr_next = jnp.where(any_hit & ~is_leaf, ptr + 1, skip)
            return ptr_next, occf2, cstat

        outw = jax.lax.while_loop(cond, body, init)
        return outw[1] > 0.5, outw[2]

    # ---------------- 8-wide ordered stack walks (node_fmt="w8") ----------
    # The binary skip walk visits nodes in FIXED DFS order, so t_best stays
    # loose while far geometry is tested first and the per-lane (tn<t_best)
    # cull rarely fires. These walks pop a tile-shared SMEM stack and push
    # hit children sorted far-to-near by tile-min entry distance, so close
    # subtrees tighten t_best before far ones are tested — the vector-machine
    # analogue of the reference's per-thread ordered descent
    # (src/renderer/tracing_func.cuh:117-181). One wide node row tests 8
    # child slabs per serial iteration (~8x fewer loop/decision overheads
    # than one-box-per-iteration; EXP_EXTRACT_AB: ~115 ns loop + ~150 ns per
    # scalar decision).
    #
    # Node row layout (pack_nodes_w8): child c at lane c*9 =
    # [lo(3), hi(3), enc, base, cnt]; enc >= 0 interior wide id, -1 leaf,
    # -2 empty. Stack entries: interior = wide id; leaf = -(base*16+cnt)-1
    # (base exact in f32 below 2^24 prim slots; cnt <= 14).
    _SORT8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
              (5, 7), (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6),
              (1, 4), (3, 6), (2, 4), (3, 5), (3, 4))

    def _w8_expand(e, o_x, o_y, o_z, ix, iy, iz, t_gate, live, sp1):
        """Expand interior wide node e: 8 slab tests, push hit children
        far-to-near onto the SMEM stack at sp1..; returns nothing (writes
        n_keep to w8_spn). Runs under @pl.when(is_interior)."""
        row = nodes[pl.ds(e, 1), :]
        keys = []
        ents = []
        nk = jnp.int32(0)
        for c in range(8):
            sb = c * 9
            lo_x = _f(row, sb + 0)
            lo_y = _f(row, sb + 1)
            lo_z = _f(row, sb + 2)
            hi_x = _f(row, sb + 3)
            hi_y = _f(row, sb + 4)
            hi_z = _f(row, sb + 5)
            encc = _f(row, sb + 6)
            basc = _f(row, sb + 7)
            cntc = _f(row, sb + 8)
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
            bh = (tn <= tf) & (tf > HIT_EPS) & (tn < t_gate) & live
            anyc = jnp.any(bh)
            # tile-min entry distance orders the push (ordering only —
            # correctness never depends on it)
            tnm = jnp.min(jnp.where(bh, tn, jnp.inf))
            keep = anyc & (encc > -1.5)
            key = jnp.where(keep, tnm, -jnp.inf)
            entf = jnp.where(encc >= -0.5, encc,
                             -(basc * 16.0 + cntc) - 1.0)
            keys.append(key)
            ents.append(entf.astype(jnp.int32))
            nk = nk + jnp.where(keep, 1, 0)
        # sort descending by key: keepers far->near first, rejects (-inf)
        # last — they land ABOVE the new sp and are never popped
        for (i, j) in _SORT8:
            swap = keys[i] < keys[j]
            ki = jnp.where(swap, keys[j], keys[i])
            kj = jnp.where(swap, keys[i], keys[j])
            ei = jnp.where(swap, ents[j], ents[i])
            ej = jnp.where(swap, ents[i], ents[j])
            keys[i], keys[j], ents[i], ents[j] = ki, kj, ei, ej
        for i in range(8):
            w8_stack[sp1 + i] = ents[i]
        w8_spn[0] = nk

    def walk_closest_w8(o_x, o_y, o_z, d_x, d_y, d_z, live):
        """Closest hit via the ordered 8-wide stack walk. Same contract as
        walk_closest (dict of (R,128) vectors, raw ng, count_stats)."""
        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        w8_stack[0] = jnp.int32(0)  # root wide node
        init = (jnp.int32(1),  # sp
                jnp.full(shape, jnp.inf), f0 - 1.0,
                f0, f0, f0,
                f0, f0, f1,
                f0, f0, f0, f0,
                (f0, f0) if textured else (),
                (f0 - 1.0, f0) if has_media else (),
                (f0, f0) if count_stats else ())

        def cond(cr):
            return cr[0] > 0

        def body(cr):
            (sp, t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
             eidv, inva, sphv, bidv, uvc, mnc, cstat) = cr
            sp1 = sp - 1
            e = w8_stack[sp1]
            is_int = e >= 0

            @pl.when(is_int)
            def _():
                _w8_expand(e, o_x, o_y, o_z, ix, iy, iz, t_best, live, sp1)

            v = -e - 1
            lb = v // 16
            lc = v - lb * 16

            def do_leaf(carry):
                return leaf_scan_closest(lb, lc, o_x, o_y, o_z,
                                         d_x, d_y, d_z, carry)

            leaf_carry = (t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
                          eidv, inva, sphv, bidv, uvc, mnc)
            leaf_out = jax.lax.cond(~is_int, do_leaf,
                                    lambda c: c, leaf_carry)
            if count_stats:
                cstat = (cstat[0] + 1.0,
                         cstat[1] + jnp.where(is_int, 0.0, 1.0))
            nk = w8_spn[0]
            sp_next = sp1 + jnp.where(is_int, nk, 0)
            return (sp_next,) + tuple(leaf_out) + (cstat,)

        out = jax.lax.while_loop(cond, body, init)
        (_, t_best, prim, nsx, nsy, nsz, ngx, ngy, ngz,
         eidv, inva, sphv, bidv, uvc, mnc, cstat) = out
        return {
            "t": t_best, "hit": prim >= 0.0, "prim": prim,
            "nsx": nsx, "nsy": nsy, "nsz": nsz,
            "ngx": ngx, "ngy": ngy, "ngz": ngz,
            "eid": eidv, "inva": inva, "sph": sphv, "bid": bidv,
            "uv": uvc, "mn": mnc, "cstat": cstat,
        }

    def walk_anyhit_w8(o_x, o_y, o_z, d_x, d_y, d_z, t_lim, need):
        """Shadow test via the 8-wide stack walk; early-exits the moment
        every needing lane is occluded (push order irrelevant for anyhit,
        but the shared expansion keeps one code path)."""
        ix, iy, iz = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        t_gate = jnp.where(need, t_lim * (1.0 - 1e-3), -1.0)
        w8_stack[0] = jnp.int32(0)
        init = (jnp.int32(1), f0, (f0, f0) if count_stats else ())

        def cond(cr):
            sp, occf = cr[0], cr[1]
            return (sp > 0) & jnp.any((occf < 0.5) & need)

        def body(cr):
            sp, occf, cstat = cr
            sp1 = sp - 1
            e = w8_stack[sp1]
            is_int = e >= 0
            occ = occf > 0.5
            gate = jnp.where(occ, -1.0, t_gate)

            @pl.when(is_int)
            def _():
                _w8_expand(e, o_x, o_y, o_z, ix, iy, iz, gate,
                           need & ~occ, sp1)

            v = -e - 1
            lb = v // 16
            lc = v - lb * 16

            def do_leaf(of):
                return leaf_scan_any(lb, lc, o_x, o_y, o_z,
                                     d_x, d_y, d_z, t_gate, of)

            occf2 = jax.lax.cond(~is_int, do_leaf, lambda o: o, occf)
            if count_stats:
                cstat = (cstat[0] + 1.0,
                         cstat[1] + jnp.where(is_int, 0.0, 1.0))
            nk = w8_spn[0]
            sp_next = sp1 + jnp.where(is_int, nk, 0)
            return sp_next, occf2, cstat

        outw = jax.lax.while_loop(cond, body, init)
        return outw[1] > 0.5, outw[2]

    if node_fmt == "w8":
        walk_closest = walk_closest_w8
        walk_anyhit = walk_anyhit_w8

    # ---------------- walk ablations (on-chip cost decomposition) ---------
    # ablate="noshadow": any-hit walks report unoccluded instantly (full -
    # noshadow = shadow-walk share). ablate="nowalk": closest walks also
    # return a fixed synthetic hit (noshadow - nowalk = closest-walk share;
    # nowalk alone ~ shading + driver). Diagnostic only — images are wrong.
    if ablate in ("noshadow", "nowalk"):
        def walk_anyhit(o_x, o_y, o_z, d_x, d_y, d_z, t_lim, need):  # noqa: F811
            return jnp.zeros(shape, bool), ((f0, f0) if count_stats else ())
    if ablate == "nowalk":
        def walk_closest(o_x, o_y, o_z, d_x, d_y, d_z, live):  # noqa: F811
            return {"t": f1, "hit": live, "nsx": f0, "nsy": f0, "nsz": f1,
                    "ngx": f0, "ngy": f0, "ngz": f1, "eid": f0 - 1.0,
                    "inva": f1, "sph": f0, "bid": f0,
                    "uv": (f0 + 0.5, f0 + 0.5) if textured else (),
                    "mn": (f0 - 1.0, f0) if has_media else (),
                    "prim": f0,
                    "cstat": (f0, f0) if count_stats else ()}

    if phase == "traverse":
        # slim walk only: ablate=="slimleaf" (set by the split driver)
        # routes (u, v) through the nsx/nsy carries; "prim" carries gid
        hit = walk_closest(ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
                           act_in[:] > 0.5)
        t_out[:] = hit["t"]
        gid_out[:] = hit["prim"]
        u_out[:] = hit["nsx"]
        v_out[:] = hit["nsy"]
        return

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
            "falloff": _f(erow_v, sb + 10),
        }

    efields = [emitter_fields(i) for i in range(n_eslots)]

    def emitter_lookup(eid_vec):
        """Per-lane (em_rgb, pmf, etype, pos, kmax, falloff) via masked
        scalar loop. falloff = spot-cone cos threshold (-1 = no gate)."""
        em_r = em_g = em_b = pmf = ety = px = py = pz = kmx = f0
        fall = f0 - 1.0
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
            fall = jnp.where(m, ef["falloff"], fall)
        return em_r, em_g, em_b, pmf, ety, px, py, pz, kmx, fall

    n_eprim_rows = eprims.shape[0]

    # ---------------- media helpers (fused VPT, volume_pt.py parity) ------
    if has_media:
        mrow_v = mrow[:]  # (1, 128): 8 media x 16 fields (pack_media)

        def _mfield(i, j):
            return _f(mrow_v, i * SLOT_F + j)

        def medium_sigma_t(midv):
            """(st_r, st_g, st_b) of per-lane medium ids (masked loop)."""
            st_r = st_g = st_b = f0
            for i in range(n_media):
                m = midv == float(i)
                st_r = jnp.where(m, _mfield(i, 6), st_r)
                st_g = jnp.where(m, _mfield(i, 7), st_g)
                st_b = jnp.where(m, _mfield(i, 8), st_b)
            return st_r, st_g, st_b

        def medium_fields(midv):
            """Full per-lane medium row: sigma_s, sigma_t, phase params."""
            ssr = ssg = ssb = st_r = st_g = st_b = f0
            pty = pg1 = pg2 = f0
            pwv = f1
            for i in range(n_media):
                m = midv == float(i)
                ssr = jnp.where(m, _mfield(i, 3), ssr)
                ssg = jnp.where(m, _mfield(i, 4), ssg)
                ssb = jnp.where(m, _mfield(i, 5), ssb)
                st_r = jnp.where(m, _mfield(i, 6), st_r)
                st_g = jnp.where(m, _mfield(i, 7), st_g)
                st_b = jnp.where(m, _mfield(i, 8), st_b)
                pty = jnp.where(m, _mfield(i, 9), pty)
                pg1 = jnp.where(m, _mfield(i, 10), pg1)
                pg2 = jnp.where(m, _mfield(i, 11), pg2)
                pwv = jnp.where(m, _mfield(i, 12), pwv)
            if has_grid:
                grd = f0
                for i in range(n_media):
                    grd = jnp.where(midv == float(i), _mfield(i, 13), grd)
                return (ssr, ssg, ssb, st_r, st_g, st_b, pty, pg1, pg2,
                        pwv, grd)
            return (ssr, ssg, ssb, st_r, st_g, st_b, pty, pg1, pg2, pwv,
                    f0)

        def phase_value(pty, pg1, pg2, pwv, cos_t):
            """Phase value (= pdf) at cos_t (media/phase.phase_eval)."""
            inv4pi = 0.07957747154594767

            def hg(g):
                g_safe = jnp.where(jnp.abs(g) < 1e-3,
                                   jnp.where(g < 0, -1e-3, 1e-3), g)
                den = 1.0 + g_safe * g_safe - 2.0 * g_safe * cos_t
                den = jnp.maximum(den, 1e-8)
                return (inv4pi * (1.0 - g_safe * g_safe)
                        / (den * jnp.sqrt(den)))

            iso = f0 + inv4pi
            dual = pwv * hg(pg1) + (1.0 - pwv) * hg(pg2)
            ray = 0.75 * inv4pi * (1.0 + cos_t * cos_t)
            out = iso
            out = jnp.where(pty == float(T.PHASE_HG), hg(pg1), out)
            out = jnp.where(pty == float(T.PHASE_DUAL_HG), dual, out)
            out = jnp.where(pty == float(T.PHASE_RAYLEIGH), ray, out)
            return out

        def walk_transmittance(wox, woy, woz, wdx, wdy, wdz, dist, med0,
                               need):
            """NEE shadow transmittance through ≤ MAX_CROSSINGS null
            interfaces (volume_pt.transmittance_estimate): per-segment
            analytic homogeneous transmittance, opaque hit → 0, medium
            toggled per crossing by object identity."""
            trr = trg = trb = f1
            cur = med0
            rem = dist
            alive = need
            cox, coy, coz = wox, woy, woz
            tcs = (f0, f0) if count_stats else ()
            for _ in range(4):  # volume_pt.MAX_CROSSINGS
                h = walk_closest(cox, coy, coz, wdx, wdy, wdz, alive)
                if count_stats:
                    tcs = (tcs[0] + h["cstat"][0], tcs[1] + h["cstat"][1])
                st_r, st_g, st_b = medium_sigma_t(cur)
                seg = jnp.minimum(jnp.where(h["hit"], h["t"], rem), rem)
                inm = (cur >= 0.0) & alive
                trr = trr * jnp.where(inm, jnp.exp(-st_r * seg), 1.0)
                trg = trg * jnp.where(inm, jnp.exp(-st_g * seg), 1.0)
                trb = trb * jnp.where(inm, jnp.exp(-st_b * seg), 1.0)
                hit_sf = h["hit"] & (h["t"] < rem * (1.0 - 1e-3)) & alive
                med_obj, nulf = h["mn"]
                is_null = nulf > 0.5
                blocked = hit_sf & ~is_null
                zf = jnp.where(blocked, 0.0, 1.0)
                trr, trg, trb = trr * zf, trg * zf, trb * zf
                crossed = hit_sf & is_null
                toggled = jnp.where(cur == med_obj, f0 - 1.0, med_obj)
                cur = jnp.where(crossed & (med_obj >= 0.0), toggled, cur)
                t_step = jnp.where(h["hit"], h["t"], rem)
                adv = t_step + 1e-3
                cox = jnp.where(crossed, cox + adv * wdx, cox)
                coy = jnp.where(crossed, coy + adv * wdy, coy)
                coz = jnp.where(crossed, coz + adv * wdz, coz)
                # rem -= FULL advance (incl. the 1e-3 offset) so rem stays
                # the true distance-to-light from the advanced origin;
                # decrementing by t_step alone lets offsets accumulate
                # until the destination light passes the (1-1e-3) gate and
                # blocks its own shadow ray (volume_pt same fix)
                rem = jnp.where(crossed, rem - adv, rem)
                alive = alive & crossed & (rem > 1e-4)
            return trr, trg, trb, tcs

    # ---------------- the bounce loop --------------------------------------
    def bounce_cond(cr):
        return (cr[0] < max_depth) & jnp.any(cr[15] > 0.5)

    D1 = max_depth + 1

    def bounce_body(cr):
        (bounce, sx, sy, o_x, o_y, o_z, d_x, d_y, d_z,
         tr, tg, tb, Lr, Lg, Lb, act, prev_pdf, prev_delta, n_diff,
         n_spec, n_trans, mdx, mdy, mdz, mtr, mtg, mtb, wl,
         tex_state, med_state, stats) = cr
        if deferred_tex:
            A, rec, mbv = tex_state
            A = list(A)
            rec = list(rec)
        elif inline_tex:
            # per-call records: this bounce's NEE contribution (pre-texel)
            # + hit (bid, uv); the swf driver multiplies the texel in
            nee_r = nee_g = nee_b = f0
            bid_rec = f0 - 1.0
            u_rec = v_rec = f0

        if phase == "shade":
            # closest hit from the traverse phase + XLA attr resolution
            # (split driver) — same field contract as walk_closest
            k = 0
            hit = {"t": hin[0][:], "hit": hin[1][:] > 0.5,
                   "nsx": hin[2][:], "nsy": hin[3][:], "nsz": hin[4][:],
                   "ngx": hin[5][:], "ngy": hin[6][:], "ngz": hin[7][:],
                   "eid": hin[8][:], "inva": hin[9][:]}
            k = 10
            if tri_only:
                hit["sph"] = f0
                hit["bid"] = hin[k][:]
                k += 1
            else:
                hit["sph"] = hin[k][:]
                hit["bid"] = hin[k + 1][:]
                k += 2
            if textured:
                hit["uv"] = (hin[k][:], hin[k + 1][:])
                k += 2
            if has_media:
                hit["mn"] = (hin[k][:], hin[k + 1][:])
                k += 2
            hit["cstat"] = ()
        else:
            hit = walk_closest(o_x, o_y, o_z, d_x, d_y, d_z, act > 0.5)
        hit_ok = hit["hit"] & (act > 0.5)
        if count_stats:
            stats = (stats[0] + hit["cstat"][0],
                     stats[1] + hit["cstat"][1])

        if has_media:
            # ---- free flight through the current medium (volume_pt.py
            # vpt_bounce + homogeneous.sample_distance, channel-MIS) ------
            stk0, stk1, stk2, mtop, n_vol = med_state
            # empty stack -> ambient medium (scene.cam_medium; volume_pt
            # _peek's fallback — supports camera-in-medium scenes)
            cur_med = jnp.where(mtop >= 2.0, stk2,
                                jnp.where(mtop >= 1.0, stk1,
                                          jnp.where(mtop >= 0.0, stk0,
                                                    f0 + ambient_med)))
            (m_ssr, m_ssg, m_ssb, m_str, m_stg, m_stb,
             m_pty, m_pg1, m_pg2, m_pwv, m_grd) = medium_fields(cur_med)
            in_med = (cur_med >= 0.0) & (act > 0.5)
            sx, sy = _pcg2d(sx, sy)
            u_ch = _u01(sx)
            u_t = _u01(sy)
            st_c = jnp.where(u_ch >= (2.0 / 3.0), m_stb,
                             jnp.where(u_ch >= (1.0 / 3.0), m_stg, m_str))
            st_c = jnp.maximum(st_c, 1e-8)
            t_med = -jnp.log(jnp.maximum(1.0 - u_t, 1e-12)) / st_c
            t_surf = jnp.where(hit_ok, hit["t"], 1e8)
            med_event = in_med & (t_med < t_surf)
            if has_grid:
                # grid-media flight arrives from the XLA delta-tracking
                # pre-pass (split driver): event distance + flag +
                # per-channel weight (albedo on real collisions, attached
                # null-collision ratios otherwise). Grid rows carry zero
                # sigmas, so every analytic exp below is exactly 1 for
                # grid lanes and the hom weights reduce to 1/pdf_s = 1.
                in_grid = in_med & (m_grd > 0.5)
                g_tmed, g_ismed = hin_grid[0][:], hin_grid[1][:]
                med_event = jnp.where(in_grid, (g_ismed > 0.5)
                                      & (g_tmed < t_surf), med_event)
                t_med = jnp.where(in_grid, g_tmed, t_med)
            srf_event = hit_ok & ~med_event
            t_evt = jnp.where(med_event, t_med, t_surf)
            e_r = jnp.exp(-m_str * t_evt)
            e_g = jnp.exp(-m_stg * t_evt)
            e_b = jnp.exp(-m_stb * t_evt)
            pdf_m = (m_str * e_r + m_stg * e_g + m_stb * e_b) / 3.0
            pdf_s = (e_r + e_g + e_b) / 3.0
            mw_r = jnp.where(med_event, m_ssr * e_r / jnp.maximum(pdf_m, 1e-12),
                             e_r / jnp.maximum(pdf_s, 1e-12))
            mw_g = jnp.where(med_event, m_ssg * e_g / jnp.maximum(pdf_m, 1e-12),
                             e_g / jnp.maximum(pdf_s, 1e-12))
            mw_b = jnp.where(med_event, m_ssb * e_b / jnp.maximum(pdf_m, 1e-12),
                             e_b / jnp.maximum(pdf_s, 1e-12))
            if has_grid:
                mw_r = jnp.where(in_grid, hin_grid[2][:], mw_r)
                mw_g = jnp.where(in_grid, hin_grid[3][:], mw_g)
                mw_b = jnp.where(in_grid, hin_grid[4][:], mw_b)
            tr = jnp.where(in_med, tr * mw_r, tr)
            tg = jnp.where(in_med, tg * mw_g, tg)
            tb = jnp.where(in_med, tb * mw_b, tb)
        else:
            med_event = None
            srf_event = hit_ok
            t_evt = jnp.where(hit_ok, hit["t"], 1.0)

        if deferred_tex and has_env:
            missed_t = (act > 0.5) & ~hit["hit"]
            if has_media:
                missed_t = missed_t & ~med_event
            mbv = jnp.where(missed_t, f0 + bounce.astype(jnp.float32), mbv)
        if has_env:
            # environment miss record: each lane escapes at most once (it
            # dies right after), so a plain first-write blend captures the
            # miss direction + throughput; the XLA epilogue in
            # trace_megakernel resolves radiance (emitters.env_radiance)
            # with MIS weight 1 — env directions are never NEE-sampled
            # in-kernel, so BSDF sampling is the sole strategy for them.
            missed = (act > 0.5) & ~hit["hit"]
            if has_media:
                # an in-medium miss is (almost surely) a volume event, and
                # the medium weight above already rode into the throughput
                missed = missed & ~med_event
            mdx = jnp.where(missed, d_x, mdx)
            mdy = jnp.where(missed, d_y, mdy)
            mdz = jnp.where(missed, d_z, mdz)
            mtr = jnp.where(missed, tr, mtr)
            mtg = jnp.where(missed, tg, mtg)
            mtb = jnp.where(missed, tb, mtb)
        t_safe = t_evt
        px_ = o_x + t_safe * d_x
        py_ = o_y + t_safe * d_y
        pz_ = o_z + t_safe * d_z

        # normals: sphere → (p - c)/|p - c| for both; tri → interp ns, ng.
        # The walk returns ng UNNORMALIZED (raw cross) — one rsqrt here
        # replaces a normalize per leaf candidate.
        gl_ = jax.lax.rsqrt(hit["ngx"] * hit["ngx"] + hit["ngy"] * hit["ngy"]
                            + hit["ngz"] * hit["ngz"] + 1e-20)
        tgx = hit["ngx"] * gl_
        tgy = hit["ngy"] * gl_
        tgz = hit["ngz"] * gl_
        nl_ = jax.lax.rsqrt(hit["nsx"] * hit["nsx"] + hit["nsy"] * hit["nsy"]
                            + hit["nsz"] * hit["nsz"] + 1e-20)
        if tri_only:
            nsx = hit["nsx"] * nl_
            nsy = hit["nsy"] * nl_
            nsz = hit["nsz"] * nl_
        else:
            is_sph = hit["sph"] > 0.5
            spx = px_ - hit["nsx"]
            spy = py_ - hit["nsy"]
            spz = pz_ - hit["nsz"]
            sl = jax.lax.rsqrt(spx * spx + spy * spy + spz * spz + 1e-20)
            nsx = jnp.where(is_sph, spx * sl, hit["nsx"] * nl_)
            nsy = jnp.where(is_sph, spy * sl, hit["nsy"] * nl_)
            nsz = jnp.where(is_sph, spz * sl, hit["nsz"] * nl_)
        # flip ng into the shading hemisphere (intersect.py:140)
        gdot = tgx * nsx + tgy * nsy + tgz * nsz
        gsign = jnp.where(gdot < 0.0, -1.0, 1.0)
        if tri_only:
            ngx = tgx * gsign
            ngy = tgy * gsign
            ngz = tgz * gsign
        else:
            ngx = jnp.where(is_sph, nsx, tgx * gsign)
            ngy = jnp.where(is_sph, nsy, tgy * gsign)
            ngz = jnp.where(is_sph, nsz, tgz * gsign)

        # ---- emitter-hit MIS ------------------------------------------
        eid_hit = hit["eid"]
        cos_l = -(d_x * ngx + d_y * ngy + d_z * ngz)
        (hem_r, hem_g, hem_b, hpmf, _, _, _, _, _,
         hfall) = emitter_lookup(eid_hit)
        pdf_l = hpmf * hit["inva"] * (t_safe * t_safe) / jnp.maximum(cos_l, 1e-6)
        rmis = pdf_l / jnp.maximum(prev_pdf, 1e-12)
        w_hit = jnp.where(prev_delta > 0.5, 1.0,
                          jnp.where(prev_pdf > 0.0,
                                    1.0 / (1.0 + rmis * rmis), 0.0))
        # AREA_SPOT cone gate on the hit side (emitters.py:39-52): Le is
        # zero outside the cone, matching the NEE gate so MIS stays exact
        emit_m = (srf_event & (eid_hit > 0.5) & (cos_l > 1e-6)
                  & (cos_l >= hfall))
        emw = jnp.where(emit_m, w_hit, 0.0)
        if deferred_tex:
            # deferred-texture epilogue: the emitter-hit contribution at
            # bounce k carries the kd-texture factors of bounces < k, so
            # it lands in group k (static blend — bounce is tile-uniform)
            for kb in range(max_depth):
                mkb = bounce == kb
                A[kb] = A[kb] + jnp.where(mkb, tr * hem_r * emw, 0.0)
                A[D1 + kb] = A[D1 + kb] + jnp.where(
                    mkb, tg * hem_g * emw, 0.0)
                A[2 * D1 + kb] = A[2 * D1 + kb] + jnp.where(
                    mkb, tb * hem_b * emw, 0.0)
        else:
            # inline_tex included: thp already carries all resolved texels
            Lr = Lr + tr * hem_r * emw
            Lg = Lg + tg * hem_g * emw
            Lb = Lb + tb * hem_b * emw

        # ---- material lookup (in-kernel make_ctx, bsdf/eval.py:43-74) ---
        bidv = hit["bid"]
        kdr = kdg = kdb = f0
        ksr = ksg = ksb = f0
        kgr = kgg = kgb = f0
        etr = etg = etb = f0
        kkr = kkg = kkb = f0
        iorv = f0 + 1.5
        axv = f0 + 1e-4
        ayv = f0 + 1e-4
        thv = f0
        cav = f0 + 1.5
        cbv = f0
        btypev = f0
        for bi in range(n_bsdfs):
            ra = brows[pl.ds((2 * bi) // SLOTS, 1), :]
            rb = brows[pl.ds((2 * bi + 1) // SLOTS, 1), :]
            sa = ((2 * bi) % SLOTS) * SLOT_F
            sb2 = ((2 * bi + 1) % SLOTS) * SLOT_F
            m = bidv == float(bi)
            btypev = jnp.where(m, _f(ra, sa + 0), btypev)
            kdr = jnp.where(m, _f(ra, sa + 1), kdr)
            kdg = jnp.where(m, _f(ra, sa + 2), kdg)
            kdb = jnp.where(m, _f(ra, sa + 3), kdb)
            ksr = jnp.where(m, _f(ra, sa + 4), ksr)
            ksg = jnp.where(m, _f(ra, sa + 5), ksg)
            ksb = jnp.where(m, _f(ra, sa + 6), ksb)
            kgr = jnp.where(m, _f(ra, sa + 7), kgr)
            kgg = jnp.where(m, _f(ra, sa + 8), kgg)
            kgb = jnp.where(m, _f(ra, sa + 9), kgb)
            iorv = jnp.where(m, _f(ra, sa + 10), iorv)
            axv = jnp.where(m, _f(ra, sa + 11), axv)
            ayv = jnp.where(m, _f(ra, sa + 12), ayv)
            etr = jnp.where(m, _f(rb, sb2 + 0), etr)
            etg = jnp.where(m, _f(rb, sb2 + 1), etg)
            etb = jnp.where(m, _f(rb, sb2 + 2), etb)
            kkr = jnp.where(m, _f(rb, sb2 + 3), kkr)
            kkg = jnp.where(m, _f(rb, sb2 + 4), kkg)
            kkb = jnp.where(m, _f(rb, sb2 + 5), kkb)
            thv = jnp.where(m, _f(rb, sb2 + 6), thv)
            if has_disp:
                cav = jnp.where(m, _f(rb, sb2 + 7), cav)
                cbv = jnp.where(m, _f(rb, sb2 + 8), cbv)
        is_lam = btypev == float(T.BSDF_LAMBERTIAN)
        is_spec = btypev == float(T.BSDF_SPECULAR)
        is_tr = btypev == float(T.BSDF_TRANSLUCENT)
        is_ggx = btypev == float(T.BSDF_GGX_CONDUCTOR)
        is_pla = btypev == float(T.BSDF_PLASTIC)
        is_rd = btypev == float(T.BSDF_GGX_DIELECTRIC)
        is_on = btypev == float(T.BSDF_OREN_NAYAR)
        is_fwd = btypev == float(T.BSDF_FORWARD)
        is_dsp = (btypev == float(T.BSDF_DISPERSION)) if has_disp else None

        # nl = shading normal flipped toward wo (bsdf/eval.py:_flip_to)
        wo_dot_n = -(d_x * nsx + d_y * nsy + d_z * nsz)  # = cos_signed
        nsign = jnp.where(wo_dot_n < 0.0, -1.0, 1.0)
        nlx = nsx * nsign
        nly = nsy * nsign
        nlz = nsz * nsign
        entering = wo_dot_n > 0.0
        # ONB of nl (math.py:59-72, Duff/Frisvad) — shared by GGX local
        # frames and the cosine-hemisphere to_world
        bsig = jnp.where(nlz >= 0.0, 1.0, -1.0)
        aon = -1.0 / (bsig + nlz)
        bon = nlx * nly * aon
        t1x = 1.0 + bsig * nlx * nlx * aon
        t1y = bsig * bon
        t1z = -bsig * nlx
        t2x = bon
        t2y = bsig + nly * nly * aon
        t2z = -nly
        # wo in the local frame (z = nl)
        wox, woy, woz = -d_x, -d_y, -d_z
        wo_lx = wox * t1x + woy * t1y + woz * t1z
        wo_ly = wox * t2x + woy * t2y + woz * t2z
        wo_lz = wox * nlx + woy * nly + woz * nlz

        def ggx_lambda(wx, wy, wz):
            cz = jnp.abs(wz)
            a2 = (wx * axv) ** 2 + (wy * ayv) ** 2
            t2_ = a2 / jnp.maximum(cz * cz, 1e-10)
            return 0.5 * (jnp.sqrt(1.0 + t2_) - 1.0)

        def ggx_ndf(hx, hy, hz):
            x_ = hx / jnp.maximum(axv, 1e-5)
            y_ = hy / jnp.maximum(ayv, 1e-5)
            t_ = x_ * x_ + y_ * y_ + hz * hz
            d_ = 1.0 / (jnp.pi * axv * ayv * jnp.maximum(t_ * t_, 1e-12))
            return jnp.where(hz > 0.0, d_, 0.0)

        def fres_diel(c, e):
            # bsdf/fresnel.py:15-28 (returns 1 under TIR)
            c = jnp.clip(c, 0.0, 1.0)
            s2t = (1.0 - c * c) / jnp.maximum(e * e, 1e-8)
            tir_ = s2t >= 1.0
            ct_ = jnp.sqrt(jnp.maximum(1.0 - s2t, 0.0))
            rpar = (e * c - ct_) / jnp.maximum(e * c + ct_, 1e-8)
            rper = (c - e * ct_) / jnp.maximum(c + e * ct_, 1e-8)
            fv = jnp.clip(0.5 * (rpar * rpar + rper * rper), 0.0, 1.0)
            return jnp.where(tir_, 1.0, fv)

        def fresnel_cond(c, eta_c, k_c):
            c = jnp.clip(c, 1e-5, 1.0)
            c2 = c * c
            s2 = 1.0 - c2
            e2 = eta_c * eta_c
            k2 = k_c * k_c
            tq0 = e2 - k2 - s2
            a2b2 = jnp.sqrt(jnp.maximum(tq0 * tq0 + 4.0 * e2 * k2, 0.0))
            tq1 = a2b2 + c2
            aq = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + tq0), 0.0))
            tq2 = 2.0 * aq * c
            rs = (tq1 - tq2) / jnp.maximum(tq1 + tq2, 1e-8)
            tq3 = c2 * a2b2 + s2 * s2
            tq4 = tq2 * s2
            rp = rs * (tq3 - tq4) / jnp.maximum(tq3 + tq4, 1e-8)
            return jnp.clip(0.5 * (rp + rs), 0.0, 1.0)

        def oren_nayar(wo_lz_, wi_lz_, dot_xy):
            # bsdf/eval.py:76-97 fast A/B form; sigma rides axv
            s2_ = axv * axv
            A_ = 1.0 - 0.5 * s2_ / (s2_ + 0.33)
            Bc = 0.45 * s2_ / (s2_ + 0.09)
            cto = jnp.clip(wo_lz_, 1e-6, 1.0)
            cti = jnp.clip(wi_lz_, 1e-6, 1.0)
            sto = jnp.sqrt(jnp.maximum(1.0 - cto * cto, 0.0))
            sti = jnp.sqrt(jnp.maximum(1.0 - cti * cti, 0.0))
            cdphi = jnp.clip(dot_xy / jnp.maximum(sto * sti, 1e-6),
                             -1.0, 1.0)
            sin_a = jnp.maximum(sto, sti)
            tan_b = jnp.minimum(sto, sti) / jnp.maximum(
                jnp.maximum(cto, cti), 1e-6)
            return A_ + Bc * jnp.maximum(cdphi, 0.0) * sin_a * tan_b

        def vndf_pdf(doh_abs, hx, hy, hz):
            d_ = ggx_ndf(hx, hy, hz)
            g1_ = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, wo_lz))
            return (g1_ * d_ * doh_abs / jnp.maximum(jnp.abs(wo_lz), 1e-6)
                    / jnp.maximum(4.0 * doh_abs, 1e-8))


        # candidate-independent shading constants (hoisted out of the NEE
        # candidate loop; also used by the BSDF-sample stage below)
        cos_o_p = jnp.abs(wo_dot_n)
        f_o_p = fres_diel(cos_o_p, iorv)
        fdr_p = jnp.clip(
            -1.4399 / jnp.maximum(iorv * iorv, 1.0)
            + 0.7099 / jnp.maximum(iorv, 1.0 + 1e-4)
            + 0.6681 + 0.0636 * iorv, 0.0, 0.999)
        klen = jnp.sqrt(kkr * kkr + kkg * kkg + kkb * kkb)
        ior2 = iorv * iorv
        p_spec_p = jnp.clip(f_o_p, 0.1, 0.9)
        e_rd = jnp.where(entering, iorv, 1.0 / jnp.maximum(iorv, 1e-4))
        coso_c = jnp.maximum(wo_lz, 1e-5)
        lamf = jnp.where(is_lam, 1.0, 0.0)
        onf = jnp.where(is_on, 1.0, 0.0)

        def nee_one(sx, sy):
            """One NEE candidate: draws (3 pcg advances), emitter/prim
            selection, light point, and the per-candidate BSDF eval toward
            it — the in-kernel sample_emitter + eval_bsdf pair. Returns
            (sx, sy, cand) with all cand fields f32 so the RIS reservoir
            blends stay Mosaic-legal."""
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
             skmax, sfall) = emitter_lookup(eid_sel)
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
            # AREA_SPOT cone gate on the NEE side (emitters.py:150-155):
            # radiance zero outside the cone; the pdf is unchanged
            cone_ok = is_point | (lcos >= sfall)
            le_r = jnp.where(is_point, sem_r * inv_r2,
                             jnp.where(cone_ok, sem_r, 0.0))
            le_g = jnp.where(is_point, sem_g * inv_r2,
                             jnp.where(cone_ok, sem_g, 0.0))
            le_b = jnp.where(is_point, sem_b * inv_r2,
                             jnp.where(cone_ok, sem_b, 0.0))
            es_pdf = jnp.where(is_point, sel_pdf, pdf_area)
            le_max = jnp.maximum(le_r, jnp.maximum(le_g, le_b))
            es_valid = ((is_point | front) & (setype != float(T.EMITTER_NULL))
                        & (le_max > 0.0) & (es_pdf > 1e-12))


            # ---- NEE f·cos and pdf (bsdf/eval.py:eval_bsdf) -----------------
            cos_i = es_dx * nlx + es_dy * nly + es_dz * nlz
            same_side = cos_i > 0.0
            cos_ic = jnp.maximum(cos_i, 0.0)
            ffac = _INV_PI * cos_ic
            # GGX eval toward the light
            wi_lx = es_dx * t1x + es_dy * t1y + es_dz * t1z
            wi_ly = es_dx * t2x + es_dy * t2y + es_dz * t2z
            wi_lz = cos_i
            hsx = wo_lx + wi_lx
            hsy = wo_ly + wi_ly
            hsz = wo_lz + wi_lz
            hsl = jax.lax.rsqrt(hsx * hsx + hsy * hsy + hsz * hsz + 1e-20)
            hsx, hsy, hsz = hsx * hsl, hsy * hsl, hsz * hsl
            d_ndf = ggx_ndf(hsx, hsy, hsz)
            g2v = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, wo_lz)
                         + ggx_lambda(wi_lx, wi_ly, wi_lz))
            doh_e = jnp.abs(wo_lx * hsx + wo_ly * hsy + wo_lz * hsz)
            spec_fac = d_ndf * g2v / jnp.maximum(4.0 * jnp.abs(wo_lz), 1e-6)
            fg_r = fresnel_cond(doh_e, etr, kkr) * kgr * spec_fac
            fg_g = fresnel_cond(doh_e, etg, kkg) * kgg * spec_fac
            fg_b = fresnel_cond(doh_e, etb, kkb) * kgb * spec_fac
            pdf_ggx_e = vndf_pdf(doh_e, hsx, hsy, hsz)
            # plastic diffuse substrate toward the light (bsdf/eval.py:145-171)
            f_i_e = fres_diel(cos_ic, iorv)
            absorb_e = jnp.exp(-klen * thv * (1.0 / jnp.maximum(cos_ic, 1e-4)
                                              + 1.0 / jnp.maximum(cos_o_p, 1e-4)))
            pfac = (1.0 - f_o_p) * (1.0 - f_i_e) * _INV_PI * cos_ic * absorb_e
            fp_r = kdr * pfac / (jnp.maximum(1.0 - kdr * fdr_p, 0.05) * ior2)
            fp_g = kdg * pfac / (jnp.maximum(1.0 - kdg * fdr_p, 0.05) * ior2)
            fp_b = kdb * pfac / (jnp.maximum(1.0 - kdb * fdr_p, 0.05) * ior2)
            pdf_pla_e = (1.0 - p_spec_p) * jnp.maximum(cos_i, 0.0) * _INV_PI

            # rough dielectric toward the light (bsdf/eval.py:208-249) — the
            # transmission lobe is smooth, so it joins NEE on BOTH sides
            refl_e = wi_lz > 0.0
            hrx, hry, hrz = wo_lx + wi_lx, wo_ly + wi_ly, coso_c + wi_lz
            hrl = jax.lax.rsqrt(hrx * hrx + hry * hry + hrz * hrz + 1e-20)
            htx = -(wo_lx + e_rd * wi_lx)
            hty = -(wo_ly + e_rd * wi_ly)
            htz = -(coso_c + e_rd * wi_lz)
            htl = jax.lax.rsqrt(htx * htx + hty * hty + htz * htz + 1e-20)
            hts = jnp.where(htz * htl < 0.0, -1.0, 1.0)
            hex_ = jnp.where(refl_e, hrx * hrl, htx * htl * hts)
            hey = jnp.where(refl_e, hry * hrl, hty * htl * hts)
            hez = jnp.where(refl_e, hrz * hrl, htz * htl * hts)
            coh_e = wo_lx * hex_ + wo_ly * hey + coso_c * hez
            wih_e = wi_lx * hex_ + wi_ly * hey + wi_lz * hez
            d_rd = ggx_ndf(hex_, hey, hez)
            g1_rd = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, coso_c))
            g2_rd = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, coso_c)
                           + ggx_lambda(wi_lx, wi_ly, wi_lz))
            F_rd = fres_diel(jnp.maximum(coh_e, 0.0), e_rd)
            dv_rd = g1_rd * d_rd * jnp.maximum(coh_e, 0.0) / coso_c
            frd_refl = F_rd * d_rd * g2_rd / jnp.maximum(4.0 * coso_c, 1e-6)
            prd_refl = F_rd * dv_rd / jnp.maximum(4.0 * coh_e, 1e-8)
            den2_e = jnp.maximum((coh_e + e_rd * wih_e) ** 2, 1e-8)
            frd_tr = ((1.0 - F_rd) * d_rd * g2_rd * jnp.abs(coh_e * wih_e)
                      / (coso_c * den2_e))
            prd_tr = (1.0 - F_rd) * dv_rd * e_rd * e_rd * jnp.abs(wih_e) / den2_e
            ok_r_e = refl_e & (coh_e > 1e-6) & (wih_e > 1e-6)
            ok_t_e = (~refl_e) & (coh_e > 1e-6) & (wih_e < -1e-6)
            frd_fac = jnp.where(ok_r_e, frd_refl, jnp.where(ok_t_e, frd_tr, 0.0))
            prd_e = jnp.where(ok_r_e, prd_refl, jnp.where(ok_t_e, prd_tr, 0.0))

            on_e = oren_nayar(wo_lz, wi_lz,
                              wo_lx * wi_lx + wo_ly * wi_ly)
            # family composition via SELECTS, not arithmetic flags: a junk
            # parameter in an inactive family (NaN k_d on a mirror, inf from
            # a degenerate plastic exp) must not poison the lane through
            # NaN*0 — the composed path's where-dispatch (bsdf/eval.py) has
            # exactly these semantics (round-4 fix).
            m_ggx = is_ggx & same_side
            dterm = ffac * (lamf + on_e * onf)
            f_r = (jnp.where(is_lam | is_on, kdr * dterm, 0.0)
                   + jnp.where(m_ggx, fg_r, 0.0)
                   + jnp.where(is_pla, fp_r, 0.0))
            f_g = (jnp.where(is_lam | is_on, kdg * dterm, 0.0)
                   + jnp.where(m_ggx, fg_g, 0.0)
                   + jnp.where(is_pla, fp_g, 0.0))
            f_b = (jnp.where(is_lam | is_on, kdb * dterm, 0.0)
                   + jnp.where(m_ggx, fg_b, 0.0)
                   + jnp.where(is_pla, fp_b, 0.0))
            bpdf = ((cos_ic * _INV_PI) * (lamf + onf)
                    + jnp.where(m_ggx, pdf_ggx_e, 0.0)
                    + jnp.where(is_pla, pdf_pla_e, 0.0))
            # same-side gate (eval.py:193-194) — does NOT apply to the rough
            # dielectric, whose transmission crosses the surface by design
            ssf = jnp.where(same_side, 1.0, 0.0)
            f_r = f_r * ssf + jnp.where(is_rd, ksr * frd_fac, 0.0)
            f_g = f_g * ssf + jnp.where(is_rd, ksg * frd_fac, 0.0)
            f_b = f_b * ssf + jnp.where(is_rd, ksb * frd_fac, 0.0)
            bpdf = bpdf * ssf + jnp.where(is_rd, prd_e, 0.0)


            if has_media:
                # medium events evaluate the phase function toward the
                # light instead of a BSDF (volume_pt.vpt_bounce NEE)
                cos_nee = d_x * es_dx + d_y * es_dy + d_z * es_dz
                pv = phase_value(m_pty, m_pg1, m_pg2, m_pwv, cos_nee)
                f_r = jnp.where(med_event, pv, f_r)
                f_g = jnp.where(med_event, pv, f_g)
                f_b = jnp.where(med_event, pv, f_b)
                bpdf = jnp.where(med_event, pv, bpdf)

            phat = (0.212671 * f_r * le_r + 0.715160 * f_g * le_g
                    + 0.072169 * f_b * le_b)
            return sx, sy, {
                "dx": es_dx, "dy": es_dy, "dz": es_dz, "dist": es_dist,
                "le_r": le_r, "le_g": le_g, "le_b": le_b, "pdf": es_pdf,
                "valid": jnp.where(es_valid, 1.0, 0.0),
                "point": jnp.where(is_point, 1.0, 0.0),
                "f_r": f_r, "f_g": f_g, "f_b": f_b, "bpdf": bpdf,
                "phat": phat,
            }

        if nee_m <= 1:
            sx, sy, cnd = nee_one(sx, sy)
            inv_density = 1.0 / jnp.maximum(cnd["pdf"], 1e-12)
        else:
            # RIS over nee_m candidates (path_tracer.py:284-316): weighted
            # reservoir with target p-hat = lum(f*Le), ONE shadow ray for
            # the survivor; arithmetic blends (f32) instead of selects
            wsum = f0
            cnd = None
            for _k in range(nee_m):
                sx, sy, ck = nee_one(sx, sy)
                w_k = jnp.where((ck["valid"] > 0.5) & (ck["phat"] > 0.0),
                                ck["phat"] / jnp.maximum(ck["pdf"], 1e-12),
                                0.0)
                wsum = wsum + w_k
                sx, sy = _pcg2d(sx, sy)
                u_r = _u01(sx)
                if cnd is None:
                    cnd = ck
                else:
                    takef = jnp.where((u_r * wsum <= w_k) & (w_k > 0.0),
                                      1.0, 0.0)
                    cnd = {key: takef * ck[key] + (1.0 - takef) * cnd[key]
                           for key in cnd}
            inv_density = wsum / (nee_m * jnp.maximum(cnd["phat"], 1e-12))

        es_dx, es_dy, es_dz = cnd["dx"], cnd["dy"], cnd["dz"]
        es_dist = cnd["dist"]
        le_r, le_g, le_b = cnd["le_r"], cnd["le_g"], cnd["le_b"]
        es_pdf = cnd["pdf"]
        es_valid = cnd["valid"] > 0.5
        is_point = cnd["point"] > 0.5
        f_r, f_g, f_b = cnd["f_r"], cnd["f_g"], cnd["f_b"]
        bpdf = cnd["bpdf"]

        # shadow walk (offsets: path_tracer.py:317-322); medium events
        # shoot from the scatter point itself (no surface to offset from)
        gdir = ngx * es_dx + ngy * es_dy + ngz * es_dz
        osign = jnp.where(gdir < 0.0, -1.0, jnp.where(gdir > 0.0, 1.0, 0.0))
        if has_media:
            osign = jnp.where(med_event, 0.0, osign)
        sh_ox = px_ + ngx * osign * 1e-3
        sh_oy = py_ + ngy * osign * 1e-3
        sh_oz = pz_ + ngz * osign * 1e-3
        sh_dist = es_dist - jnp.abs(osign * gdir) * 1e-3
        if has_media:
            need = (med_event | srf_event) & es_valid
            ntr_r, ntr_g, ntr_b, shcs = walk_transmittance(
                sh_ox, sh_oy, sh_oz, es_dx, es_dy, es_dz, sh_dist,
                cur_med, need)
            occ = (jnp.maximum(ntr_r, jnp.maximum(ntr_g, ntr_b)) <= 0.0)
        else:
            need = hit_ok & es_valid
            occ, shcs = walk_anyhit(sh_ox, sh_oy, sh_oz, es_dx, es_dy,
                                    es_dz, sh_dist, need)
        if count_stats:
            stats = (stats[0] + shcs[0], stats[1] + shcs[1])

        last_bounce = bounce >= (max_depth - 1)
        rn_ = bpdf / jnp.maximum(es_pdf, 1e-12)
        w_nee_ph = jnp.where(es_pdf > 0.0, 1.0 / (1.0 + rn_ * rn_), 0.0)
        w_nee = jnp.where(is_point | last_bounce, 1.0, w_nee_ph)
        f_max = jnp.maximum(f_r, jnp.maximum(f_g, f_b))
        nee_ok = need & ~occ & (f_max > 0.0)
        scale = jnp.where(nee_ok, w_nee * inv_density, 0.0)
        if has_media:
            # per-channel shadow transmittance (interface-walked) rides the
            # emitted radiance (volume_pt NEE: contrib *= tr_nee)
            le_r = le_r * ntr_r
            le_g = le_g * ntr_g
            le_b = le_b * ntr_b
        if deferred_tex:
            # NEE at bounce k reflects off surface k, so it also carries
            # bounce k's own kd-texture factor -> group k+1. The texture
            # record of bounce k (bid, uv) is blended in here too.
            for kb in range(max_depth):
                mkb = bounce == kb
                A[kb + 1] = A[kb + 1] + jnp.where(
                    mkb, tr * f_r * le_r * scale, 0.0)
                A[D1 + kb + 1] = A[D1 + kb + 1] + jnp.where(
                    mkb, tg * f_g * le_g * scale, 0.0)
                A[2 * D1 + kb + 1] = A[2 * D1 + kb + 1] + jnp.where(
                    mkb, tb * f_b * le_b * scale, 0.0)
                mrec = mkb & hit_ok
                rec[kb] = jnp.where(mrec, bidv, rec[kb])
                rec[D1 + kb] = jnp.where(mrec, hit["uv"][0], rec[D1 + kb])
                rec[2 * D1 + kb] = jnp.where(mrec, hit["uv"][1],
                                             rec[2 * D1 + kb])
        elif inline_tex:
            # NEE at this bounce carries the hit's own kd texel: record it
            # pre-texel; the swf driver multiplies the texel in and adds
            # to L (and into thp for the sampled continuation).
            nee_r = tr * f_r * le_r * scale
            nee_g = tg * f_g * le_g * scale
            nee_b = tb * f_b * le_b * scale
            bid_rec = jnp.where(hit_ok, bidv, -1.0)
            u_rec = jnp.where(hit_ok, hit["uv"][0], 0.0)
            v_rec = jnp.where(hit_ok, hit["uv"][1], 0.0)
        elif has_grid:
            # grid-media scene: the NEE contribution still needs the grid
            # transmittance along the shadow segment (the in-kernel
            # interface walk contributed factor 1 — grid sigmas are zero
            # in mrow). Record (contribution, event point, light point);
            # the split driver ratio-tracks the clipped segment in XLA
            # and adds contribution * Tr_grid to L.
            gnee = (tr * f_r * le_r * scale,
                    tg * f_g * le_g * scale,
                    tb * f_b * le_b * scale,
                    sh_ox, sh_oy, sh_oz,
                    sh_ox + es_dx * sh_dist,
                    sh_oy + es_dy * sh_dist,
                    sh_oz + es_dz * sh_dist)
        else:
            Lr = Lr + tr * f_r * le_r * scale
            Lg = Lg + tg * f_g * le_g * scale
            Lb = Lb + tb * f_b * le_b * scale

        if has_media:
            # ---- phase sampling (media/phase.phase_sample draw order:
            # one 2d advance for (cos, phi), one 1d for the dual-HG pick) -
            sx, sy = _pcg2d(sx, sy)
            up0, up1 = _u01(sx), _u01(sy)
            sx, sy = _pcg2d(sx, sy)
            upick = _u01(sx)

            def hg_cos(g):
                g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
                sq = (1.0 - g_safe * g_safe) / (
                    1.0 - g_safe + 2.0 * g_safe * up0)
                ch = (1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
                return jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * up0,
                                 jnp.clip(ch, -1.0, 1.0))

            qray = 2.0 * (2.0 * up0 - 1.0)
            # cbrt is not a Mosaic primitive; q + sqrt(q²+1) > 0 always, so
            # exp(log(x)/3) is exact enough (Cardano arg strictly positive)
            cb_arg = jnp.maximum(qray + jnp.sqrt(qray * qray + 1.0), 1e-30)
            zray = jnp.exp(jnp.log(cb_arg) * (1.0 / 3.0))
            cos_ray = jnp.clip(zray - 1.0 / zray, -1.0, 1.0)
            g_pick = jnp.where(upick < m_pwv, m_pg1, m_pg2)
            cos_ph = 1.0 - 2.0 * up0
            cos_ph = jnp.where(m_pty == float(T.PHASE_HG), hg_cos(m_pg1),
                               cos_ph)
            cos_ph = jnp.where(m_pty == float(T.PHASE_DUAL_HG),
                               hg_cos(g_pick), cos_ph)
            cos_ph = jnp.where(m_pty == float(T.PHASE_RAYLEIGH), cos_ray,
                               cos_ph)
            sin_ph = jnp.sqrt(jnp.maximum(1.0 - cos_ph * cos_ph, 0.0))
            phi_ph = _TWO_PI * up1
            plx = sin_ph * jnp.cos(phi_ph)
            ply = sin_ph * jnp.sin(phi_ph)
            # ONB around the CURRENT direction d (math.onb / vm.to_world)
            dsig = jnp.where(d_z >= 0.0, 1.0, -1.0)
            da = -1.0 / (dsig + d_z)
            db = d_x * d_y * da
            dt1x = 1.0 + dsig * d_x * d_x * da
            dt1y = dsig * db
            dt1z = -dsig * d_x
            dt2x = db
            dt2y = dsig + d_y * d_y * da
            dt2z = -d_y
            dphx = plx * dt1x + ply * dt2x + cos_ph * d_x
            dphy = plx * dt1y + ply * dt2y + cos_ph * d_y
            dphz = plx * dt1z + ply * dt2z + cos_ph * d_z
            pdf_phase = phase_value(m_pty, m_pg1, m_pg2, m_pwv, cos_ph)

        # ---- BSDF sample (draw order bsdf/eval.py:276-278) ---------------
        sx, sy = _pcg2d(sx, sy)
        u_d0, u_d1 = _u01(sx), _u01(sy)
        sx, sy = _pcg2d(sx, sy)
        u_lobe = _u01(sx)
        sx, sy = _pcg2d(sx, sy)  # u_wl (consumed only by dispersion lanes)
        if has_disp:
            from ...bsdf import spectral

            # wavelength lock (bsdf/eval.py:456-480): first dispersive hit
            # samples wl uniform in [WL_MIN, WL_MAX] from the in-stream
            # draw (the composed path's golden-ratio stratum is a variance
            # tweak with the same uniform marginal — both unbiased) and
            # tints by the mean-one CIE weight; later hits reuse the lock.
            u_wl = _u01(sx)
            wl_fresh = (spectral.WL_MIN
                        + u_wl * (spectral.WL_MAX - spectral.WL_MIN))
            first_disp = wl <= 0.0
            wl_use = jnp.where(first_disp, wl_fresh, wl)
            wl_um2 = (wl_use * 1e-3) ** 2
            ior_wl = cav + cbv / jnp.maximum(wl_um2, 1e-6)
            xf, yf, zf = spectral.xyz_fit(wl_use)
            import numpy as _np

            M3 = _np.asarray(spectral._XYZ_TO_SRGB)
            NRM = _np.asarray(spectral._NORM)
            rgb_r = (float(M3[0, 0]) * xf + float(M3[0, 1]) * yf
                     + float(M3[0, 2]) * zf) * float(NRM[0])
            rgb_g = (float(M3[1, 0]) * xf + float(M3[1, 1]) * yf
                     + float(M3[1, 2]) * zf) * float(NRM[1])
            rgb_b = (float(M3[2, 0]) * xf + float(M3[2, 1]) * yf
                     + float(M3[2, 2]) * zf) * float(NRM[2])
            iorv_d = jnp.where(is_dsp, ior_wl, iorv)
        else:
            iorv_d = iorv

        # cosine hemisphere around nl (lambertian)
        phi = _TWO_PI * u_d0
        cth = jnp.sqrt(jnp.maximum(1.0 - u_d1, 0.0))
        sth = jnp.sqrt(jnp.maximum(u_d1, 0.0))
        loc_x = sth * jnp.cos(phi)
        loc_y = sth * jnp.sin(phi)
        wix = loc_x * t1x + loc_y * t2x + cth * nlx
        wiy = loc_x * t1y + loc_y * t2y + cth * nly
        wiz = loc_x * t1z + loc_y * t2z + cth * nlz
        bs_pdf = jnp.maximum(cth, 1e-6) * _INV_PI

        # mirror reflection wi = normalize(d - 2(d.nl)nl)
        dn = d_x * nlx + d_y * nly + d_z * nlz
        wmx = d_x - 2.0 * dn * nlx
        wmy = d_y - 2.0 * dn * nly
        wmz = d_z - 2.0 * dn * nlz
        wml = jax.lax.rsqrt(wmx * wmx + wmy * wmy + wmz * wmz + 1e-20)
        wmx, wmy, wmz = wmx * wml, wmy * wml, wmz * wml

        # smooth dielectric (bsdf/eval.py:316-331): Fresnel lobe choice.
        # iorv_d carries the per-lane Cauchy ior on dispersion lanes.
        eta_rel = jnp.where(entering, iorv_d,
                            1.0 / jnp.maximum(iorv_d, 1e-4))
        ci_t = jnp.clip(jnp.abs(wo_dot_n), 0.0, 1.0)
        sin2_t = (1.0 - ci_t * ci_t) / jnp.maximum(eta_rel * eta_rel, 1e-8)
        tir = sin2_t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
        r_par = (eta_rel * ci_t - cos_t) / jnp.maximum(
            eta_rel * ci_t + cos_t, 1e-8)
        r_per = (ci_t - eta_rel * cos_t) / jnp.maximum(
            ci_t + eta_rel * cos_t, 1e-8)
        f_die = jnp.where(tir, 1.0,
                          jnp.clip(0.5 * (r_par * r_par + r_per * r_per),
                                   0.0, 1.0))
        refl_t = u_lobe < f_die
        # refraction of d through nl with eta = 1/eta_rel (math.py:refract)
        etai = 1.0 / jnp.maximum(eta_rel, 1e-4)
        ci_r = -(d_x * nlx + d_y * nly + d_z * nlz)
        s2r = etai * etai * jnp.maximum(0.0, 1.0 - ci_r * ci_r)
        ct_r = jnp.sqrt(jnp.maximum(1.0 - s2r, 0.0))
        wtx = etai * d_x + (etai * ci_r - ct_r) * nlx
        wty = etai * d_y + (etai * ci_r - ct_r) * nly
        wtz = etai * d_z + (etai * ci_r - ct_r) * nlz
        wtl = jax.lax.rsqrt(wtx * wtx + wty * wty + wtz * wtz + 1e-20)
        wtx, wty, wtz = wtx * wtl, wty * wtl, wtz * wtl
        rad_scale = 1.0 / jnp.maximum(eta_rel * eta_rel, 1e-6)

        # GGX VNDF sample (Heitz 2018 stretched slopes, bsdf/ggx.py:43-83)
        gz = jnp.maximum(wo_lz, 1e-5)
        vx_ = wo_lx * axv
        vy_ = wo_ly * ayv
        vz_ = gz
        vl = jax.lax.rsqrt(vx_ * vx_ + vy_ * vy_ + vz_ * vz_ + 1e-20)
        vx_, vy_, vz_ = vx_ * vl, vy_ * vl, vz_ * vl
        lensq = vx_ * vx_ + vy_ * vy_
        inv_sq = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-8))
        big = lensq > 1e-8
        T1x = jnp.where(big, -vy_ * inv_sq, 1.0)
        T1y = jnp.where(big, vx_ * inv_sq, 0.0)
        T1z = f0
        T2x = vy_ * T1z - vz_ * T1y
        T2y = vz_ * T1x - vx_ * T1z
        T2z = vx_ * T1y - vy_ * T1x
        rr_ = jnp.sqrt(jnp.maximum(u_d0, 0.0))
        ph2 = _TWO_PI * u_d1
        pp1 = rr_ * jnp.cos(ph2)
        pp2 = rr_ * jnp.sin(ph2)
        sfac = 0.5 * (1.0 + vz_)
        pp2 = (1.0 - sfac) * jnp.sqrt(jnp.maximum(1.0 - pp1 * pp1, 0.0)) \
            + sfac * pp2
        pp3 = jnp.sqrt(jnp.maximum(1.0 - pp1 * pp1 - pp2 * pp2, 0.0))
        nhx = pp1 * T1x + pp2 * T2x + pp3 * vx_
        nhy = pp1 * T1y + pp2 * T2y + pp3 * vy_
        nhz = pp1 * T1z + pp2 * T2z + pp3 * vz_
        hgx = nhx * axv
        hgy = nhy * ayv
        hgz = jnp.maximum(nhz, 1e-6)
        hgl = jax.lax.rsqrt(hgx * hgx + hgy * hgy + hgz * hgz + 1e-20)
        hgx, hgy, hgz = hgx * hgl, hgy * hgl, hgz * hgl
        doh_s = wo_lx * hgx + wo_ly * hgy + gz * hgz
        wg_lx = 2.0 * doh_s * hgx - wo_lx
        wg_ly = 2.0 * doh_s * hgy - wo_ly
        wg_lz = 2.0 * doh_s * hgz - gz
        ggx_ok = wg_lz > 1e-5
        g2s = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, gz)
                     + ggx_lambda(wg_lx, wg_ly, wg_lz))
        g1s = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, gz))
        gfac = jnp.where(ggx_ok, g2s / jnp.maximum(g1s, 1e-6), 0.0)
        doh_abs = jnp.abs(doh_s)
        wg_r = fresnel_cond(doh_abs, etr, kkr) * kgr * gfac
        wg_g = fresnel_cond(doh_abs, etg, kkg) * kgg * gfac
        wg_b = fresnel_cond(doh_abs, etb, kkb) * kgb * gfac
        pdf_ggx_s = jnp.where(ggx_ok, vndf_pdf(doh_abs, hgx, hgy, hgz), 1.0)
        wgl = jax.lax.rsqrt(wg_lx * wg_lx + wg_ly * wg_ly
                            + wg_lz * wg_lz + 1e-20)
        ngx_ = wg_lx * wgl
        ngy_ = wg_ly * wgl
        ngz_ = wg_lz * wgl
        wgx = ngx_ * t1x + ngy_ * t2x + ngz_ * nlx
        wgy = ngx_ * t1y + ngy_ * t2y + ngz_ * nly
        wgz = ngx_ * t1z + ngy_ * t2z + ngz_ * nlz

        # rough dielectric sample (bsdf/eval.py:404-455): Fresnel choice +
        # reflect/refract through the SAME sampled microfacet h
        f_rd_s = fres_diel(jnp.abs(doh_s), e_rd)
        eta_i = 1.0 / jnp.maximum(e_rd, 1e-4)
        s2_rd = eta_i * eta_i * jnp.maximum(0.0, 1.0 - doh_s * doh_s)
        tir_rd = s2_rd >= 1.0
        ct_rd = jnp.sqrt(jnp.maximum(1.0 - s2_rd, 0.0))
        # refract(-wo_l, h): d = -wo_l, cos_i = doh_s
        wt_rx = -eta_i * wo_lx + (eta_i * doh_s - ct_rd) * hgx
        wt_ry = -eta_i * wo_ly + (eta_i * doh_s - ct_rd) * hgy
        wt_rz = -eta_i * gz + (eta_i * doh_s - ct_rd) * hgz
        wt_rl = jax.lax.rsqrt(wt_rx * wt_rx + wt_ry * wt_ry
                              + wt_rz * wt_rz + 1e-20)
        wt_rx, wt_ry, wt_rz = wt_rx * wt_rl, wt_ry * wt_rl, wt_rz * wt_rl
        refl_rd = (u_lobe < f_rd_s) | tir_rd
        wrd_lx = jnp.where(refl_rd, wg_lx, wt_rx)
        wrd_ly = jnp.where(refl_rd, wg_ly, wt_ry)
        wrd_lz = jnp.where(refl_rd, wg_lz, wt_rz)
        # logical blend, not jnp.where: Mosaic cannot legalize selects on
        # i1 vectors (arith.trunci i8->i1 reject, caught on bunny on-chip)
        ok_rd = (refl_rd & (wrd_lz > 1e-5)) | (~refl_rd & (wrd_lz < -1e-5))
        g2_rds = 1.0 / (1.0 + ggx_lambda(wo_lx, wo_ly, gz)
                        + ggx_lambda(wrd_lx, wrd_ly, wrd_lz))
        rad_rd = jnp.where(refl_rd, 1.0,
                           1.0 / jnp.maximum(e_rd * e_rd, 1e-6))
        wfac_rd = jnp.where(ok_rd, g2_rds / jnp.maximum(g1s, 1e-6) * rad_rd,
                            0.0)
        d_rds = ggx_ndf(hgx, hgy, hgz)
        dv_rds = g1s * d_rds * jnp.maximum(doh_s, 0.0) / gz
        wih_rds = wrd_lx * hgx + wrd_ly * hgy + wrd_lz * hgz
        den2_s = jnp.maximum((doh_s + e_rd * wih_rds) ** 2, 1e-8)
        pdf_rds = jnp.maximum(jnp.where(
            refl_rd,
            f_rd_s * dv_rds / jnp.maximum(4.0 * doh_s, 1e-8),
            (1.0 - f_rd_s) * dv_rds * e_rd * e_rd * jnp.abs(wih_rds)
            / den2_s), 1e-12)
        wrdl = jax.lax.rsqrt(wrd_lx * wrd_lx + wrd_ly * wrd_ly
                             + wrd_lz * wrd_lz + 1e-20)
        nrdx, nrdy, nrdz = wrd_lx * wrdl, wrd_ly * wrdl, wrd_lz * wrdl
        wrdx = nrdx * t1x + nrdy * t2x + nrdz * nlx
        wrdy = nrdx * t1y + nrdy * t2y + nrdz * nly
        wrdz = nrdx * t1z + nrdy * t2z + nrdz * nlz

        # plastic lobe choice (bsdf/eval.py:333-367): Fresnel-weighted
        # specular coat vs absorbing diffuse substrate
        take_spec_p = u_lobe < p_spec_p
        cos_i_d = jnp.maximum(cth, 1e-6)  # cosine-sampled substrate angle
        f_i_s = fres_diel(cos_i_d, iorv)
        absorb_s = jnp.exp(-klen * thv * (1.0 / cos_i_d
                                          + 1.0 / jnp.maximum(cos_o_p, 1e-4)))
        dfac = ((1.0 - f_o_p) * (1.0 - f_i_s) / (1.0 - p_spec_p)) * absorb_s
        wp_sr = ksr * (f_o_p / p_spec_p)
        wp_sg = ksg * (f_o_p / p_spec_p)
        wp_sb = ksb * (f_o_p / p_spec_p)
        wp_dr = kdr * dfac / (jnp.maximum(1.0 - kdr * fdr_p, 0.05) * ior2)
        wp_dg = kdg * dfac / (jnp.maximum(1.0 - kdg * fdr_p, 0.05) * ior2)
        wp_db = kdb * dfac / (jnp.maximum(1.0 - kdb * fdr_p, 0.05) * ior2)

        # Oren-Nayar sample weight at the cosine-sampled direction, whose
        # local frame coords are (loc_x, loc_y, cth) by construction
        on_s = oren_nayar(wo_lz, cth, wo_lx * loc_x + wo_ly * loc_y)

        # ---- family selects: wi, weight, pdf, delta, lobe ----------------
        # dispersion rides the smooth-dielectric geometry with its per-lane
        # Cauchy eta (folded in via iorv_d above) + the CIE tint below
        is_trl = (is_tr | is_dsp) if has_disp else is_tr
        use_mirror = is_spec | (is_trl & refl_t) | (is_pla & take_spec_p)
        wix = jnp.where(use_mirror, wmx, wix)
        wiy = jnp.where(use_mirror, wmy, wiy)
        wiz = jnp.where(use_mirror, wmz, wiz)
        tr_refr = is_trl & ~refl_t
        wix = jnp.where(tr_refr, wtx, wix)
        wiy = jnp.where(tr_refr, wty, wiy)
        wiz = jnp.where(tr_refr, wtz, wiz)
        wix = jnp.where(is_ggx, wgx, wix)
        wiy = jnp.where(is_ggx, wgy, wiy)
        wiz = jnp.where(is_ggx, wgz, wiz)
        wix = jnp.where(is_rd, wrdx, wix)
        wiy = jnp.where(is_rd, wrdy, wiy)
        wiz = jnp.where(is_rd, wrdz, wiz)
        # null interface: straight through (bsdf/eval.py:482-487)
        wix = jnp.where(is_fwd, d_x, wix)
        wiy = jnp.where(is_fwd, d_y, wiy)
        wiz = jnp.where(is_fwd, d_z, wiz)
        bs_pdf = jnp.where(is_ggx, pdf_ggx_s, bs_pdf)
        bs_pdf = jnp.where(is_pla, (1.0 - p_spec_p) * bs_pdf, bs_pdf)
        bs_pdf = jnp.where(is_rd, pdf_rds, bs_pdf)

        w_r = jnp.where(is_lam | is_spec, kdr,
                        jnp.where(is_ggx, wg_r,
                                  jnp.where(refl_t, ksr, ksr * rad_scale)))
        w_g = jnp.where(is_lam | is_spec, kdg,
                        jnp.where(is_ggx, wg_g,
                                  jnp.where(refl_t, ksg, ksg * rad_scale)))
        w_b = jnp.where(is_lam | is_spec, kdb,
                        jnp.where(is_ggx, wg_b,
                                  jnp.where(refl_t, ksb, ksb * rad_scale)))
        w_r = jnp.where(is_pla, jnp.where(take_spec_p, wp_sr, wp_dr), w_r)
        w_g = jnp.where(is_pla, jnp.where(take_spec_p, wp_sg, wp_dg), w_g)
        w_b = jnp.where(is_pla, jnp.where(take_spec_p, wp_sb, wp_db), w_b)
        w_r = jnp.where(is_rd, ksr * wfac_rd, w_r)
        w_g = jnp.where(is_rd, ksg * wfac_rd, w_g)
        w_b = jnp.where(is_rd, ksb * wfac_rd, w_b)
        w_r = jnp.where(is_on, kdr * on_s, w_r)
        w_g = jnp.where(is_on, kdg * on_s, w_g)
        w_b = jnp.where(is_on, kdb * on_s, w_b)
        w_r = jnp.where(is_fwd, 1.0, w_r)
        w_g = jnp.where(is_fwd, 1.0, w_g)
        w_b = jnp.where(is_fwd, 1.0, w_b)
        if has_disp:
            # CIE tint on the FIRST dispersive event (bsdf/eval.py:469-474);
            # subsequent hits of the locked path carry weight ks only
            tint = is_dsp & first_disp
            w_r = jnp.where(tint, w_r * rgb_r, w_r)
            w_g = jnp.where(tint, w_g * rgb_g, w_g)
            w_b = jnp.where(tint, w_b * rgb_b, w_b)
            wl = jnp.where(srf_event & is_dsp, wl_use, wl)
        if has_media:
            # medium scatter overrides: phase direction, unit weight
            # (f/pdf = 1 incl. the dual-HG one-sample mixture), phase pdf
            wix = jnp.where(med_event, dphx, wix)
            wiy = jnp.where(med_event, dphy, wiy)
            wiz = jnp.where(med_event, dphz, wiz)
            w_r = jnp.where(med_event, 1.0, w_r)
            w_g = jnp.where(med_event, 1.0, w_g)
            w_b = jnp.where(med_event, 1.0, w_b)
            bs_pdf = jnp.where(med_event, pdf_phase, bs_pdf)
        tr2 = tr * w_r
        tg2 = tg * w_g
        tb2 = tb * w_b
        # throughput NaN guard — parity with the composed path and the
        # reference (path_tracer.py thp isfinite blend, megakernel_pt.cu:
        # 162-163): one non-finite BSDF sample weight must zero the lane,
        # not poison it forever. f32 blends keep this Mosaic-legal.
        tr2 = jnp.where(jnp.isfinite(tr2), tr2, 0.0)
        tg2 = jnp.where(jnp.isfinite(tg2), tg2, 0.0)
        tb2 = jnp.where(jnp.isfinite(tb2), tb2, 0.0)
        is_delta = is_spec | is_trl | (is_pla & take_spec_p) | is_fwd

        # new origin offset along ng toward wi (medium scatter: none)
        gdir2 = ngx * wix + ngy * wiy + ngz * wiz
        osign2 = jnp.where(gdir2 < 0.0, -1.0, jnp.where(gdir2 > 0.0, 1.0, 0.0))
        if has_media:
            osign2 = jnp.where(med_event, 0.0, osign2)
        o_x2 = px_ + ngx * osign2 * 1e-3
        o_y2 = py_ + ngy * osign2 * 1e-3
        o_z2 = pz_ + ngz * osign2 * 1e-3

        # per-lobe caps (path_tracer.py:365-372)
        lobe_diff = is_lam | is_on | (is_pla & ~take_spec_p)
        lobe_spec = (is_spec | is_ggx | (is_trl & refl_t)
                     | (is_pla & take_spec_p) | (is_rd & refl_rd))
        lobe_trans = (is_trl & ~refl_t) | (is_rd & ~refl_rd) | is_fwd
        n_diff2 = n_diff + jnp.where(srf_event & lobe_diff, 1.0, 0.0)
        n_spec2 = n_spec + jnp.where(srf_event & lobe_spec, 1.0, 0.0)
        n_trans2 = n_trans + jnp.where(srf_event & lobe_trans, 1.0, 0.0)
        depth_ok = ((n_diff2 <= float(max_diffuse))
                    & (n_spec2 <= float(max_specular))
                    & (n_trans2 <= float(max_transmit)))
        if has_media:
            # medium stack: winding-robust object-identity toggle on
            # transmission (volume_pt.vpt_bounce:297-304)
            med_obj = hit["mn"][0]
            transmitted = srf_event & lobe_trans & (med_obj >= 0.0)
            do_pop = transmitted & (cur_med == med_obj)
            do_push = transmitted & ~do_pop
            mtop_p = jnp.where(do_push, jnp.minimum(mtop + 1.0, 2.0), mtop)
            stk0 = jnp.where(do_push & (mtop_p == 0.0), med_obj, stk0)
            stk1 = jnp.where(do_push & (mtop_p == 1.0), med_obj, stk1)
            stk2 = jnp.where(do_push & (mtop_p == 2.0), med_obj, stk2)
            mtop = jnp.where(do_pop, jnp.maximum(mtop_p - 1.0, -1.0),
                             mtop_p)
            n_vol = n_vol + jnp.where(med_event, 1.0, 0.0)
            depth_ok = depth_ok & (n_vol <= float(max_volume))

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

        evt_ok = (med_event | srf_event) if has_media else hit_ok
        act2 = evt_ok & depth_ok & survive & (max_thp > 0.0)
        actf = jnp.where(act2, 1.0, 0.0)
        tr2 = tr2 * actf
        tg2 = tg2 * actf
        tb2 = tb2 * actf
        prev_pdf2 = jnp.where(act2, bs_pdf, prev_pdf)
        dltf = jnp.where(is_delta, 1.0, 0.0)
        if has_media:
            dltf = jnp.where(med_event, 0.0, dltf)
        prev_delta2 = jnp.where(act2, dltf, prev_delta)

        if deferred_tex:
            tex_state2 = (tuple(A), tuple(rec), mbv)
        elif inline_tex:
            tex_state2 = (nee_r, nee_g, nee_b, bid_rec, u_rec, v_rec)
        elif has_grid:
            # grid NEE record rides the (mutually-exclusive) tex slot
            tex_state2 = gnee
        else:
            tex_state2 = ()
        med_state2 = ((stk0, stk1, stk2, mtop, n_vol) if has_media else ())
        return (bounce + 1, sx, sy, o_x2, o_y2, o_z2, wix, wiy, wiz,
                tr2, tg2, tb2, Lr, Lg, Lb, actf, prev_pdf2, prev_delta2,
                n_diff2, n_spec2, n_trans2, mdx, mdy, mdz, mtr, mtg, mtb,
                wl, tex_state2, med_state2, stats)

    if seg:
        # One bounce on carried state; the carry layout is identical to the
        # while loop's, so bounce_body is shared VERBATIM between modes —
        # per-lane results are bit-identical to the megakernel regardless
        # of how the driver regroups lanes into tiles (box culling is
        # conservative per lane; tests/test_swf.py asserts exact parity).
        # _SEG_STATE order (in and out):
        #   0 sx  1 sy | 2-4 o | 5-7 d | 8-10 thp | 11-13 L | 14 act
        #   15 prev_pdf 16 prev_delta | 17-19 n_diff/spec/trans | 20 wl
        #   [21-26 env miss records mdx,mdy,mdz,mtr,mtg,mtb]
        #   [last 5: medium stack stk0,stk1,stk2,mtop,n_vol]
        #   [last 6 (textured; exclusive with media — make_pack rejects
        #    the combination, so the -5 arithmetic above stays valid):
        #    per-call nee_r,nee_g,nee_b,bid_rec,u_rec,v_rec]
        b_idx = bounce_ref[0, 0]
        med_base = 21 + (6 if has_env else 0)  # media block offset
        med_in = (tuple(sin[med_base + i][:] for i in range(5))
                  if has_media else ())
        # inline-tex / grid-NEE records are per-call OUTPUTS (the kernel
        # overwrites them every bounce); their input lanes exist only to
        # keep the seg state pytree symmetric, so no carry-in here
        tex_in = ((f0, f0, f0, f0 - 1.0, f0, f0) if inline_tex else ())
        env_in = (tuple(sin[21 + i][:] for i in range(6))
                  if has_env else (f0, f0, f1, f0, f0, f0))
        carry = ((b_idx, sx0, sy0, o_x0, o_y0, o_z0, d_x0, d_y0, d_z0)
                 + tuple(sin[i][:] for i in range(8, 20))  # thp,L,act,..,nt
                 + env_in + (sin[20][:], tex_in, med_in, ()))
        res = bounce_body(carry)
        # res carry: 0 bounce+1, 1 sx, 2 sy, 3-5 o, 6-8 d, 9-11 thp,
        # 12-14 L, 15 act, 16 ppdf, 17 pdel, 18-20 nd/ns/nt, 21-26 env,
        # 27 wl, 28 tex/grid-rec, 29 med, 30 stats
        flat = list(res[1:21]) + [res[27]]
        if has_env:
            flat += list(res[21:27])
        if has_media:
            flat += list(res[29])
        if inline_tex or has_grid:
            flat += list(res[28])
        for ref, val in zip(souts, flat):
            ref[:] = val
        return

    if textured:
        tex0 = (tuple(f0 for _ in range(3 * D1)),
                tuple((f0 - 1.0) if i < D1 else f0 for i in range(3 * D1)),
                f0)
    else:
        tex0 = ()
    # empty medium stack resolves to the ambient (cam_medium) in-kernel
    med0 = ((f0 - 1.0, f0 - 1.0, f0 - 1.0, f0 - 1.0, f0)
            if has_media else ())
    stats0 = (f0, f0) if count_stats else ()
    init = (jnp.int32(0), sx0, sy0, o_x0, o_y0, o_z0, d_x0, d_y0, d_z0,
            f1, f1, f1, f0, f0, f0, f1, f1, f1, f0, f0, f0,
            f0, f0, f1, f0, f0, f0, f0, tex0, med0, stats0)
    out = jax.lax.while_loop(bounce_cond, bounce_body, init)
    out_r[:] = out[12]
    out_g[:] = out[13]
    out_b[:] = out[14]
    if has_env:
        for i, ref in enumerate(env_outs):
            ref[:] = out[21 + i]
    if textured:
        A_f, rec_f, mb_f = out[28]
        for c in range(3):
            for kb in range(D1):
                out_A[c][0, kb] = A_f[c * D1 + kb][0]
                out_rec[c][0, kb] = rec_f[c * D1 + kb][0]
        if has_env:
            out_mb[:] = mb_f
    if count_stats:
        out_cn[:] = out[30][0]
        out_cl[:] = out[30][1]


# Global interpret default (CPU tests flip it), mirroring traverse_kernel.
INTERPRET = False
_SWF_DEBUG_STATE = False  # diagnostic: trace_megakernel_swf returns raw state


@functools.lru_cache(maxsize=16)
def _tile_swizzle_np(width: int, height: int):
    """Morton (Z-order) pixel permutation (perm, inv) as NUMPY int32 arrays
    (cached; jnp values must not be cached across traces).

    The kernel grid walks B lanes in TILE-sized groups; in row-major order
    a TILE=8192 group at 256² is a 32-row STRIP — an elongated frustum
    whose any-lane walk visits far more nodes than a compact block. Z-order
    makes every tile a ~square screen block (tighter primary-ray frusta),
    with bit-identical images: the pixel→RNG-stream mapping is unchanged,
    only the lane grouping moves. Host-computed once per (W, H)."""
    import numpy as np

    y, x = np.mgrid[0:height, 0:width]

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    code = (spread(x.ravel()) | (spread(y.ravel()) << np.uint64(1)))
    perm = np.argsort(code, kind="stable").astype(np.int32)
    inv = np.argsort(perm, kind="stable").astype(np.int32)
    return perm, inv


def tile_swizzle(width: int, height: int):
    """(perm, inv) Z-order lane permutation as fresh jnp constants."""
    perm, inv = _tile_swizzle_np(int(width), int(height))
    return jnp.asarray(perm), jnp.asarray(inv)

# Packs whose f32 footprint exceeds this compact automatically (bf16 nodes +
# bf16 attrs: ~45% smaller) — the whiskey-class stability lever. Small
# scenes stay f32 for exact estimator parity with the composed path.
AUTO_COMPACT_BYTES = 2 * 1024 * 1024


T9_PER_ROW = 14  # 14 prims x 9 fields = 126 of 128 lanes
UV_PER_ROW = 21  # 21 prims x 6 uv fields = 126 of 128 lanes


def pack_uvs(geom) -> jnp.ndarray:
    """Per-vertex texture uvs, f32, 6 fields x 21 prims per 128-lane row
    (textured scenes only; the leaf interpolates uv for the winning prim
    exactly like the composed surface_interaction)."""
    import numpy as np

    uv0 = np.asarray(geom.uv0, np.float32)
    uv1 = np.asarray(geom.uv1, np.float32)
    uv2 = np.asarray(geom.uv2, np.float32)
    M = uv0.shape[0]
    Mp = -(-max(M, 1) // UV_PER_ROW) * UV_PER_ROW + 2 * UV_PER_ROW

    def pad(c):
        return np.concatenate([c, np.zeros(Mp - M, np.float32)])

    cols = [pad(uv0[:, 0]), pad(uv0[:, 1]), pad(uv1[:, 0]),
            pad(uv1[:, 1]), pad(uv2[:, 0]), pad(uv2[:, 1])]
    arr = np.stack(cols, axis=1).reshape(Mp // UV_PER_ROW, UV_PER_ROW * 6)
    out = np.zeros((arr.shape[0], 128), np.float32)
    out[:, : UV_PER_ROW * 6] = arr
    return jnp.asarray(out)


def pack_nodes_w8(wb) -> jnp.ndarray:
    """(W, 128) f32 rows for the in-kernel 8-wide ordered stack walk:
    child c of wide node w at lane c*9 = [lo(3), hi(3), enc, base, cnt].
    enc: >= 0 interior (wide node id), -1 leaf, -2 empty slot. Leaf
    base/cnt are prim-slot base + count inlined from WideBVHArrays
    (accel/wide_build.collapse_wide), so fetch_prim works unchanged on any
    prim format. Empty slots carry inverted AABBs (never hit); base is
    exact in f32 below 2^24 prim slots (documented limit, mirrors the
    traverse_kernel prim-id plane note)."""
    import numpy as np

    cmin = np.asarray(wb.child_min, np.float32)  # (W, 8, 3)
    cmax = np.asarray(wb.child_max, np.float32)
    enc = np.asarray(wb.child_node)              # (W, 8) int32
    lbase = np.asarray(wb.leaf_base)
    lcnt = np.asarray(wb.leaf_count)
    W = enc.shape[0]
    from ...accel.wide_build import EMPTY

    is_leaf = (enc < 0) & (enc != EMPTY)
    lid = np.where(is_leaf, -(enc + 1), 0)
    enc_f = np.where(enc == EMPTY, -2.0,
                     np.where(is_leaf, -1.0, enc.astype(np.float32)))
    base_f = np.where(is_leaf, lbase[lid], 0).astype(np.float32)
    cnt_f = np.where(is_leaf, lcnt[lid], 0).astype(np.float32)
    # inverted boxes on empty slots reject in the slab test; force them
    # here too in case the collapse left stale values
    big = np.float32(1e30)
    lo = np.where(is_leaf[..., None] | (enc >= 0)[..., None], cmin, big)
    hi = np.where(is_leaf[..., None] | (enc >= 0)[..., None], cmax, -big)
    out = np.zeros((W, 128), np.float32)
    fields = np.concatenate(
        [lo, hi, enc_f[..., None], base_f[..., None], cnt_f[..., None]],
        axis=-1)                                  # (W, 8, 9)
    out[:, : 8 * 9] = fields.reshape(W, 72)
    return jnp.asarray(out)


def _pack_hit_matrix(scene: T.Scene) -> jnp.ndarray:
    """(M, 32) f32 per-prim hit-resolution matrix for the SPLIT driver:
    ONE XLA row gather by gid resolves everything the shade phase needs.
    Cols: 0-2 n0, 3-5 n1, 6-8 n2, 9-11 cross(e1,e2) (raw geometric
    normal), 12-14 p0 (sphere center), 15 eid, 16 bid, 17 inv_area,
    18 is_sphere, 19 medium_in, 20 is_null, 21-26 uv0/uv1/uv2."""
    import numpy as np

    g = scene.geom
    obj = np.asarray(g.obj_idx)
    eid = np.asarray(scene.objects.emitter_id)[obj].astype(np.float32)
    bid = np.maximum(np.asarray(scene.objects.bsdf_id)[obj], 0)
    inva = np.asarray(scene.objects.inv_area)[obj]
    sph = np.asarray(g.is_sphere, np.float32)
    med, nul = _prim_medium_null(scene)
    e1 = np.asarray(g.e1, np.float32)
    e2 = np.asarray(g.e2, np.float32)
    M = e1.shape[0]
    out = np.zeros((max(M, 1), 32), np.float32)
    if M:
        out[:, 0:3] = np.asarray(g.n0, np.float32)
        out[:, 3:6] = np.asarray(g.n1, np.float32)
        out[:, 6:9] = np.asarray(g.n2, np.float32)
        out[:, 9:12] = np.cross(e1, e2)
        out[:, 12:15] = np.asarray(g.p0, np.float32)
        out[:, 15] = eid
        out[:, 16] = bid.astype(np.float32)
        out[:, 17] = inva
        out[:, 18] = sph
        out[:, 19] = med
        out[:, 20] = nul
        uv0 = np.asarray(g.uv0, np.float32)
        if uv0.size:
            out[:, 21:23] = uv0
            out[:, 23:25] = np.asarray(g.uv1, np.float32)
            out[:, 25:27] = np.asarray(g.uv2, np.float32)
    return jnp.asarray(out)


def treelet_boxes_w8(wb, max_tl: int = 64) -> jnp.ndarray:
    """(max_tl, 8) f32 treelet-root AABBs [lo3, hi3, 0, 0] for the swf
    traversal-coherence sort key (swf_sort_key key_mode="tl*").

    BFS from the wide root, repeatedly expanding the frontier entry with
    the largest surface area (interior entries only) until expanding
    would exceed max_tl. The frontier — a mix of wide subtree roots and
    leaf boxes — partitions the scene geometry; a ray's nearest-entered
    frontier box predicts where its closest hit resolves, so sorting
    rays by that index collapses each tile's walk union to a few
    subtrees. Padding rows are inverted boxes (never entered)."""
    import numpy as np

    cmin = np.asarray(wb.child_min, np.float32)   # (W, 8, 3)
    cmax = np.asarray(wb.child_max, np.float32)
    enc = np.asarray(wb.child_node)               # (W, 8)
    from ...accel.wide_build import EMPTY

    # frontier entries: (surface_area, lo, hi, wide_id or -1)
    valid0 = enc[0] != EMPTY
    frontier = []
    for c in range(8):
        if not valid0[c]:
            continue
        lo, hi = cmin[0, c], cmax[0, c]
        wid = int(enc[0, c]) if enc[0, c] >= 0 else -1
        sa = float(_np_sa(lo, hi))
        frontier.append((sa, lo, hi, wid))
    while True:
        cand = [f for f in frontier if f[3] >= 0]
        if not cand:
            break
        best = max(cand, key=lambda f: f[0])
        w = best[3]
        kids = [(float(_np_sa(cmin[w, c], cmax[w, c])),
                 cmin[w, c], cmax[w, c],
                 int(enc[w, c]) if enc[w, c] >= 0 else -1)
                for c in range(8) if enc[w, c] != EMPTY]
        if len(frontier) - 1 + len(kids) > max_tl:
            break
        frontier.remove(best)
        frontier.extend(kids)
    out = np.zeros((max_tl, 8), np.float32)
    big = np.float32(1e30)
    out[:, 0:3] = big
    out[:, 3:6] = -big
    for i, (_, lo, hi, _w) in enumerate(frontier):
        out[i, 0:3] = lo
        out[i, 3:6] = hi
    return jnp.asarray(out)


def _np_sa(lo, hi):
    import numpy as np

    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def pack_prims_t9(geom) -> jnp.ndarray:
    """Triangle-only compact prim rows: 9 f32 fields (p0, e1, e2), 14 prims
    per 128-lane row — 36.6 B/prim vs 64. The global prim id is NOT stored:
    make_pack packs prims in index order, so gid == pid in-kernel. Padding
    prims are degenerate (never hit)."""
    import numpy as np

    p0 = np.asarray(geom.p0, np.float32)
    e1 = np.asarray(geom.e1, np.float32)
    e2 = np.asarray(geom.e2, np.float32)
    M = p0.shape[0]
    Mp = -(-max(M, 1) // T9_PER_ROW) * T9_PER_ROW + 2 * T9_PER_ROW

    def pad(c):
        return np.concatenate([c, np.zeros(Mp - M, np.float32)])

    cols = [pad(p0[:, 0]), pad(p0[:, 1]), pad(p0[:, 2]),
            pad(e1[:, 0]), pad(e1[:, 1]), pad(e1[:, 2]),
            pad(e2[:, 0]), pad(e2[:, 1]), pad(e2[:, 2])]
    arr = np.stack(cols, axis=1).reshape(Mp // T9_PER_ROW, T9_PER_ROW * 9)
    out = np.zeros((arr.shape[0], 128), np.float32)
    out[:, : T9_PER_ROW * 9] = arr
    return jnp.asarray(out)


def pack_attrs_bf16(scene: T.Scene) -> jnp.ndarray:
    """Compact attrs: TWO prims per 16-field slot (32 B/prim). Normals are
    bf16 pairs (renormalized in-kernel; ~0.4% quantization), eid/bid are
    small ints (exact in bf16), inv_area stays f32 for MIS-weight
    consistency with the NEE prim table. Field map per 8-field half-slot:
    0 n0x|n0y, 1 n0z|n1x, 2 n1y|n1z, 3 n2x|n2y, 4 n2z|sph, 5 eid|bid,
    6 inv_area, 7 spare."""
    import numpy as np

    g = scene.geom
    obj = np.asarray(g.obj_idx)
    bid = np.maximum(np.asarray(scene.objects.bsdf_id)[obj], 0)
    eid = np.asarray(scene.objects.emitter_id)[obj].astype(np.float32)
    inv_a = np.asarray(scene.objects.inv_area)[obj]
    sph = np.asarray(g.is_sphere, np.float32)
    n0 = np.asarray(g.n0)
    n1 = np.asarray(g.n1)
    n2 = np.asarray(g.n2)
    M = n0.shape[0]
    per_row = 2 * SLOTS  # 16 prims/row
    Mp = -(-max(M, 1) // per_row) * per_row + per_row

    def pad(c, pv=0.0):
        c = np.asarray(c, np.float32)
        return np.concatenate([c, np.full(Mp - M, pv, np.float32)])

    med, nul = _prim_medium_null(scene)
    cols = [
        tk._pack2(pad(n0[:, 0]), pad(n0[:, 1])),
        tk._pack2(pad(n0[:, 2]), pad(n1[:, 0])),
        tk._pack2(pad(n1[:, 1]), pad(n1[:, 2])),
        tk._pack2(pad(n2[:, 0]), pad(n2[:, 1])),
        tk._pack2(pad(n2[:, 2]), pad(sph)),
        tk._pack2(pad(eid), pad(bid.astype(np.float32))),
        pad(inv_a),
        tk._pack2(pad(med, -1.0), pad(nul)),
    ]
    arr = np.stack(cols, axis=1)  # (Mp, 8)
    return jnp.asarray(arr.reshape(Mp // per_row, per_row * (SLOT_F // 2)))


@jax.tree_util.register_pytree_node_class
class MKPack:
    """Fused-kernel scene pack: packed arrays + STATIC format flags.
    Dict-like (pack["nodes"]) and jit-transparent — formats ride the pytree
    aux_data so packs pass through jit/shard_map boundaries unchanged."""

    def __init__(self, arrays, node_fmt="f32", attr_fmt="f32",
                 tri_only=False, prim_fmt="f32", has_env=False,
                 has_disp=False, textured=False, has_media=False,
                 max_leaf=4, ambient_med=-1.0, max_stack=0,
                 has_grid=False):
        self.arrays = dict(arrays)
        self.node_fmt = node_fmt
        self.attr_fmt = attr_fmt
        self.prim_fmt = prim_fmt
        self.tri_only = bool(tri_only)
        self.has_env = bool(has_env)
        self.has_disp = bool(has_disp)
        self.textured = bool(textured)
        self.has_media = bool(has_media)
        self.max_leaf = int(max_leaf)
        self.ambient_med = float(ambient_med)
        # w8 node format: SMEM stack bound from the wide collapse
        self.max_stack = int(max_stack)
        # grid (heterogeneous) media: flight + NEE transmittance resolve
        # in XLA around the shade kernel (split swf driver only)
        self.has_grid = bool(has_grid)

    def __getitem__(self, k):
        return self.arrays[k]

    def keys(self):
        return self.arrays.keys()

    def values(self):
        return self.arrays.values()

    def items(self):
        return self.arrays.items()

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return (tuple(self.arrays[k] for k in keys),
                (keys, self.node_fmt, self.attr_fmt, self.tri_only,
                 self.prim_fmt, self.has_env, self.has_disp,
                 self.textured, self.has_media, self.max_leaf,
                 self.ambient_med, self.max_stack, self.has_grid))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, nf, af, to, pf, he, hd, tx, hm, ml, am = aux[:11]
        ms = aux[11] if len(aux) > 11 else 0
        hg = aux[12] if len(aux) > 12 else False
        return cls(dict(zip(keys, children)), nf, af, to, pf, he, hd, tx,
                   hm, ml, am, max_stack=ms, has_grid=hg)


def make_pack(scene: T.Scene, node_fmt: str | None = None,
              attr_fmt: str | None = None,
              prim_fmt: str | None = None, vpt: bool = False) -> MKPack:
    """Host-side scene pack for the fused kernel (concrete arrays required:
    the emitter packing inspects CDF padding with numpy). Formats default to
    f32 below AUTO_COMPACT_BYTES and compact above — bf16 node boxes are
    conservatively rounded (identical hits), bf16 attrs quantize shading
    normals only, t9 prims (triangle-only scenes) keep f32 positions at
    36.6 B/prim (intersections bit-identical). tri_only is detected from
    the geometry."""
    import numpy as np

    big = fused_pack_bytes(scene) > AUTO_COMPACT_BYTES
    tri_only = not bool(np.asarray(scene.geom.is_sphere).any())
    if node_fmt is None:
        node_fmt = "bf16" if big else "f32"
    if attr_fmt is None:
        attr_fmt = "bf16" if big else "f32"
    if prim_fmt is None:
        prim_fmt = "t9" if (big and tri_only) else "f32"
    if prim_fmt == "t9" and not tri_only:
        raise ValueError("prim_fmt='t9' requires an all-triangle scene")
    max_stack = 0
    if node_fmt == "w8":
        from ...accel import wide_build

        wb = wide_build.from_bvharrays(scene.bvh)
        nodes_arr = pack_nodes_w8(wb)
        max_stack = int(wb.max_stack) + 8  # +8: unconditional 8-slot write
        tlbox_arr = treelet_boxes_w8(wb)
    elif node_fmt == "bf16":
        nodes_arr = tk.pack_nodes_bf16(scene.bvh)
    else:
        nodes_arr = tk.pack_nodes(scene.bvh)
    arrays = {
        "nodes": nodes_arr,
        "prims": (pack_prims_t9(scene.geom) if prim_fmt == "t9"
                  else tk.pack_prims(scene.geom)),
        "attrs": (pack_attrs_bf16(scene) if attr_fmt == "bf16"
                  else pack_attrs(scene)),
        "erow": pack_emitters(scene),
        "eprims": pack_emitter_prims(scene),
        "brows": pack_bsdfs(scene),
    }
    if node_fmt == "w8":
        arrays["tlbox"] = tlbox_arr
        arrays["g_hit"] = _pack_hit_matrix(scene)
    env_id = int(np.asarray(scene.env_emitter))
    has_env = env_id > 0
    if has_env:
        # epilogue inputs (XLA side, never enter the kernel): env emitter
        # params + the texture atlas (referenced, not copied — same device
        # buffers as the scene)
        e = scene.emitters
        arrays["env_extra"] = jnp.asarray(e.extra[env_id], jnp.float32)
        arrays["env_base"] = jnp.asarray(
            e.emission[env_id] * e.scaler[env_id], jnp.float32)
        arrays["env_tid"] = jnp.asarray(e.tex_id[env_id], jnp.int32)
        arrays["tex_texels"] = scene.textures.texels
        arrays["tex_offset"] = scene.textures.offset
        arrays["tex_width"] = scene.textures.width
        arrays["tex_height"] = scene.textures.height
    tids = np.asarray(scene.bsdfs.tex_ids)
    textured = bool(tids.size) and bool((tids[:, T.TEX_DIFFUSE] >= 0).any())
    if textured:
        arrays["auv"] = pack_uvs(scene.geom)
        arrays["tdiff"] = jnp.asarray(tids[:, T.TEX_DIFFUSE], jnp.int32)
        arrays.setdefault("tex_texels", scene.textures.texels)
        arrays.setdefault("tex_offset", scene.textures.offset)
        arrays.setdefault("tex_width", scene.textures.width)
        arrays.setdefault("tex_height", scene.textures.height)
    has_disp = T.BSDF_DISPERSION in set(scene.present_bsdfs)
    has_media = bool(vpt) and (
        int(np.asarray(scene.objects.medium_in).max(initial=-1)) >= 0
        or int(np.asarray(scene.cam_medium)) >= 0)
    has_grid = False
    if has_media:
        if textured:
            raise ValueError("fused VPT + deferred textures not supported")
        arrays["mrow"] = pack_media(scene)
        mt = np.asarray(scene.media.mtype)
        has_grid = bool((mt == T.MEDIUM_GRID).any())
        if has_grid:
            # XLA-side grid data (never enters the kernel): the split swf
            # driver delta-tracks flight and ratio-tracks NEE
            # transmittance with per-lane gathers (EXP_R5_MICRO: 54 ns
            # per trilinear lookup at 262k lanes)
            g = scene.grids
            arrays["gr_density"] = g.density
            arrays["gr_emis"] = g.emission
            arrays["gr_bmin"] = g.bbox_min
            arrays["gr_bmax"] = g.bbox_max
            arrays["gr_major"] = g.majorant
            arrays["gr_avg"] = g.avg_density
            arrays["gr_gid"] = jnp.asarray(scene.media.grid_id)
            arrays["gr_scale"] = jnp.asarray(scene.media.scale)
            arrays["gr_albedo"] = jnp.asarray(scene.media.sigma_s)
            arrays["gr_isg"] = jnp.asarray(
                (mt == T.MEDIUM_GRID).astype(np.float32))
            # per-GRID density scale (the NEE post-pass tracks per grid,
            # not per medium): scale of the medium referencing grid j
            gids_np = np.asarray(scene.media.grid_id)
            sc_np = np.asarray(scene.media.scale, np.float32)
            G = int(np.asarray(g.majorant).shape[0])
            gsc = np.ones(G, np.float32)
            for j in range(G):
                ref = np.nonzero(gids_np == j)[0]
                if ref.size:
                    gsc[j] = sc_np[ref[0]]
            arrays["gr_gscale"] = jnp.asarray(gsc)
    ambient = float(int(np.asarray(scene.cam_medium))) if vpt else -1.0
    return MKPack(arrays, node_fmt, attr_fmt, tri_only, prim_fmt, has_env,
                  has_disp, textured, has_media,
                  max_leaf=int(scene.bvh.max_leaf), ambient_med=ambient,
                  max_stack=max_stack, has_grid=has_grid)


def trace_megakernel(pack, md, o, d, rng, max_leaf: int | None = None,
                     interpret=None, tile: int | None = None,
                     nee_candidates: int = 1,
                     vmem_limit_bytes: int | None = None,
                     count_stats: bool = False, ablate: str = ""):
    """Full in-kernel trace: (B, 3) rays + (B, 2) u32 pcg states → L (B, 3).

    pack: make_pack(scene) (scene must pass megakernel_ok). Plain dicts
    (legacy callers) are treated as f32/f32 packs with spheres enabled.
    max_leaf defaults to the value recorded at pack time — passing a
    smaller one silently drops leaf prims (caught the hard way on
    medium-cbox, max_leaf 8)."""
    if not isinstance(pack, MKPack):
        pack = MKPack(pack)
    if pack.has_grid:
        raise ValueError(
            "grid-media packs need the split swf driver "
            "(trace_megakernel_swf split=True): grid flight and NEE "
            "transmittance resolve in XLA between kernel phases")
    if max_leaf is None:
        max_leaf = pack.max_leaf
    elif max_leaf < pack.max_leaf:
        raise ValueError(
            f"max_leaf={max_leaf} < pack max_leaf={pack.max_leaf}: "
            "leaf prims would be silently skipped")
    if interpret is None:
        interpret = INTERPRET
    if tile is None:
        tile = TILE
    if pack.textured:
        tile = min(tile, 4096)  # bound the per-bounce group VMEM
    B = o.shape[0]
    # shrink to the batch (multiple of 1024 keeps R a sublane multiple of 8)
    # round caller tiles up to a multiple of 1024 FIRST (R=tile//128
    # must satisfy R*128 == tile or the (T,R,128) reshape fails —
    # ADVICE r4), then shrink to the batch
    tile = -(-tile // 1024) * 1024
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

    brows = pack["brows"]
    D1 = int(md.max_depth) + 1
    scene_args = [nodes, prims, attrs, erow, eprims, brows]
    scene_specs = [full_spec(nodes), full_spec(prims), full_spec(attrs),
                   full_spec(erow), full_spec(eprims), full_spec(brows)]
    if pack.has_media:
        scene_args.append(pack["mrow"])
        scene_specs.append(full_spec(pack["mrow"]))
    if pack.textured:
        scene_args.append(pack["auv"])
        scene_specs.append(full_spec(pack["auv"]))
    args = tuple(scene_args) + (
        c2(o_p, 0), c2(o_p, 1), c2(o_p, 2),
        c2(d_p, 0), c2(d_p, 1), c2(d_p, 2),
        c2(rng_p, 0), c2(rng_p, 1))
    in_specs = scene_specs + [ray_spec] * 8
    A_spec = pl.BlockSpec((1, D1, R, 128), lambda t: (t, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    A_shape = jax.ShapeDtypeStruct((T_, D1, R, 128), jnp.float32)
    ray_shape = jax.ShapeDtypeStruct((T_, R, 128), jnp.float32)
    out_specs = [ray_spec] * 3
    out_shape = [ray_shape] * 3
    if pack.has_env:
        out_specs += [ray_spec] * 6
        out_shape += [ray_shape] * 6
    if pack.textured:
        out_specs += [A_spec] * 6
        out_shape += [A_shape] * 6
        if pack.has_env:
            out_specs += [ray_spec]
            out_shape += [ray_shape]
    if count_stats:
        out_specs += [ray_spec] * 2
        out_shape += [ray_shape] * 2
    n_bsdfs = pack["brows"].shape[0] * SLOTS // 2
    if pack.has_media and int(nee_candidates) != 1:
        raise ValueError("fused VPT supports nee_candidates=1")
    kern = functools.partial(
        _kernel, int(md.max_depth), int(md.max_diffuse),
        int(md.max_specular), int(md.max_transmit),
        int(getattr(md, "max_volume", 64)),
        int(max_leaf), rn, MAX_EMITTERS, n_bsdfs, int(nee_candidates),
        pack.node_fmt, pack.attr_fmt, pack.prim_fmt, pack.tri_only,
        pack.has_env, pack.has_disp, pack.textured, pack.has_media,
        MAX_MEDIA, float(pack.ambient_med), bool(count_stats),
        False, str(ablate), "", False,
    )
    cparams = None
    if vmem_limit_bytes is not None and not interpret:
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    scratch = []
    if pack.node_fmt == "w8":
        scratch = [pltpu.SMEM((max(pack.max_stack, 16),), jnp.int32),
                   pltpu.SMEM((1,), jnp.int32)]
    outs = pl.pallas_call(
        kern,
        grid=(T_,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        **({"scratch_shapes": scratch} if scratch else {}),
        **({"compiler_params": cparams} if cparams is not None else {}),
    )(*args)

    def flat(x):
        return x.reshape(-1)[:B]

    def flat_d1(x):  # (T_, D1, R, 128) -> (D1, B)
        return x.transpose(1, 0, 2, 3).reshape(D1, -1)[:, :B]

    L = jnp.stack([flat(outs[0]), flat(outs[1]), flat(outs[2])], axis=-1)
    idx = 3
    if pack.has_env:
        mdir = jnp.stack([flat(outs[idx]), flat(outs[idx + 1]),
                          flat(outs[idx + 2])], axis=-1)
        mthp = jnp.stack([flat(outs[idx + 3]), flat(outs[idx + 4]),
                          flat(outs[idx + 5])], axis=-1)
        idx += 6
    if pack.textured:
        # deferred-texture epilogue: the kernel traced with kd_base only
        # and recorded (bid, uv) per bounce; contribution group k carries
        # the product of the first k texture factors. One batched bilinear
        # gather per bounce (XLA-native) rebuilds the prefixes — per-lane
        # texel gathers never enter the Pallas kernel.
        from ...scene import textures as tex
        from ...scene import types as TT

        Ab = jnp.stack([flat_d1(outs[idx + c]) for c in range(3)],
                       axis=-1)                              # (D1, B, 3)
        bidq = flat_d1(outs[idx + 3])
        uv = jnp.stack([flat_d1(outs[idx + 4]), flat_d1(outs[idx + 5])],
                       axis=-1)                              # (D1, B, 2)
        idx += 6
        tdiff = pack["tdiff"]
        bid_i = jnp.clip(bidq.astype(jnp.int32), 0, tdiff.shape[0] - 1)
        tid = jnp.where(bidq >= 0.0, tdiff[bid_i], -1)
        atlas = TT.TextureAtlas(
            texels=pack["tex_texels"], offset=pack["tex_offset"],
            width=pack["tex_width"], height=pack["tex_height"])
        m = tex.sample_texture(atlas, tid.reshape(-1),
                               uv.reshape(-1, 2))[..., :3]
        m = m.reshape(D1, -1, 3)
        m = jnp.where((tid >= 0)[..., None], m, 1.0)
        pref = jnp.concatenate(
            [jnp.ones((1,) + m.shape[1:], jnp.float32),
             jnp.cumprod(m, axis=0)], axis=0)                # (D1+1, B, 3)
        L = L + jnp.sum(pref[:D1] * Ab, axis=0)
        if pack.has_env:
            mb = flat(outs[idx])
            g = jnp.clip(mb.astype(jnp.int32) + 1, 0, D1)
            pref_g = jnp.take_along_axis(
                pref, g[None, :, None].astype(jnp.int32), axis=0)[0]
            L = L + pref_g * mthp * _env_radiance(pack, mdir)
    elif pack.has_env:
        # XLA epilogue: resolve recorded miss directions against the env
        # map (exact radiance incl. bilinear texture + rotations) and add
        # thp * Le with MIS weight 1 — see _kernel's miss-record comment.
        L = L + mthp * _env_radiance(pack, mdir)
    if count_stats:
        # per-tile node-iteration / leaf-entry counts (identical across a
        # tile's lanes by construction): one lane per tile is the count
        cn = outs[-2][:, 0, 0]
        cl = outs[-1][:, 0, 0]
        return L, {"node_iters": jnp.sum(cn), "leaf_entries": jnp.sum(cl),
                   "tiles": jnp.float32(T_)}
    return L


def _morton21(qx, qy, qz):
    """Interleave three 7-bit ints into a 21-bit Morton code (i32)."""
    def spread(v):
        # standard 3D Morton bit spread (10-bit constants cover 7 bits)
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return spread(qx) | (spread(qy) << 1) | (spread(qz) << 2)


def swf_sort_key(state, key_mode: str = "dir_pos", tlbox=None):
    """Inter-bounce ray-ordering key: live lanes first, grouped for
    traversal coherence. The TPU analogue of the reference's wavefront
    ray sorting (src/pt_impl/wf_path_tracer.cu:133-139) — but keyed on
    TRAVERSAL locality, not material: on a per-tile shared walk the win
    is shrinking each tile's BVH visit union, not shading divergence
    (EXP_DISSECT_BIG: incoherent bounce walks cost ~4x primary walks).

    Modes: "dir_pos" (direction octant, then origin Morton cell),
    "pos_dir" (the reverse), and the treelet family (requires tlbox,
    make_pack node_fmt="w8"): rays keyed FIRST by the nearest-entered
    treelet-root AABB — the subtree where the closest hit most likely
    resolves — so each tile's walk union collapses to a few subtrees and
    per-lane t_best culling fires early. "tl_pos" breaks ties by the
    Morton cell of the treelet ENTRY POINT (not the origin: entry points
    localize reflected rays converging on the same region), "tl_oct" by
    direction octant only."""
    ox, oy, oz = state[2], state[3], state[4]
    dx, dy, dz = state[5], state[6], state[7]
    act = state[14]

    def q7(v):
        lo = jnp.min(v)
        hi = jnp.max(v)
        n = jnp.clip((v - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 0.9999)
        return (n * 128.0).astype(jnp.int32)

    oct_ = ((dx < 0).astype(jnp.int32) * 4
            + (dy < 0).astype(jnp.int32) * 2
            + (dz < 0).astype(jnp.int32))
    if key_mode.startswith("tl"):
        if tlbox is None:
            raise ValueError(
                "treelet sort keys need a w8 pack (tlbox missing)")
        tn, tf, tl = _nearest_treelet(tlbox, ox, oy, oz, dx, dy, dz)
        if key_mode == "tl_oct":
            key = (tl << 3) | oct_
        else:  # tl_pos
            ex = ox + tn * dx
            ey = oy + tn * dy
            ez = oz + tn * dz
            key = (tl << 21) | _morton21(q7(ex), q7(ey), q7(ez))
    else:
        m = _morton21(q7(ox), q7(oy), q7(oz))
        if key_mode == "pos_dir":
            key = (m << 3) | oct_
        else:  # dir_pos (default)
            key = (oct_ << 21) | m
    return jnp.where(act > 0.5, key, jnp.int32(1 << 30))


def _nearest_treelet(tlbox, ox, oy, oz, dx, dy, dz):
    """Per-lane nearest-entered treelet: (entry_t, exit_t, index). Lanes
    entering no treelet box get index Tt (they can only hit the env) and
    entry_t 0. Vectorized (B, Tt) slab test — pure XLA, ~15 flops per
    lane-box."""
    inv = lambda v: jnp.where(jnp.abs(v) < 1e-12,  # noqa: E731
                              jnp.float32(1e12), 1.0 / v)
    lo = tlbox[:, 0:3]
    hi = tlbox[:, 3:6]
    o = jnp.stack([ox, oy, oz], axis=-1)[:, None, :]    # (B, 1, 3)
    iv = jnp.stack([inv(dx), inv(dy), inv(dz)], axis=-1)[:, None, :]
    t0 = (lo[None] - o) * iv
    t1 = (hi[None] - o) * iv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)          # (B, Tt)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    entered = (tn <= tf) & (tf > 1e-5)
    tval = jnp.where(entered, jnp.maximum(tn, 0.0), jnp.inf)
    tl = jnp.argmin(tval, axis=1).astype(jnp.int32)
    tmin = jnp.min(tval, axis=1)
    none = ~jnp.any(entered, axis=1)
    tl = jnp.where(none, jnp.int32(tlbox.shape[0]), tl)
    tmin = jnp.where(none, 0.0, tmin)
    return tmin, tf, tl


def trace_megakernel_swf(pack, md, o, d, rng, max_leaf: int | None = None,
                         interpret=None, tile: int | None = None,
                         nee_candidates: int = 1,
                         vmem_limit_bytes: int | None = None,
                         key_mode: str = "dir_pos", ablate: str = "",
                         split: bool = False):
    """Sorted-wavefront fused trace: the SAME bounce_body as
    trace_megakernel, but run one bounce per pallas_call with the ray
    population re-sorted between bounces by swf_sort_key.

    Motivation (EXP_DISSECT_BIG, EXP_LEAF_SWEEP): the fused walk is
    tile-shared, so its cost per tile is the UNION of the tile's rays'
    BVH visits; incoherent bounce tiles on bunny/whiskey-class trees
    degrade toward whole-tree sweeps (bounce walks ~4x primary). Sorting
    restores primary-like coherence every bounce. key_mode="none" (same
    grouping as trace_megakernel) is BIT-identical per lane; sorted modes
    are near-exact only: the per-lane (tn < t_best) box culling uses
    rounded f32 slab arithmetic, so it is not perfectly conservative
    w.r.t. the f32 triangle test — a lane pulled into a leaf by its
    tilemates can find a hit whose box its solo walk rounds away
    (observed at the 1-ulp / ~1-lane-in-150 level on medium-cbox;
    tests/test_swf.py holds both contracts).

    Textured packs ride INLINE texturing (round 5): the kernel records
    each bounce's NEE contribution pre-texel plus the hit (bid, uv); the
    driver resolves the kd texel between segment calls (one batched XLA
    bilinear gather) and multiplies it into the NEE contribution and the
    carried throughput — the exact composed estimator, no deferred
    contribution groups. (In-kernel RR sees the throughput before this
    bounce's texel lands — a different-variance, still-unbiased schedule
    vs the composed path, same property the deferred mode has.)

    Unsupported here: count_stats."""
    if not isinstance(pack, MKPack):
        pack = MKPack(pack)
    if max_leaf is None:
        max_leaf = pack.max_leaf
    elif max_leaf < pack.max_leaf:
        raise ValueError(
            f"max_leaf={max_leaf} < pack max_leaf={pack.max_leaf}")
    if interpret is None:
        interpret = INTERPRET
    if tile is None:
        tile = TILE
    B = o.shape[0]
    # round caller tiles up to a multiple of 1024 FIRST (R=tile//128
    # must satisfy R*128 == tile or the (T,R,128) reshape fails —
    # ADVICE r4), then shrink to the batch
    tile = -(-tile // 1024) * 1024
    tile = max(min(tile, -(-B // 1024) * 1024), 1024)
    pad = (-B) % tile
    Bp = B + pad
    R = tile // 128
    T_ = Bp // tile

    nodes = pack["nodes"]
    rn = nodes.shape[0]
    scene_args = [nodes, pack["prims"], pack["attrs"], pack["erow"],
                  pack["eprims"], pack["brows"]]
    if pack.has_media:
        scene_args.append(pack["mrow"])
    if pack.textured:
        scene_args.append(pack["auv"])

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    scene_specs = [full_spec(a) for a in scene_args]
    ray_spec = pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda t: (0, 0),
                             memory_space=pltpu.SMEM)

    n_state = (21 + (6 if pack.has_env else 0)
               + (5 if pack.has_media else 0)
               + (6 if pack.textured else 0)
               + (9 if pack.has_grid else 0))
    state_dtypes = [jnp.uint32, jnp.uint32] + [jnp.float32] * (n_state - 2)

    n_bsdfs = pack["brows"].shape[0] * SLOTS // 2
    if pack.has_media and int(nee_candidates) != 1:
        raise ValueError("fused VPT supports nee_candidates=1")
    if pack.has_grid:
        split = True  # grid flight/NEE transmittance resolve in XLA
    if split and "g_hit" not in pack.keys():
        raise ValueError("split traversal needs a w8 pack (g_hit matrix)")
    n_hit = 0
    n_gf = 5 if (split and pack.has_grid) else 0
    if split:
        n_hit = (11 + (0 if pack.tri_only else 1)
                 + (2 if pack.textured else 0)
                 + (2 if pack.has_media else 0))
    kern = functools.partial(
        _kernel, int(md.max_depth), int(md.max_diffuse),
        int(md.max_specular), int(md.max_transmit),
        int(getattr(md, "max_volume", 64)),
        int(max_leaf), rn, MAX_EMITTERS, n_bsdfs, int(nee_candidates),
        pack.node_fmt, pack.attr_fmt, pack.prim_fmt, pack.tri_only,
        pack.has_env, pack.has_disp, pack.textured, pack.has_media,
        MAX_MEDIA, float(pack.ambient_med), False,
        True, str(ablate), "shade" if split else "", pack.has_grid,
    )
    cparams = None
    if vmem_limit_bytes is not None and not interpret:
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    scratch = []
    if pack.node_fmt == "w8":
        scratch = [pltpu.SMEM((max(pack.max_stack, 16),), jnp.int32),
                   pltpu.SMEM((1,), jnp.int32)]

    call = pl.pallas_call(
        kern,
        grid=(T_,),
        in_specs=(scene_specs + [smem_spec] + [ray_spec] * n_state
                  + [ray_spec] * (n_hit + n_gf)),
        out_specs=tuple([ray_spec] * n_state),
        out_shape=tuple(jax.ShapeDtypeStruct((T_, R, 128), dt)
                        for dt in state_dtypes),
        interpret=interpret,
        **({"scratch_shapes": scratch} if scratch else {}),
        **({"compiler_params": cparams} if cparams is not None else {}),
    )

    if split:
        # traverse-only kernel: slim walk -> (t, gid, u, v); scene tables
        # beyond nodes/prims are unused 1-row dummies (DCE'd; no VMEM)
        kern_t = functools.partial(
            _kernel, int(md.max_depth), int(md.max_diffuse),
            int(md.max_specular), int(md.max_transmit),
            int(getattr(md, "max_volume", 64)),
            int(max_leaf), rn, MAX_EMITTERS, n_bsdfs, 1,
            pack.node_fmt, pack.attr_fmt, pack.prim_fmt, pack.tri_only,
            False, False, False, False,
            MAX_MEDIA, -1.0, False,
            False, "slimleaf", "traverse", False,
        )
        dummy = jnp.zeros((1, 128), jnp.float32)
        trav_args = [pack["nodes"], pack["prims"], dummy, dummy, dummy,
                     dummy]
        trav_specs = [full_spec(a) for a in trav_args]
        call_t = pl.pallas_call(
            kern_t,
            grid=(T_,),
            in_specs=trav_specs + [ray_spec] * 7,
            out_specs=tuple([ray_spec] * 4),
            out_shape=tuple(jax.ShapeDtypeStruct((T_, R, 128), jnp.float32)
                            for _ in range(4)),
            interpret=interpret,
            **({"scratch_shapes": scratch} if scratch else {}),
            **({"compiler_params": cparams} if cparams is not None else {}),
        )
        ghit = pack["g_hit"]
        M_ = ghit.shape[0]

        def resolve_hit(st):
            """traverse + ONE (Bp, 32) row gather -> shade input planes."""
            tv, gidf, uu, vv = (x.reshape(-1) for x in call_t(
                *trav_args,
                *(st[i].reshape(T_, R, 128) for i in range(2, 8)),
                st[14].reshape(T_, R, 128)))
            gi = jnp.clip(gidf.astype(jnp.int32), 0, M_ - 1)
            row = jnp.take(ghit, gi, axis=0)
            hitf = jnp.where(gidf >= 0.0, 1.0, 0.0)
            w0 = 1.0 - uu - vv
            ns = (w0[:, None] * row[:, 0:3] + uu[:, None] * row[:, 3:6]
                  + vv[:, None] * row[:, 6:9])
            ng = row[:, 9:12]
            if not pack.tri_only:
                sphc = (row[:, 18] > 0.5)[:, None]
                ns = jnp.where(sphc, row[:, 12:15], ns)
                ng = jnp.where(sphc, row[:, 12:15], ng)
            hplanes = [tv, hitf, ns[:, 0], ns[:, 1], ns[:, 2],
                       ng[:, 0], ng[:, 1], ng[:, 2],
                       row[:, 15], row[:, 17]]
            if not pack.tri_only:
                hplanes.append(row[:, 18])  # sph precedes bid (kernel order)
            hplanes.append(row[:, 16])
            if pack.textured:
                uvi = (w0[:, None] * row[:, 21:23]
                       + uu[:, None] * row[:, 23:25]
                       + vv[:, None] * row[:, 25:27])
                hplanes += [uvi[:, 0], uvi[:, 1]]
            if pack.has_media:
                hplanes += [row[:, 19], row[:, 20]]
            return hplanes

    if split and pack.has_grid:
        from ...media import grid as gridmod

        grids_sd = T.GridMediumData(
            density=pack["gr_density"], emission=pack["gr_emis"],
            bbox_min=pack["gr_bmin"], bbox_max=pack["gr_bmax"],
            majorant=pack["gr_major"], avg_density=pack["gr_avg"])
        Vm = pack["gr_isg"].shape[0]
        Gm = pack["gr_major"].shape[0]
        med_base = 21 + (6 if pack.has_env else 0)
        grid_base = n_state - 9

        def _side_rng(st):
            # independent side stream for the XLA tracking loops: the
            # kernel's pcg lanes advance a fixed per-bounce draw count
            # regardless, so xor-derived states never collide with the
            # in-kernel stream (documented draw-order difference vs the
            # composed VPT; parity contract is mean agreement)
            return jnp.stack(
                [st[0] ^ jnp.uint32(0x9E3779B9),
                 st[1] ^ jnp.uint32(0x85EBCA6B)], axis=-1)

        def grid_flight(st, t_surf):
            """XLA delta-tracking pre-pass -> 5 flight planes."""
            cur = jnp.where(
                st[med_base + 3] >= 2.0, st[med_base + 2],
                jnp.where(st[med_base + 3] >= 1.0, st[med_base + 1],
                          jnp.where(st[med_base + 3] >= 0.0, st[med_base],
                                    jnp.float32(pack.ambient_med))))
            curi = jnp.clip(cur.astype(jnp.int32), 0, Vm - 1)
            in_grid = ((cur >= 0.0) & (pack["gr_isg"][curi] > 0.5)
                       & (st[14] > 0.5))
            o = jnp.stack([st[2], st[3], st[4]], axis=-1)
            d = jnp.stack([st[5], st[6], st[7]], axis=-1)
            gid = jnp.maximum(pack["gr_gid"][curi], 0)
            scale = pack["gr_scale"][curi]
            maj = jnp.maximum(pack["gr_major"][gid] * scale, 1e-6)
            albedo = pack["gr_albedo"][curi]
            res, _ = gridmod.sample_distance_arrays(
                grids_sd, gid, scale, maj, albedo, o, d,
                jnp.where(jnp.isfinite(t_surf), t_surf, 1e8),
                _side_rng(st), in_grid)
            w = res["weight"]
            return [res["t"], jnp.where(res["is_medium"], 1.0, 0.0),
                    w[:, 0], w[:, 1], w[:, 2]]

        def grid_nee_resolve(st):
            """XLA post-pass: ratio-track the recorded NEE segments
            through every grid and add contribution * Tr to L."""
            st = list(st)
            c = [st[grid_base + i] for i in range(3)]
            p = jnp.stack([st[grid_base + 3 + i] for i in range(3)], -1)
            lpt = jnp.stack([st[grid_base + 6 + i] for i in range(3)], -1)
            seg = lpt - p
            dist = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
            dirn = seg / jnp.maximum(dist, 1e-8)[:, None]
            have = (c[0] + c[1] + c[2]) > 0.0
            tr_tot = jnp.ones_like(dist)
            rng_t = _side_rng(st) ^ jnp.uint32(0x51633E2D)
            for g in range(Gm):
                bmin = pack["gr_bmin"][g]
                bmax = pack["gr_bmax"][g]
                inv = 1.0 / jnp.where(
                    jnp.abs(dirn) < 1e-9,
                    jnp.where(dirn < 0, -1e-9, 1e-9), dirn)
                t0s = (bmin[None, :] - p) * inv
                t1s = (bmax[None, :] - p) * inv
                tn = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
                tf = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
                t_in = jnp.maximum(tn, 0.0)
                t_out = jnp.minimum(tf, dist)
                seg_len = jnp.maximum(t_out - t_in, 0.0)
                act_g = have & (seg_len > 1e-6)
                gidv = jnp.full_like(dist, g).astype(jnp.int32)
                scale = pack["gr_gscale"][g]
                maj = jnp.maximum(pack["gr_major"][g] * scale, 1e-6)
                tr_g, _ = gridmod.transmittance_residual_arrays(
                    grids_sd, gidv, scale, maj,
                    p + t_in[:, None] * dirn, dirn, seg_len,
                    rng_t ^ jnp.uint32(g * 0x632BE5AB), act_g)
                tr_tot = tr_tot * jnp.where(act_g, tr_g, 1.0)
            for i in range(3):
                st[11 + i] = st[11 + i] + c[i] * tr_tot
            return tuple(st)

    def prep(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    o_p, d_p, rng_p = prep(o), prep(d), prep(rng)
    fz = jnp.zeros(Bp, jnp.float32)
    fo = jnp.ones(Bp, jnp.float32)
    act0 = (jnp.arange(Bp) < B).astype(jnp.float32)
    state = [rng_p[:, 0].astype(jnp.uint32), rng_p[:, 1].astype(jnp.uint32),
             o_p[:, 0], o_p[:, 1], o_p[:, 2],
             d_p[:, 0], d_p[:, 1], d_p[:, 2],
             fo, fo, fo,            # throughput
             fz, fz, fz,            # L
             act0, fo, fo,          # act, prev_pdf, prev_delta(=1)
             fz, fz, fz,            # n_diff/spec/trans
             fz]                    # wl
    if pack.has_env:
        state += [fz, fz, fo, fz, fz, fz]   # mdx,mdy,mdz(=1),mtr,mtg,mtb
    if pack.has_media:
        state += [fz - 1.0, fz - 1.0, fz - 1.0, fz - 1.0, fz]
    if pack.textured:
        state += [fz, fz, fz, fz - 1.0, fz, fz]  # nee rgb, bid, u, v
    if pack.has_grid:
        state += [fz] * 9  # grid NEE record: contrib rgb, event p, light p
    state = tuple(state)
    pix0 = jnp.arange(Bp, dtype=jnp.int32)

    def cond(cr):
        bounce, _, st = cr
        return (bounce < int(md.max_depth)) & jnp.any(st[14] > 0.5)

    tlbox = pack["tlbox"] if (key_mode.startswith("tl")
                              and "tlbox" in pack.keys()) else None
    if key_mode.startswith("tl") and tlbox is None:
        raise ValueError(
            "treelet sort keys need a w8 pack (make_pack node_fmt='w8')")

    def step(cr):
        bounce, pix, st = cr
        if key_mode != "none":
            perm = jnp.argsort(swf_sort_key(st, key_mode, tlbox))
            pix = pix[perm]
            # ONE row gather moves all state: pack the n_state lanes (+pix)
            # into a (Bp, 128-padded) matrix — 27+ separate (Bp,) gathers
            # cost far more than one bandwidth-bound row gather on TPU.
            # The matrix is int32, not float32: uint32 RNG bit patterns
            # aliasing float32 NaNs (~0.4% of values) must never transit a
            # float dtype where a canonicalizing copy could rewrite them
            # (ADVICE r4); int gathers are bit-exact by construction.
            i32 = jnp.int32
            cols = [jax.lax.bitcast_convert_type(st[0], i32),
                    jax.lax.bitcast_convert_type(st[1], i32)]
            cols += [jax.lax.bitcast_convert_type(st[i], i32)
                     for i in range(2, n_state)]
            mat = jnp.stack(cols, axis=-1)
            mat = jnp.take(mat, perm, axis=0)
            st = ((jax.lax.bitcast_convert_type(mat[:, 0], jnp.uint32),
                   jax.lax.bitcast_convert_type(mat[:, 1], jnp.uint32))
                  + tuple(jax.lax.bitcast_convert_type(mat[:, i],
                                                       jnp.float32)
                          for i in range(2, n_state)))
        extra = ()
        if split:
            hp = resolve_hit(st)
            if pack.has_grid:
                hp = hp + grid_flight(st, hp[0])
            extra = tuple(h.reshape(T_, R, 128) for h in hp)
        outs = call(*scene_args, jnp.full((1, 1), bounce, jnp.int32),
                    *(a.reshape(T_, R, 128) for a in st), *extra)
        st = tuple(x.reshape(-1) for x in outs)
        if pack.has_grid:
            st = grid_nee_resolve(st)
        if pack.textured:
            # inline texel resolution for this bounce: one batched XLA
            # bilinear gather (per-lane texel fetches never enter the
            # Pallas kernel — TPUs have no per-lane gather)
            from ...scene import textures as tex
            from ...scene import types as TT

            ti = n_state - 6
            neev = jnp.stack([st[ti], st[ti + 1], st[ti + 2]], axis=-1)
            bidq = st[ti + 3]
            uvq = jnp.stack([st[ti + 4], st[ti + 5]], axis=-1)
            tdiff = pack["tdiff"]
            bid_i = jnp.clip(bidq.astype(jnp.int32), 0, tdiff.shape[0] - 1)
            tid = jnp.where(bidq >= 0.0, tdiff[bid_i], -1)
            atlas = TT.TextureAtlas(
                texels=pack["tex_texels"], offset=pack["tex_offset"],
                width=pack["tex_width"], height=pack["tex_height"])
            m = tex.sample_texture(atlas, tid, uvq)[..., :3]
            m = jnp.where((tid >= 0)[:, None], m, 1.0)
            st = list(st)
            # NEE contribution carries this hit's texel; the sampled
            # continuation's throughput does too (kd-linear families only
            # ride inline texturing — megakernel_ok gates lambert/ON)
            for c in range(3):
                st[11 + c] = st[11 + c] + neev[:, c] * m[:, c]
                st[8 + c] = st[8 + c] * m[:, c]
            st = tuple(st)
        return bounce + 1, pix, st

    _, pix, st = jax.lax.while_loop(cond, step, (jnp.int32(0), pix0, state))

    if _SWF_DEBUG_STATE:
        # diagnostic: full per-lane state un-permuted to caller order.
        # Scatter as int32 — float NaN-pattern scatters may canonicalize.
        unsorted = []
        for x in st:
            xi = jax.lax.bitcast_convert_type(x, jnp.int32)
            unsorted.append(jnp.zeros(B, jnp.int32).at[pix].set(
                xi, mode="drop"))
        return tuple(unsorted)

    L_s = jnp.stack([st[11], st[12], st[13]], axis=-1)
    if pack.has_env:
        mdir = jnp.stack([st[21], st[22], st[23]], axis=-1)
        mthp = jnp.stack([st[24], st[25], st[26]], axis=-1)
        L_s = L_s + mthp * _env_radiance(pack, mdir)
    # un-permute back to caller lane order (pix carries the original slot)
    L = jnp.zeros((B, 3), jnp.float32).at[pix].set(L_s, mode="drop")
    return L


def _env_radiance(pack: "MKPack", d: jnp.ndarray) -> jnp.ndarray:
    """Environment radiance for (B, 3) directions from the pack's epilogue
    arrays — same math as emitters.env_radiance (lat-long HDRI, runtime
    scale/azimuth/zenith rotation, reference src/impl/emitter.cu:26-73)."""
    from ...scene import textures as tex
    from ...scene import types as TT

    extra = pack["env_extra"]
    scale, azimuth, zen = extra[0], extra[1], extra[2]
    cz, sz = jnp.cos(zen), jnp.sin(zen)
    dy = d[..., 1] * cz - d[..., 2] * sz
    dz2 = d[..., 1] * sz + d[..., 2] * cz
    phi = jnp.arctan2(dz2, d[..., 0]) + azimuth
    theta = jnp.arccos(jnp.clip(dy, -1.0, 1.0))
    u = phi / (2.0 * jnp.pi) + 0.5
    v = theta / jnp.pi
    uv = jnp.stack([u, v], axis=-1)
    atlas = TT.TextureAtlas(
        texels=pack["tex_texels"], offset=pack["tex_offset"],
        width=pack["tex_width"], height=pack["tex_height"])
    tid = jnp.broadcast_to(pack["env_tid"], d.shape[:-1])
    texv = tex.sample_texture(atlas, tid, uv)[..., :3]
    return texv * pack["env_base"] * jnp.maximum(scale, 0.0)


# Scene-size threshold for the driver auto-pick: boxes above this ride the
# sorted-wavefront driver (per-bounce pos_dir re-sorting restores
# primary-like walk coherence: bunny 1.35x / whiskey 1.68x on-chip,
# EXP_R5_COHERENCE); below it the whole-path megakernel wins (sort glue
# ~0.3-1.6 ms/bounce is pure overhead on cornell-class trees).
SWF_AUTO_BOXES = 512


def _pack_boxes(pack: "MKPack") -> int:
    """Approximate box count of the pack's node table (any node format)."""
    rows = pack["nodes"].shape[0]
    if pack.node_fmt == "w8":
        return rows * 8
    return rows * (SLOTS16 if pack.node_fmt == "bf16" else SLOTS)


def auto_trace(pack, md, o, d, rng, max_leaf: int | None = None,
               interpret=None, nee_candidates: int = 1):
    """Scene-size auto-pick between the whole-path megakernel and the
    sorted-wavefront driver (key_mode='pos_dir', tile 4096 — the measured
    big-scene optimum). Same estimator either way; per-lane results under
    sorted regrouping are near-exact (trace_megakernel_swf docstring)."""
    if pack.has_grid or _pack_boxes(pack) >= SWF_AUTO_BOXES:
        # grid packs ride swf regardless of size (the driver auto-enables
        # the split pipeline their flight/transmittance passes need)
        return trace_megakernel_swf(pack, md, o, d, rng,
                                    max_leaf=max_leaf, interpret=interpret,
                                    nee_candidates=nee_candidates,
                                    key_mode="pos_dir", tile=4096)
    return trace_megakernel(pack, md, o, d, rng, max_leaf=max_leaf,
                            interpret=interpret,
                            nee_candidates=nee_candidates)


def render_pack(pack, cam, md, spp: int, seed, max_leaf: int | None = None,
                interpret=None, nee_candidates: int = 1):
    """spp-pass fused render from a prebuilt pack → (H, W, 3). Jittable in
    (pack, seed); same per-(pixel, sample) pcg streams as
    models/path_tracer.render.

    Big scenes (auto_trace → swf) batch ALL spp samples into ONE driver
    call: 4x the lanes per sort quadruples each tile's post-sort
    coherence and amortizes the per-bounce glue; streams are keyed by
    (pixel, sample) either way, so the image is identical."""
    from ...core import camera as cam_mod
    from ...core import qmc

    B = cam.width * cam.height
    # Z-order lanes: square screen blocks per kernel tile (tile_swizzle).
    # Bit-identical image — the pixel→stream map is untouched.
    perm, inv = tile_swizzle(int(cam.width), int(cam.height))
    lane = perm

    if _pack_boxes(pack) >= SWF_AUTO_BOXES and spp > 1:
        lanes = jnp.tile(lane, spp)
        idxs = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), B)
        rng = qmc.make_state("pcg", seed, lanes, idxs)
        o, d, rng = cam_mod.generate_rays(cam, lanes, rng)
        L = auto_trace(pack, md, o, d, rng, max_leaf=max_leaf,
                       interpret=interpret, nee_candidates=nee_candidates)
        acc = jnp.sum(L.reshape(spp, B, 3), axis=0)
        return (acc[inv] / spp).reshape(cam.height, cam.width, 3)

    def body(i, acc):
        rng = qmc.make_state("pcg", seed, lane, i)
        o, d, rng = cam_mod.generate_rays(cam, lane, rng)
        L = auto_trace(pack, md, o, d, rng, max_leaf=max_leaf,
                       interpret=interpret,
                       nee_candidates=nee_candidates)
        return acc + L

    acc = jax.lax.fori_loop(0, spp, body, jnp.zeros((B, 3), jnp.float32))
    return (acc[inv] / spp).reshape(cam.height, cam.width, 3)


def render_megakernel(scene: T.Scene, cam, md, spp: int, seed: int = 0,
                      sampler: str = "pcg", interpret=None):
    """Convenience wrapper: packs the (concrete) scene, then renders.
    sampler='pcg' only — Sobol state is 4-wide and stays on the composed
    path."""
    assert sampler == "pcg", "fused megakernel supports the pcg sampler"
    pack = make_pack(scene)
    return render_pack(pack, cam, md, spp, seed,
                       max_leaf=int(scene.bvh.max_leaf), interpret=interpret)
