"""Media layer tests: phase functions, homogeneous sampling, grid tracking."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.media import grid as grid_med
from cuda_pt_tpu.media import homogeneous as homo
from cuda_pt_tpu.media import phase as phase_mod
from cuda_pt_tpu.scene import types as T
from cuda_pt_tpu.scene.builder import BSDFSpec, MediumSpec, SceneBuilder


def _sphere_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    d = r.normal(size=(n, 3))
    return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)


def test_phase_normalization():
    """∫ p dω = 1 for every phase type (uniform-sphere MC)."""
    B = 1 << 16
    d_in = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    d_out = _sphere_dirs(B, 1)
    for ptype, g in [
        (T.PHASE_ISOTROPIC, 0.0),
        (T.PHASE_HG, 0.6),
        (T.PHASE_HG, -0.4),
        (T.PHASE_DUAL_HG, 0.5),
        (T.PHASE_RAYLEIGH, 0.0),
    ]:
        val = phase_mod.phase_eval(
            jnp.full(B, ptype), jnp.full(B, g), jnp.full(B, -0.3),
            jnp.full(B, 0.7), d_in, d_out,
        )
        integral = float(jnp.mean(val)) * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.03, (ptype, g, integral)


def test_phase_sampling_matches_eval():
    """E[cosθ] under HG sampling must equal g."""
    B = 1 << 16
    d_in = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (B, 1)), jnp.float32)
    state = prng.seed(3, jnp.arange(B))
    u2, state = prng.next2d(state)
    u1, state = prng.next1d(state)
    for g in [0.0, 0.3, 0.8, -0.5]:
        d_out, pdf = phase_mod.phase_sample(
            jnp.full(B, T.PHASE_HG), jnp.full(B, g), jnp.zeros(B),
            jnp.ones(B), d_in, u2, u1,
        )
        mean_cos = float(jnp.mean(jnp.sum(d_in * d_out, -1)))
        assert abs(mean_cos - g) < 0.02, (g, mean_cos)
        assert np.isfinite(np.asarray(pdf)).all()


def _media_table(sigma_a=(0.2, 0.3, 0.4), sigma_s=(0.5, 0.5, 0.5), scale=1.0):
    b = SceneBuilder()
    b.add_bsdf(BSDFSpec())
    b.add_sphere((0, 0, 0), 1.0, 0)
    b.add_medium(MediumSpec(sigma_a=sigma_a, sigma_s=sigma_s, scale=scale))
    return b.compile()


def test_homogeneous_unbiased_transmittance():
    """Channel-MIS distance sampling: E[weight·𝟙surf] == transmittance and
    the full estimator is energy-consistent."""
    scene = _media_table()
    B = 1 << 16
    mid = jnp.zeros(B, jnp.int32)
    t_surf = jnp.full(B, 2.0)
    state = prng.seed(7, jnp.arange(B))
    u, _ = prng.next2d(state)
    out = homo.sample_distance(scene.media, mid, t_surf, u)
    w = np.asarray(out["weight"])
    is_med = np.asarray(out["is_medium"])
    # surface-hit weights estimate Tr(t_surf) when averaged with indicator
    est_tr = (w * (~is_med)[:, None]).mean(axis=0)
    ref_tr = np.asarray(homo.transmittance(scene.media, mid[:1], t_surf[:1]))[0]
    np.testing.assert_allclose(est_tr, ref_tr, rtol=0.05)
    # medium-event weights estimate ∫ σs Tr = albedo·(1-Tr) per channel
    est_med = (w * is_med[:, None]).mean(axis=0)
    sa = np.array([0.2, 0.3, 0.4]); ss = np.array([0.5, 0.5, 0.5])
    ref_med = ss / (sa + ss) * (1.0 - ref_tr)
    np.testing.assert_allclose(est_med, ref_med, rtol=0.05)


def test_grid_density_lookup_and_tracking():
    b = SceneBuilder()
    b.add_bsdf(BSDFSpec())
    b.add_sphere((0, 0, 0), 1.0, 0)
    dens = np.ones((8, 8, 8), np.float32) * 2.0
    gid = b.add_grid(dens, (-1, -1, -1), (1, 1, 1))
    b.add_medium(MediumSpec(mtype=T.MEDIUM_GRID, grid_id=gid, scale=1.0,
                            sigma_s=(1.0, 1.0, 1.0)))
    scene = b.compile()
    # interior lookup = 2, outside = 0
    p = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]], jnp.float32)
    v = np.asarray(grid_med.density_lookup(scene.grids, jnp.zeros(2, jnp.int32), p))
    np.testing.assert_allclose(v, [2.0, 0.0], atol=1e-5)

    # ratio-tracking transmittance ≈ exp(-σ d) for a constant grid
    B = 1 << 14
    o = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (B, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
    dist = jnp.full(B, 1.5)
    state = prng.seed(9, jnp.arange(B))
    tr, _ = grid_med.transmittance_grid(
        scene, jnp.zeros(B, jnp.int32), o, d, dist, state, jnp.ones(B, bool)
    )
    est = float(jnp.mean(tr))
    ref = float(np.exp(-2.0 * 1.5))
    assert abs(est - ref) < 0.02, (est, ref)

    # delta-tracking free flight: P(medium event before t) = 1 - exp(-σ t)
    out, _ = grid_med.sample_distance_grid(
        scene, jnp.zeros(B, jnp.int32), o, d, jnp.full(B, 1.0),
        prng.seed(11, jnp.arange(B)), jnp.ones(B, bool),
    )
    p_med = float(jnp.mean(out["is_medium"].astype(jnp.float32)))
    assert abs(p_med - (1.0 - np.exp(-2.0))) < 0.02, p_med


def test_blackbody_rgb_monotone_hue():
    t = jnp.asarray([1000.0, 3000.0, 6500.0])
    rgb = np.asarray(grid_med.blackbody_rgb(t))
    assert (rgb >= 0).all()
    # low temp: red-dominant; 6500K ≈ white
    assert rgb[0, 0] > rgb[0, 2] * 5
    np.testing.assert_allclose(rgb[2], 1.0, rtol=1e-3)


def _grid_scene(dens):
    b = SceneBuilder()
    b.add_bsdf(BSDFSpec())
    b.add_sphere((0, 0, 0), 1.0, 0)
    gid = b.add_grid(dens, (-1, -1, -1), (1, 1, 1))
    b.add_medium(MediumSpec(mtype=T.MEDIUM_GRID, grid_id=gid, scale=1.0,
                            sigma_s=(1.0, 1.0, 1.0)))
    return b.compile()


def test_residual_tracking_exact_on_constant_grid():
    """With σ(x) ≡ σ_c the residual product is identically 1, so residual
    tracking returns the analytic exp(-σ_c d) with ZERO variance."""
    scene = _grid_scene(np.ones((8, 8, 8), np.float32) * 2.0)
    B = 1024
    o = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (B, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
    dist = jnp.full(B, 1.5)
    tr, _ = grid_med.transmittance_grid_residual(
        scene, jnp.zeros(B, jnp.int32), o, d, dist, prng.seed(3, jnp.arange(B)),
        jnp.ones(B, bool),
    )
    tr = np.asarray(tr)
    ref = np.exp(-2.0 * 1.5)
    np.testing.assert_allclose(tr, ref, rtol=1e-5)
    assert tr.std() < 1e-6  # zero-variance: the whole point of the control


def test_residual_tracking_unbiased_and_lower_variance():
    """Smooth non-constant grid: residual estimator agrees with ratio
    tracking in expectation and has lower per-sample variance
    (reference residual_tracking_trans_estimate, vol_grid.cu:153-175)."""
    z, y, x = np.meshgrid(
        np.linspace(0, 1, 8), np.linspace(0, 1, 8), np.linspace(0, 1, 8),
        indexing="ij",
    )
    dens = (1.5 + np.sin(3 * x) * np.cos(2 * y) * 0.8 + 0.4 * z).astype(np.float32)
    scene = _grid_scene(dens)
    B = 1 << 14
    o = jnp.tile(jnp.asarray([[-1.0, 0.05, -0.1]]), (B, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
    dist = jnp.full(B, 1.8)
    mid = jnp.zeros(B, jnp.int32)
    act = jnp.ones(B, bool)
    tr_res, _ = grid_med.transmittance_grid_residual(
        scene, mid, o, d, dist, prng.seed(5, jnp.arange(B)), act)
    tr_rat, _ = grid_med.transmittance_grid(
        scene, mid, o, d, dist, prng.seed(6, jnp.arange(B)), act)
    tr_res = np.asarray(tr_res)
    tr_rat = np.asarray(tr_rat)
    m_res, m_rat = tr_res.mean(), tr_rat.mean()
    assert abs(m_res - m_rat) / m_rat < 0.05, (m_res, m_rat)
    assert tr_res.var() < tr_rat.var() * 0.7, (tr_res.var(), tr_rat.var())


def test_vpt_homogeneous_slab_analytic_image():
    """Analytic image test (ROADMAP #10): camera inside a purely absorbing
    homogeneous medium looking head-on at a unit-radiance emitter plane at
    distance 2 → each channel's pixel value must equal exp(-σ_a·2) (MIS of
    emitter-hit + NEE both reduce to attenuated Le)."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import volume_pt
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.builder import EmitterSpec

    sigma_a = np.array([0.3, 0.6, 1.2], np.float32)
    b = SceneBuilder()
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    em = b.add_emitter(EmitterSpec(emission=(1, 1, 1), scaler=1.0))
    b.add_medium(MediumSpec(mtype=T.MEDIUM_HOMOGENEOUS,
                            sigma_a=tuple(sigma_a), sigma_s=(0, 0, 0)))
    # big emitter quad at z=0 facing -z; camera on -z axis at distance 2
    b.add_mesh(testscenes.quad([-4, -4, 0], [-4, 4, 0], [4, 4, 0], [4, -4, 0]),
               dark, emitter_id=em)
    b.cam_medium = 0
    scene = b.compile()
    cam = cam_mod.make_camera((0, 0, -2), (0, 0, 0), fov=8, width=12, height=12)
    md = MaxDepthParams(max_depth=3, max_volume=8)
    img = np.asarray(volume_pt.render(scene, cam, md, spp=256, seed=7, use_bvh=False))
    expect = np.exp(-sigma_a * 2.0)
    got = img.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(got, expect, rtol=0.05)


def _internal_node_blob(level, origin, value_tiles, child_tiles):
    """Serialize one InternalData<float> node (media/nvdb.py _INTERNAL layout).
    value_tiles: {(ix,iy,iz): float}; child_tiles: [(ix,iy,iz)]."""
    import struct

    import numpy as np

    log2dim, nsize, mask_b, table_off, _span = {
        1: (4, 33856, 512, 1088, 8),
        2: (5, 270400, 4096, 8256, 128),
    }[level]
    blob = bytearray(nsize)
    struct.pack_into("<3i", blob, 0, *origin)  # mBBox.min (node-aligned)
    vmask = np.zeros(mask_b * 8, np.uint8)
    cmask = np.zeros(mask_b * 8, np.uint8)

    def idx(t):
        ix, iy, iz = t
        return (ix << (2 * log2dim)) | (iy << log2dim) | iz

    table = np.zeros((1 << (3 * log2dim)) * 2, np.float32)
    for t, val in value_tiles.items():
        vmask[idx(t)] = 1
        table[2 * idx(t)] = val
    for t in child_tiles:
        cmask[idx(t)] = 1
        vmask[idx(t)] = 1  # child tiles may also be marked active
    blob[32 : 32 + mask_b] = np.packbits(vmask, bitorder="little").tobytes()
    blob[32 + mask_b : 32 + 2 * mask_b] = np.packbits(
        cmask, bitorder="little"
    ).tobytes()
    blob[table_off : table_off + table.nbytes] = table.tobytes()
    return bytes(blob)


def _write_synthetic_nvdb(
    path, leaves, index_bbox, codec=0, lower_nodes=(), upper_nodes=()
):
    """Emit the NanoVDB 32.x file layout media/nvdb.py documents: FileHeader,
    FileMetaData + name, GridData(672B) + TreeData + upper/lower/leaf node
    segments. leaves: list of (origin_xyz, (8,8,8) float array indexed
    [z][y][x]); lower/upper_nodes: (origin, value_tiles, child_tiles)."""
    import struct
    import zlib

    import numpy as np

    tree_off_in_grid = 672
    tree_data_size = 64  # 4 offsets + 4 counts + padding
    leaf_blobs = []
    for origin, vals in leaves:
        hdr = struct.pack("<3i", *origin) + b"\0" * (96 - 12)
        v = np.asarray(vals, np.float32).transpose(2, 1, 0)  # [z][y][x] -> [x][y][z]
        leaf_blobs.append(hdr + v.tobytes())
    upper_blobs = [_internal_node_blob(2, o, vt, ct) for o, vt, ct in upper_nodes]
    lower_blobs = [_internal_node_blob(1, o, vt, ct) for o, vt, ct in lower_nodes]
    upper_off = tree_off_in_grid + tree_data_size
    lower_off = upper_off + sum(len(b) for b in upper_blobs)
    leaf_seg_off = lower_off + sum(len(b) for b in lower_blobs)
    grid_size = leaf_seg_off + sum(len(b) for b in leaf_blobs)

    grid = bytearray(grid_size)
    struct.pack_into(  # node offsets: leaf, lower, upper, root (grid-relative)
        "<4Q",
        grid,
        tree_off_in_grid,
        leaf_seg_off,
        lower_off if lower_blobs else 0,
        upper_off if upper_blobs else 0,
        0,
    )
    pos = upper_off
    for b in upper_blobs + lower_blobs + leaf_blobs:
        grid[pos : pos + len(b)] = b
        pos += len(b)

    name = b"density\0"
    meta = bytearray(176)
    struct.pack_into("<QQQQ", meta, 0, grid_size, grid_size, 0, 512 * len(leaves))
    struct.pack_into("<II", meta, 32, 1, 0)  # float, unknown class
    struct.pack_into("<6d", meta, 40, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    struct.pack_into("<6i", meta, 88, *index_bbox)
    struct.pack_into("<3d", meta, 112, 1.0, 1.0, 1.0)
    struct.pack_into("<I", meta, 136, len(name))
    struct.pack_into(
        "<4I", meta, 140, len(leaves), len(lower_blobs), len(upper_blobs), 1
    )

    header = struct.pack("<QIHH", 0x304244566F6E614E, 32 << 21, 1, codec)
    body = bytes(grid)
    if codec == 1:
        comp = zlib.compress(body)
        body = struct.pack("<Q", len(comp)) + comp
    with open(path, "wb") as f:
        f.write(header + bytes(meta) + name + body)


@pytest.mark.parametrize("codec", [0, 1])
def test_nvdb_roundtrip_dense(tmp_path, codec):
    """Decoder reads back exactly what the documented layout encodes —
    leaf placement, [x][y][z] value order, bbox, and the ZIP codec path."""
    import numpy as np

    from cuda_pt_tpu.media.nvdb import load_nvdb_density

    rng = np.random.default_rng(5)
    v0 = rng.uniform(0.1, 1.0, size=(8, 8, 8)).astype(np.float32)
    v1 = rng.uniform(0.1, 1.0, size=(8, 8, 8)).astype(np.float32)
    path = str(tmp_path / f"synth{codec}.nvdb")
    # two leaves: origins (0,0,0) and (8,0,0); index bbox covers 16x8x8
    _write_synthetic_nvdb(
        path, [((0, 0, 0), v0), ((8, 0, 0), v1)], (0, 0, 0, 15, 7, 7), codec=codec
    )
    dense, bmin, bmax = load_nvdb_density(path)
    assert dense.shape == (8, 8, 16)  # (D=z, H=y, W=x)
    np.testing.assert_allclose(dense[:, :, :8], v0)
    np.testing.assert_allclose(dense[:, :, 8:], v1)
    np.testing.assert_allclose(bmin, 0.0)
    np.testing.assert_allclose(bmax, 1.0)


def test_nvdb_internal_tile_values(tmp_path):
    """Constant-value tiles in lower/upper internal nodes expand to their
    8³/128³ footprints; child tiles defer to the leaf data (reference
    reads these through the NanoVDB tree, src/impl/vol_grid.cu:216-295)."""
    import numpy as np

    from cuda_pt_tpu.media.nvdb import load_nvdb_density

    rng = np.random.default_rng(11)
    leaf_vals = rng.uniform(0.1, 1.0, size=(8, 8, 8)).astype(np.float32)
    path = str(tmp_path / "tiles.nvdb")
    _write_synthetic_nvdb(
        path,
        [((0, 0, 0), leaf_vals)],
        (0, 0, 0, 15, 15, 15),
        lower_nodes=[
            (
                (0, 0, 0),
                {(1, 0, 0): 0.25, (0, 1, 1): 0.5},  # two constant 8³ tiles
                [(0, 0, 0)],  # child covering the leaf
            )
        ],
        upper_nodes=[
            (
                (0, 0, 0),
                {(1, 0, 0): 9.0},  # 128³ tile fully outside the bbox → clipped
                [(0, 0, 0)],  # child covering the lower node
            )
        ],
    )
    dense, _, _ = load_nvdb_density(path)
    assert dense.shape == (16, 16, 16)
    np.testing.assert_allclose(dense[:8, :8, :8], leaf_vals)  # leaf wins
    np.testing.assert_allclose(dense[:8, :8, 8:16], 0.25)  # tile (ix=1,0,0)
    np.testing.assert_allclose(dense[8:16, 8:16, :8], 0.5)  # tile (0,1,1)
    np.testing.assert_allclose(dense[8:16, :8, 8:16], 0.0)  # untouched region
    assert not np.any(dense == 9.0)  # out-of-bbox upper tile clipped away


def test_nvdb_blosc_codec_raises(tmp_path):
    import numpy as np

    from cuda_pt_tpu.media.nvdb import load_nvdb_density

    v = np.zeros((8, 8, 8), np.float32)
    path = str(tmp_path / "blosc.nvdb")
    _write_synthetic_nvdb(path, [((0, 0, 0), v)], (0, 0, 0, 7, 7, 7), codec=2)
    with pytest.raises(ValueError, match="codec"):
        load_nvdb_density(path)


def test_blackbody_trend_matches_reference_table():
    """The reference ships a temperature→RGB table (scene/data/
    blackbody.bin, 1024 float3 rows, src/impl/vol_grid.cu:304-326). Its
    values are NOT a pure Planck locus — rows are normalized/clamped (the
    table ends at exactly (1,1,1), and cool rows have B≈G, which Planck
    never produces) — so our analytic Planck spectrum intentionally
    differs in detail. What must agree is the physical trend both share:
    cool = red-dominant, hot = balanced/white, with the red share falling
    and the blue share rising monotonically along the ramp."""
    import os

    path = "/root/reference/scene/data/blackbody.bin"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference data not in checkout")
    tab = np.fromfile(path, np.float32).reshape(-1, 3)
    rows = tab[32:1024:64]
    chroma_t = rows / np.maximum(rows.sum(axis=1, keepdims=True), 1e-9)

    temps = jnp.asarray(np.linspace(1000.0, 10000.0, 16), jnp.float32)
    ana = np.asarray(grid_med.blackbody_rgb(temps))
    chroma_a = ana / np.maximum(ana.sum(axis=1, keepdims=True), 1e-9)

    # endpoints both agree on: red-hot start, whitening end (the table's
    # interior loops through saturated orange with near-zero blue — an
    # artistic ramp, not Planck — so only the endpoints are comparable)
    for chroma in (chroma_t, chroma_a):
        assert chroma[0, 0] > 0.55, chroma[0]
        assert chroma[-1, 0] < 0.45, chroma[-1]
        assert chroma[-1, 2] > chroma[0, 2], chroma[:, 2]
    # our physical version IS monotone along the whole ramp
    assert (np.diff(chroma_a[:, 0]) < 1e-4).all(), chroma_a[:, 0]
    assert (np.diff(chroma_a[:, 2]) > -1e-4).all(), chroma_a[:, 2]
