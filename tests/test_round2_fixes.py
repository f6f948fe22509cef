"""Regression tests for the round-2 fixes (ADVICE.md + VERDICT.md items):

- multi-area-emitter NEE prim selection (prim_sel indexed by emitter id)
- AREA_SPOT cone gate on BSDF-sampled / directly-visible emitter hits
- envmap zenith rotation
- Radiance .hdr loading, float-image quantization heuristic
- dispersion presets Glass_BaF10 / Glass_SF10, loud unknown-preset errors
"""

import numpy as np
import pytest

from cuda_pt_tpu.core import camera as cam_mod
from cuda_pt_tpu.core import rng as prng
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.emitters import emitters
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import presets, testscenes, types as T
from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
from cuda_pt_tpu.utils import image as im


def _two_light_scene():
    """Two area lights with distinct colors at x=-1 (red) and x=+1 (green)."""
    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.8, 0.8, 0.8)))
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    red = b.add_emitter(EmitterSpec(emission=(1, 0, 0), scaler=20.0))
    green = b.add_emitter(EmitterSpec(emission=(0, 1, 0), scaler=20.0))
    b.add_mesh(testscenes.quad([-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]), white)
    b.add_mesh(
        testscenes.quad([-1.2, 1, -0.2], [-0.8, 1, -0.2], [-0.8, 1, 0.2], [-1.2, 1, 0.2]),
        dark, emitter_id=red,
    )
    b.add_mesh(
        testscenes.quad([0.8, 1, -0.2], [1.2, 1, -0.2], [1.2, 1, 0.2], [0.8, 1, 0.2]),
        dark, emitter_id=green,
    )
    return b.compile()


def test_multi_area_emitter_prim_matches_selected_emitter():
    """NEE must sample a surface point ON the selected emitter: the sampled
    prim's object id must equal obj_id[eid] for every lane (ADVICE round-1
    high finding: prim_sel was indexed by lane, pairing emitter 1's Le with
    emitter 2's geometry)."""
    scene = _two_light_scene()
    B = 256
    p = np.zeros((B, 3), np.float32)
    n = np.tile(np.array([0, 1, 0], np.float32), (B, 1))
    rng = prng.seed(np.uint32(7), np.arange(B, dtype=np.int32))
    out, _ = emitters.sample_emitter(scene, p, n, rng)
    eid = np.asarray(out["eid"])
    prim = np.asarray(out["prim"])
    obj_of_prim = np.asarray(scene.geom.obj_idx)[prim]
    obj_of_eid = np.asarray(scene.emitters.obj_id)[eid]
    assert (obj_of_prim == obj_of_eid).all()
    # both emitters actually get selected
    assert len(np.unique(eid)) == 2

    # sampled position x-sign must match the selected emitter's side
    g = scene.geom
    b1 = b2 = np.full(B, 1.0 / 3.0, np.float32)
    pos = (
        np.asarray(g.p0)[prim]
        + b1[:, None] * np.asarray(g.e1)[prim]
        + b2[:, None] * np.asarray(g.e2)[prim]
    )
    red_first = np.asarray(scene.emitters.emission)[eid][:, 0] > 0.5
    assert (pos[red_first, 0] < 0).all()
    assert (pos[~red_first, 0] > 0).all()


def test_two_light_colors_reach_correct_halves():
    """Image-level check: floor under the red light is redder, floor under
    the green light greener."""
    scene = _two_light_scene()
    cam = cam_mod.make_camera((0, 2.5, -4), (0, 0, 0), fov=45, width=32, height=32)
    md = MaxDepthParams(max_depth=2)
    img = np.asarray(pt.render(scene, cam, md, spp=64, seed=3, use_bvh=False))
    left = img[:, :12]   # -x half: red light overhead
    right = img[:, 20:]  # +x half: green light overhead
    assert left[..., 0].mean() > left[..., 1].mean() * 1.3
    assert right[..., 1].mean() > right[..., 0].mean() * 1.3


def _spot_scene(cam_pos):
    b = SceneBuilder()
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    # 30° half-angle spot at y=1 emitting downward (-y normal order)
    spot = b.add_emitter(EmitterSpec(
        etype=T.EMITTER_AREA_SPOT, emission=(1, 1, 1), scaler=10.0,
        extra=(float(np.cos(np.deg2rad(30.0))), 0, 0, 0)))
    b.add_mesh(
        testscenes.quad([-0.5, 1, -0.5], [0.5, 1, -0.5], [0.5, 1, 0.5], [-0.5, 1, 0.5]),
        dark, emitter_id=spot,
    )
    cam = cam_mod.make_camera(cam_pos, (0, 1, 0), fov=30, width=16, height=16)
    return b.compile(), cam


def test_spot_direct_hit_gated_outside_cone():
    """A camera looking at the spot from far outside the cone must see ~no
    radiance from BSDF-sampled / direct hits (reference AreaSpotSource::
    eval_le zeroes outside the cone; round-1 applied the gate only to NEE)."""
    md = MaxDepthParams(max_depth=2)
    # grazing view: ~84° off the emitter normal, outside the 30° cone
    scene_out, cam_out = _spot_scene((4.0, 0.6, 0.0))
    img_out = np.asarray(pt.render(scene_out, cam_out, md, spp=16, seed=1, use_bvh=False))
    # head-on view from below: inside the cone
    scene_in, cam_in = _spot_scene((0.3, -2.0, 0.1))
    img_in = np.asarray(pt.render(scene_in, cam_in, md, spp=16, seed=1, use_bvh=False))
    assert img_in.max() > 1.0, "spot should be visible inside its cone"
    assert img_out.max() < 1e-4, f"spot visible outside cone: {img_out.max()}"


def _env_scene(zenith):
    b = SceneBuilder()
    texd = np.full((8, 16, 3), 0.05, np.float32)
    texd[1, 3] = 25.0  # bright patch near the pole
    tex = b.add_texture(texd)
    b.add_emitter(EmitterSpec(
        etype=T.EMITTER_ENVMAP, emission=(1, 1, 1), scaler=1.0,
        extra=(1.0, 0.0, float(zenith), 0.0), tex_id=tex))
    white = b.add_bsdf(BSDFSpec(k_d=(0.8, 0.8, 0.8)))
    b.add_sphere((0, -50, 0), 0.1, white)  # keep the scene non-empty
    return b.compile()


def test_env_zenith_rotation_consistency():
    """env_radiance with a zenith tilt z must equal the untilted map queried
    at the rotated direction (reference quaternion pitch, emitter.cu:26-73)."""
    z = 0.7
    s0 = _env_scene(0.0)
    sz = _env_scene(z)
    rs = np.random.RandomState(0)
    d = rs.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r0 = np.asarray(emitters.env_radiance(s0, np.asarray(emitters._rot_x(d, z))))
    rz = np.asarray(emitters.env_radiance(sz, d))
    np.testing.assert_allclose(rz, r0, rtol=1e-5, atol=1e-6)
    # the tilt actually moves energy (not a no-op)
    runtilted = np.asarray(emitters.env_radiance(s0, d))
    assert np.abs(rz - runtilted).max() > 1.0


def test_env_zenith_importance_sampling_unbiased():
    """Importance-sampled NEE under a zenith tilt stays consistent: pdf and
    radiance refer to the same (rotated) direction."""
    import jax.numpy as jnp

    sz = _env_scene(0.9)
    B = 512
    p = np.zeros((B, 3), np.float32)
    n = np.tile(np.array([0, 1, 0], np.float32), (B, 1))
    rng = prng.seed(np.uint32(11), np.arange(B, dtype=np.int32))
    out, _ = emitters.sample_emitter(sz, p, n, rng)
    le = np.asarray(out["le"])
    pdf = np.asarray(out["pdf"])
    d = np.asarray(out["dir"])
    assert np.isfinite(le).all() and (pdf > 0).all()
    # the sampled direction's radiance must match env_radiance exactly
    le_direct = np.asarray(emitters.env_radiance(sz, jnp.asarray(d)))
    np.testing.assert_allclose(le, le_direct, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# image I/O
# ---------------------------------------------------------------------------

def _encode_rgbe(rgb: np.ndarray) -> np.ndarray:
    """float (H, W, 3) → (H, W, 4) uint8 RGBE (stb convention)."""
    f = rgb.max(axis=-1)
    m, E = np.frexp(f)
    scale = np.where(f > 1e-32, np.exp2(136.0 - (E + 128.0)), 0.0)
    rgbe = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None] + 0.5, 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(f > 1e-32, E + 128, 0).astype(np.uint8)
    return rgbe


def test_hdr_flat_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    img = (rs.rand(2, 4, 3).astype(np.float32) * 100.0 + 0.5)
    path = tmp_path / "t.hdr"
    rgbe = _encode_rgbe(img)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {img.shape[0]} +X {img.shape[1]}\n".encode())
        f.write(rgbe.tobytes())
    out = im.load_image(str(path))
    assert out.shape == img.shape
    # 8-bit shared-exponent mantissa ⇒ quantization ~max_channel/256 per pixel
    atol = img.max(axis=-1, keepdims=True) / 256.0
    assert (np.abs(out - img) <= atol + 1e-6).all()
    assert out.max() > 50.0  # genuinely HDR, not normalized


def test_hdr_rle_roundtrip(tmp_path):
    H, W = 3, 16
    img = np.zeros((H, W, 3), np.float32)
    img[:, :8] = 4.0   # constant run
    img[:, 8:] = np.linspace(0.1, 9.0, 8)[None, :, None]  # literals
    rgbe = _encode_rgbe(img)
    path = tmp_path / "rle.hdr"
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        for y in range(H):
            f.write(bytes([2, 2, W >> 8, W & 0xFF]))
            for c in range(4):
                col = rgbe[y, :, c]
                # first 8: one run; last 8: literal dump
                f.write(bytes([128 + 8, int(col[0])]))
                f.write(bytes([8]) + col[8:].tobytes())
    out = im.load_image(str(path))
    np.testing.assert_allclose(out, img, rtol=0.01, atol=1e-3)


def test_float_tiff_not_quantized(tmp_path):
    """A genuine float image with values > 2 must pass through unscaled
    (round-1 bug: post-cast dtype check always divided by 255)."""
    from PIL import Image

    arr = np.array([[5.0, 100.0], [0.25, 7.5]], np.float32)
    path = tmp_path / "f.tiff"
    Image.fromarray(arr, mode="F").save(path)
    out = im.load_image(str(path))
    np.testing.assert_allclose(out[..., 0], arr, rtol=1e-6)


def test_uint8_png_still_normalized(tmp_path):
    arr = np.full((4, 4, 3), 128, np.uint8)
    path = tmp_path / "u.png"
    im.save_png(str(path), arr)
    out = im.load_image(str(path), to_linear=False)
    np.testing.assert_allclose(out, 128.0 / 255.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# presets
# ---------------------------------------------------------------------------

def test_dispersion_presets_complete():
    """All 8 reference dielectrics (src/core/preset_params.cuh:74-83),
    under both spellings."""
    for name in ["Diamond", "DiamondHigh", "Silica", "Glass_BK7",
                 "Glass_BaF10", "Glass_SF10", "Sapphire", "Water"]:
        assert name in presets.DISPERSION, name
    a, bw = presets.DISPERSION["Glass_BaF10"]
    assert abs(a - 1.670) < 1e-3 and abs(bw - 0.00743) < 1e-4
    a, bw = presets.DISPERSION["Glass_SF10"]
    assert abs(a - 1.728) < 1e-3 and abs(bw - 0.01342) < 1e-4


def test_unknown_preset_raises():
    from cuda_pt_tpu.scene import xml_parser

    xml = """<scene version="1.2">
      <renderer type="pt"><integer name="max_depth" value="4"/></renderer>
      <brdf type="dispersion" id="bad"><string name="type" value="Unobtanium"/></brdf>
      <emitter type="area" id="l"><rgb name="emission" value="1,1,1"/></emitter>
      <sensor type="perspective"><film><integer name="width" value="8"/>
        <integer name="height" value="8"/></film></sensor>
    </scene>"""
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        with pytest.raises(ValueError, match="Unobtanium"):
            xml_parser.load_xml(p)


# ---------------------------------------------------------------------------
# distributed spp honesty
# ---------------------------------------------------------------------------

def test_distributed_rejects_non_divisible_spp():
    import jax

    from cuda_pt_tpu.parallel import distributed as dist

    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    md = MaxDepthParams(max_depth=2)
    mesh = dist.make_mesh(jax.devices()[:4], sp=2)
    with pytest.raises(AssertionError):
        dist.render_distributed(scene, cam, md, spp=3, mesh=mesh)


def test_inverse_render_script_smoke(tmp_path):
    """scripts/inverse_render.py (worked differentiable-rendering example)
    runs end-to-end and recovers the dimmed emitter."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "inverse_render.py"),
         "--param", "emitter", "--steps", "25", "--res", "16",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=420, cwd=repo,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["recovered"] is True
    assert (tmp_path / "final.png").exists()
