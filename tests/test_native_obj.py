"""Native C++ OBJ parser (scene/cpp/obj_loader.cpp via scene/native_obj.py).

Parity oracle: the pure-Python parser (scene/obj_loader.py). The reference
loads meshes natively too (tinyobjloader, src/impl/scene.cu:548-660)."""

import glob
import os

import numpy as np
import pytest

from cuda_pt_tpu.scene import native_obj
from cuda_pt_tpu.scene.obj_loader import load_obj

MESHES = sorted(glob.glob("/root/reference/scene/meshes/*/*.obj"))

pytestmark = pytest.mark.skipif(
    not native_obj.available(), reason="no g++ / native obj lib"
)


@pytest.mark.parametrize(
    "path", MESHES[:6] if MESHES else [],
    ids=[os.path.basename(p) for p in MESHES[:6]],
)
def test_native_matches_python(path):
    a = load_obj(path, native=True)
    b = load_obj(path, native=False)
    assert a["p"].shape == b["p"].shape
    for k in ("p", "n", "uv"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-5)


def test_corner_cases(tmp_path):
    # polygons (fan), negative indices, missing normals (face-normal
    # fallback), missing UVs, v//vn corners, trailing comments
    obj = tmp_path / "t.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "vt 0.5 0.5\n"
        "f 1 2 3 4\n"          # quad -> 2 tris, no vn -> face normal
        "f -4//1 -3//1 -2//1\n"  # negative idx + v//vn
        "f 1/1 2/1 3/1 # tail comment\n"
    )
    a = load_obj(str(obj), native=True)
    b = load_obj(str(obj), native=False)
    assert a["p"].shape == (4, 3, 3)
    for k in ("p", "n", "uv"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)
    # face-normal fallback for the quad (+z)
    np.testing.assert_allclose(a["n"][0], np.tile([0, 0, 1.0], (3, 1)), atol=1e-6)
    # explicit vn row passes through
    np.testing.assert_allclose(a["n"][2], np.tile([0, 0, 1.0], (3, 1)), atol=1e-6)
    # uv row from f v/t corners
    np.testing.assert_allclose(a["uv"][3], 0.5, atol=1e-6)


def test_empty_and_missing(tmp_path):
    empty = tmp_path / "empty.obj"
    empty.write_text("# nothing\n")
    out = native_obj.load_obj_native(str(empty))
    assert out is not None and out["p"].shape == (0, 3, 3)
    assert native_obj.load_obj_native(str(tmp_path / "nope.obj")) is None
