"""Viewer end-to-end test: serve, poll, hot-reload, observe accumulation."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from cuda_pt_tpu.api import Renderer
from cuda_pt_tpu.core.config import RenderingConfig
from cuda_pt_tpu.scene import testscenes
from cuda_pt_tpu.scene.xml_parser import ParsedScene
from cuda_pt_tpu.viewer.server import ThreadingHTTPServer, ViewerState, make_handler


@pytest.fixture(scope="module")
def viewer():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    ps = ParsedScene(scene, cam, RenderingConfig(width=16, height=16), None)
    renderer = Renderer(ps)
    state = ViewerState(renderer)
    state.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield state, port
    state.stop.set()
    httpd.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def test_viewer_accumulates_and_serves(viewer):
    state, port = viewer
    assert b"<canvas" in _get(port, "/")
    deadline = time.time() + 120
    while time.time() < deadline and state.renderer.counter() < 2:
        time.sleep(0.5)
    info = json.loads(_get(port, "/info"))
    assert info["spp"] >= 2
    png = _get(port, "/frame.png")
    assert png[:4] == b"\x89PNG"
    scene = json.loads(_get(port, "/scene"))
    assert len(scene["bsdfs"]) >= 4


def test_viewer_hot_reload_resets_film(viewer):
    state, port = viewer
    # let some passes accumulate first
    deadline = time.time() + 120
    while time.time() < deadline and state.renderer.counter() < 3:
        time.sleep(0.2)
    c0 = state.renderer.counter()
    assert c0 >= 3
    g0 = state.generation
    _post(port, "/update", {"kind": "emitter", "id": 1, "field": "scaler", "value": 25.0})
    assert float(state.renderer.scene.emitters.scaler[1]) == 25.0
    # the render loop bumps the monotonic generation counter exactly when it
    # consumes the dirty flag and resets the film — no counter-value race
    deadline = time.time() + 120
    while time.time() < deadline and state.generation == g0:
        time.sleep(0.1)
    assert state.generation > g0, (g0, state.generation)
    # and accumulation restarts
    deadline = time.time() + 120
    while time.time() < deadline and state.renderer.counter() < 1:
        time.sleep(0.1)
    assert state.renderer.counter() >= 1


def test_viewer_camera_move(viewer):
    state, port = viewer
    t_before = np.asarray(state.renderer.camera.t).copy()
    _post(port, "/update", {"kind": "camera_move", "delta": [0.0, 0.0, 0.3]})
    time.sleep(0.5)
    t_after = np.asarray(state.renderer.camera.t)
    assert not np.allclose(t_before, t_after)


def test_viewer_denoise_toggle(viewer):
    state, port = viewer
    _post(port, "/update", {"kind": "denoise", "value": True})
    assert state.denoise_on
    # the loop keeps serving valid (denoised) frames
    deadline = time.time() + 120
    png = b""
    start_gen = state.renderer.counter()
    while time.time() < deadline and state.renderer.counter() < start_gen + 2:
        time.sleep(0.5)
    png = _get(port, "/frame.png")
    assert png[:4] == b"\x89PNG"
    _post(port, "/update", {"kind": "denoise", "value": False})
    assert not state.denoise_on


def test_viewer_sampler_toggle(viewer):
    """Switching the sampler live rebuilds the pass fn and restarts
    accumulation (generation bump)."""
    state, port = viewer
    gen0 = state.generation
    _post(port, "/update", {"kind": "sampler", "value": "sobol"})
    deadline = time.time() + 120
    while time.time() < deadline and state.generation == gen0:
        time.sleep(0.2)
    assert state.generation > gen0
    assert state.renderer.sampler == "sobol"
    # frames keep coming after the switch
    while time.time() < deadline and state.renderer.counter() < 1:
        time.sleep(0.3)
    assert state.renderer.counter() >= 1
    img = np.asarray(state.renderer.film.mean)
    assert np.isfinite(img).all()
    _post(port, "/update", {"kind": "sampler", "value": "pcg"})


def test_viewer_depth_caps_and_tof(viewer):
    """Round-4 parity with the reference GUI's per-renderer parameter
    depth (imgui_utils.cu:604-760): depth caps, ToF window, colormap."""
    state, port = viewer
    _post(port, "/update", {"kind": "max_depth", "field": "max_depth",
                            "value": 3})
    _post(port, "/update", {"kind": "tof", "min_time": 0.5,
                            "max_time": 6.0})
    _post(port, "/update", {"kind": "colormap", "value": "magma"})
    deadline = time.time() + 30
    while time.time() < deadline:
        info = json.loads(_get(port, "/scene"))
        md = info.get("md", {})
        if (md.get("max_depth") == 3.0 and md.get("max_time") == 6.0
                and info.get("colormap") == "magma"):
            break
        time.sleep(0.5)
    else:
        raise AssertionError(f"viewer md not applied: {info}")
    # the renderer still produces frames after the re-jit
    gen0 = state.generation
    deadline = time.time() + 60
    while state.generation == gen0 and time.time() < deadline:
        time.sleep(0.5)
    png = _get(port, "/frame.png")
    assert png[:4] == b"\x89PNG"
    # restore for other tests
    _post(port, "/update", {"kind": "tof", "min_time": 0.0,
                            "max_time": 0.0})
    _post(port, "/update", {"kind": "max_depth", "field": "max_depth",
                            "value": 16})
