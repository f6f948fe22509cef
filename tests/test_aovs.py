"""First-hit AOV pass (albedo / normal / emission / depth / coverage)."""

import jax
import numpy as np

from cuda_pt_tpu.models import debug_renderers
from cuda_pt_tpu.scene import testscenes


def test_aov_buffers_cornell():
    scene, cam, _ = testscenes.cornell_box(width=32, height=32)
    out = jax.jit(
        lambda s, c: debug_renderers.render_aovs(s, c, spp=2, seed=0)
    )(scene, cam)
    a = np.asarray(out["albedo"])
    n = np.asarray(out["normal"])
    e = np.asarray(out["emission"])
    t = np.asarray(out["depth"])
    cov = np.asarray(out["coverage"])

    # closed box: every sample hits, depth positive, albedo in range
    assert (cov == 1.0).all()
    assert (t > 0.0).all()
    assert (a >= 0.0).all() and (a <= 1.0).all()

    # normals are unit where covered — except silhouette pixels whose
    # samples hit opposing faces and cancel (renormalization zeroes them)
    ln = np.linalg.norm(n, axis=-1)
    unit_or_zero = (np.abs(ln - 1.0) < 1e-4) | (ln < 1e-4)
    assert unit_or_zero.all()
    assert (np.abs(ln - 1.0) < 1e-4).mean() > 0.98

    # left wall red, right wall green (same layout as the beauty pass)
    left = a[16, 1]
    right = a[16, 30]
    assert left[0] > left[1] * 2, left
    assert right[1] > right[0] * 2, right
    # their normals oppose along x
    assert n[16, 1, 0] * n[16, 30, 0] < 0

    # ceiling light emits; floor does not
    assert e.max() > 1.0
    assert e[30, 16].sum() == 0.0


def test_aov_through_renderer_api():
    from cuda_pt_tpu.api import Renderer
    from cuda_pt_tpu.core.config import RenderingConfig
    from cuda_pt_tpu.scene.xml_parser import ParsedScene

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    ps = ParsedScene(scene, cam, RenderingConfig(spp=2, width=16, height=16), None)
    r = Renderer(ps)
    out = r.render_aovs(spp=1)
    assert set(out) == {"albedo", "normal", "emission", "depth", "coverage"}
    assert out["albedo"].shape == (16, 16, 3)
    assert out["depth"].shape == (16, 16)
