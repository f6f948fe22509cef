"""Traversal-backend autotuning (accel/autotune.py).

On the CPU test backend the Pallas candidate runs through the interpreter
(or is disqualified at lowering), so "xla" must win — what matters here is
that the mechanism measures, caches, and pins a valid backend, and that a
pinned ``Scene.traversal`` actually changes the traced computation without
changing its results."""

import jax.numpy as jnp
import numpy as np

from cuda_pt_tpu.accel import autotune
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene import testscenes


def test_autotune_picks_valid_impl_and_caches():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    autotune._CACHE.clear()
    res = autotune.autotune_traversal(scene, cam, n_rays=256, reps=1)
    # under a loaded machine any measured candidate may win — what's pinned
    # must simply be one of the valid backends
    assert res["impl"] in ("xla", "wide", "wide_bf16", "pallas", "mxu")
    assert res["cached"] is False
    assert np.isfinite(res["timings_ms"]["xla"])
    res2 = autotune.autotune_traversal(scene, cam, n_rays=256, reps=1)
    assert res2["cached"] is True
    assert res2["impl"] == res["impl"]


def test_pinned_traversal_matches_across_backends():
    """scene.traversal="pallas" must produce the identical image to "xla"
    (interpret mode on CPU), proving the static field reaches dispatch."""
    old = tk.INTERPRET
    tk.INTERPRET = True
    try:
        scene, cam, _ = testscenes.cornell_box(width=24, height=24)
        md = MaxDepthParams(max_depth=3)
        img_x = pt.render(scene.replace(traversal="xla"), cam, md,
                          spp=2, seed=5, use_bvh=True)
        img_p = pt.render(scene.replace(traversal="pallas"), cam, md,
                          spp=2, seed=5, use_bvh=True)
        np.testing.assert_allclose(np.asarray(img_x), np.asarray(img_p),
                                   rtol=2e-4, atol=2e-5)
        assert float(jnp.mean(img_x)) > 0.01
    finally:
        tk.INTERPRET = old


def test_probe_rays_without_camera():
    scene, _, _ = testscenes.cornell_box(width=8, height=8)
    o, d = autotune._probe_rays(scene, cam=None, n_rays=256)
    assert o.shape == (512, 3) and d.shape == (512, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4
    )
