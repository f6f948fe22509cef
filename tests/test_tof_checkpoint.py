"""Time-of-flight gating + film checkpoint/resume tests."""

import numpy as np

from cuda_pt_tpu.core import film as film_mod
from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes


def test_tof_gating_partitions_energy():
    """Two adjacent ToF windows sum to (approximately) the ungated image."""
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    kw = dict(max_depth=4)
    md_all = MaxDepthParams(**kw)
    # camera-to-wall distances are ~1.3-3; split at 3.4 path-length units
    md_a = MaxDepthParams(**kw, min_time=0.0, max_time=3.4)
    md_b = MaxDepthParams(**kw, min_time=3.4, max_time=1e6)
    img = np.asarray(pt.render(scene, cam, md_all, spp=24, seed=7, use_bvh=False))
    a = np.asarray(pt.render(scene, cam, md_a, spp=24, seed=7, use_bvh=False))
    b = np.asarray(pt.render(scene, cam, md_b, spp=24, seed=7, use_bvh=False))
    assert a.mean() > 0.0 and b.mean() > 0.0
    assert a.mean() < img.mean()  # gating removes energy
    np.testing.assert_allclose(a + b, img, atol=1e-3)  # windows partition


def test_film_checkpoint_roundtrip(tmp_path):
    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    md = MaxDepthParams(max_depth=3)
    f = film_mod.make_film(8, 8)
    for i in range(3):
        f = film_mod.accumulate(
            f, pt.render_sample(scene, cam, md, seed=0, sample_idx=i, use_bvh=False)
        )
    path = str(tmp_path / "ckpt.npz")
    film_mod.save_checkpoint(f, path)
    g = film_mod.load_checkpoint(path)
    assert int(g.count) == 3
    np.testing.assert_allclose(np.asarray(g.mean), np.asarray(f.mean))
    np.testing.assert_allclose(np.asarray(g.m2), np.asarray(f.m2))
    # resume: two more passes from the checkpoint == five straight passes
    for i in range(3, 5):
        g = film_mod.accumulate(
            g, pt.render_sample(scene, cam, md, seed=0, sample_idx=i, use_bvh=False)
        )
    h = film_mod.make_film(8, 8)
    for i in range(5):
        h = film_mod.accumulate(
            h, pt.render_sample(scene, cam, md, seed=0, sample_idx=i, use_bvh=False)
        )
    np.testing.assert_allclose(np.asarray(g.mean), np.asarray(h.mean), atol=1e-6)


def test_renderer_api_checkpoint(tmp_path):
    from cuda_pt_tpu.api import Renderer
    from cuda_pt_tpu.scene.xml_parser import ParsedScene
    from cuda_pt_tpu.core.config import RenderingConfig

    scene, cam, _ = testscenes.cornell_box(width=8, height=8)
    ps = ParsedScene(scene, cam, RenderingConfig(spp=4, width=8, height=8), None)
    r = Renderer(ps)
    r.render(spp=2)
    p = str(tmp_path / "film.npz")
    r.save_checkpoint(p)
    r2 = Renderer(ps)
    r2.load_checkpoint(p)
    assert r2.counter() == 2
    np.testing.assert_allclose(np.asarray(r2.film.mean), np.asarray(r.film.mean))
