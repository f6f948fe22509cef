"""XML scene parser tests against the reference scene corpus (read-only)."""

import os

import numpy as np
import pytest

from cuda_pt_tpu.core.config import RendererType
from cuda_pt_tpu.scene import types as T
from cuda_pt_tpu.scene.xml_parser import load_xml

REF = "/root/reference/scene/xml"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_parse_cornell_box():
    ps = load_xml(os.path.join(REF, "cornell-box.xml"), override_res=(32, 32))
    s = ps.scene
    assert s.geom.num_prims > 10
    assert int(s.num_emitters) == 1
    # 6 lambertian walls + conductor + light materials registered
    btypes = np.asarray(s.bsdfs.btype)
    assert (btypes == T.BSDF_GGX_CONDUCTOR).sum() == 1
    assert (btypes == T.BSDF_LAMBERTIAN).sum() >= 5
    assert ps.config.spp == 1024
    assert ps.config.md.max_depth == 5
    assert ps.camera.width == 32
    # emitter 1 bound to the light object with sane CDF
    cdf = np.asarray(s.emitters.prim_cdf[1])
    assert abs(cdf[-1] - 1.0) < 1e-5
    assert int(s.emitters.obj_id[1]) >= 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_parse_point_scene():
    ps = load_xml(os.path.join(REF, "point.xml"), override_res=(16, 16))
    et = np.asarray(ps.scene.emitters.etype)
    assert (et == T.EMITTER_POINT).sum() == 2


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_parse_medium_cbox():
    ps = load_xml(os.path.join(REF, "medium-cbox.xml"), override_res=(16, 16))
    s = ps.scene
    mt = np.asarray(s.media.mtype)
    assert (mt == T.MEDIUM_HOMOGENEOUS).sum() >= 2
    assert ps.config.renderer == RendererType.VOLUME_PT
    # at least one object carries a medium ref
    assert int(np.asarray(s.objects.medium_in).max()) >= 0
    bt = np.asarray(s.bsdfs.btype)
    assert (bt == T.BSDF_FORWARD).sum() >= 1
    assert (bt == T.BSDF_TRANSLUCENT).sum() >= 1


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_parse_bunny_render_tiny():
    """bunny.xml: ~5k-triangle BVH stress — parse + tiny render via BVH.

    (vader.xml's main mesh is not shipped in the reference checkout; the
    parser skips missing OBJs with a warning — verified separately.)"""
    import jax

    from cuda_pt_tpu.models import path_tracer as pt

    ps = load_xml(os.path.join(REF, "bunny.xml"), override_res=(24, 24))
    s = ps.scene
    assert s.geom.num_prims > 1000
    md = ps.config.md.__class__(max_depth=3)
    img = np.asarray(
        jax.jit(lambda sc: pt.render(sc, ps.camera, md, spp=2, seed=0, use_bvh=True))(s)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_parse_vader_skips_missing_meshes():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ps = load_xml(os.path.join(REF, "vader.xml"), override_res=(8, 8))
    assert ps.scene.geom.num_prims > 0  # emitters + floor still load
    assert int(ps.scene.env_emitter) > 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_parse_entire_reference_corpus():
    """Every scene in the reference corpus parses (missing assets skipped)."""
    import glob
    import warnings

    ok = 0
    for xml in sorted(glob.glob(os.path.join(REF, "*.xml"))):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ps = load_xml(xml, override_res=(8, 8))
        assert ps.scene.geom.num_prims >= 1, xml
        assert ps.config.spp > 0, xml
        ok += 1
    assert ok >= 14  # 16 scenes in the corpus


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_render_medium_cbox_vpt():
    """Reference medium-cbox (homogeneous media + forward boundaries) renders
    through the volumetric path tracer."""
    import jax

    from cuda_pt_tpu.models import volume_pt

    ps = load_xml(os.path.join(REF, "medium-cbox.xml"), override_res=(16, 16))
    md = ps.config.md.__class__(max_depth=4, max_volume=3)
    img = np.asarray(
        jax.jit(
            lambda s: volume_pt.render(s, ps.camera, md, spp=2, seed=0, use_bvh=True)
        )(ps.scene)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0
