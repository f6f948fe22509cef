"""Reference-corpus scenes through the FUSED megakernel (interpret mode).

Round 4 widened the envelope (envmap, kd textures, dispersion, spot,
homogeneous media); these smokes pin which reference XMLs are
fused-eligible and that each renders finite + mean-consistent with its
composed estimator at tiny res. Keeps the envelope honest as it grows.
"""

import numpy as np
import pytest

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.ops.pallas import megakernel as mk
from cuda_pt_tpu.scene.xml_parser import load_xml

XML = "/root/reference/scene/xml"


def _fused_vs_composed(name, res=8, spp=8, max_depth=4, rel_tol=0.15,
                       vpt=False):
    ps = load_xml(f"{XML}/{name}.xml", override_res=(res, res))
    md = MaxDepthParams(max_depth=max_depth, max_volume=6)
    renderer = "vpt" if vpt else "pt"
    assert mk.megakernel_ok(ps.scene, md, renderer=renderer), name
    pack = mk.make_pack(ps.scene, vpt=vpt)
    img_k = np.asarray(mk.render_pack(pack, ps.camera, md, spp=spp, seed=3,
                                      interpret=True))
    assert np.isfinite(img_k).all(), name
    if vpt:
        from cuda_pt_tpu.models import volume_pt

        img_x = np.asarray(volume_pt.render(ps.scene, ps.camera, md,
                                            spp=spp, seed=3, use_bvh=True))
    else:
        img_x = np.asarray(pt.render(ps.scene, ps.camera, md, spp=spp,
                                     seed=3, use_bvh=True))
    rel = abs(img_k.mean() - img_x.mean()) / max(img_x.mean(), 1e-6)
    assert rel < rel_tol, (name, img_k.mean(), img_x.mean())
    return pack


def test_fused_corpus_cornell_box():
    _fused_vs_composed("cornell-box", spp=4, rel_tol=0.1)


def test_fused_corpus_bunny():
    pack = _fused_vs_composed("bunny", spp=4, rel_tol=0.1)
    assert pack.tri_only


def test_fused_corpus_point():
    _fused_vs_composed("point", spp=4, rel_tol=0.1)


@pytest.mark.slow
def test_fused_corpus_whiskey():
    pack = _fused_vs_composed("whiskey", res=6, spp=2, rel_tol=0.25)
    # the compact formats engage on the big pack
    assert pack.node_fmt == "bf16" and pack.prim_fmt == "t9"


def test_fused_corpus_diamonds_dispersion():
    ps = load_xml(f"{XML}/diamonds.xml", override_res=(8, 8))
    md = MaxDepthParams(max_depth=4)
    if not mk.megakernel_ok(ps.scene, md):
        pytest.skip("diamonds outside the envelope: "
                    f"{set(int(x) for x in np.asarray(ps.scene.emitters.etype))}")
    pack = mk.make_pack(ps.scene)
    assert pack.has_disp
    img = np.asarray(mk.render_pack(pack, ps.camera, md, spp=4, seed=1,
                                    interpret=True))
    assert np.isfinite(img).all()
