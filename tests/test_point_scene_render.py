"""Point-emitter-only scene end-to-end (degenerate area CDFs, delta NEE)."""

import os

import numpy as np
import pytest

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene.xml_parser import load_xml

REF = "/root/reference/scene/xml"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference scenes not mounted")
def test_render_point_xml():
    ps = load_xml(os.path.join(REF, "point.xml"), override_res=(24, 24))
    md = MaxDepthParams(max_depth=3)
    img = np.asarray(
        pt.render(ps.scene, ps.camera, md, spp=8, seed=0, use_bvh=True)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.001  # point lights illuminate via delta NEE
    # no fireflies from delta lights (pdf handling)
    assert img.max() < 1e3
