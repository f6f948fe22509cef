"""Procedural test scenes (the fixtures the reference never had — SURVEY.md §4).

These mirror the reference scene corpus in miniature: a cornell box
(scene/xml/cornell-box.xml analogue), a white-furnace environment sphere, and
small single-material probes used by BSDF chi-square / furnace tests.
"""

from __future__ import annotations

import numpy as np

from ..core import camera as cam_mod
from . import types as T
from .builder import BSDFSpec, EmitterSpec, SceneBuilder


def quad(p00, p10, p11, p01):
    """Two triangles for a quad given CCW corners."""
    p00, p10, p11, p01 = (np.asarray(p, np.float32) for p in (p00, p10, p11, p01))
    return np.stack(
        [np.stack([p00, p10, p11]), np.stack([p00, p11, p01])], axis=0
    )


def cornell_box(width=64, height=64, light_scale=12.0, tall_box_bsdf=None):
    """Unit cornell box with area light; returns (scene, camera, builder)."""
    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.73, 0.73, 0.73)))
    red = b.add_bsdf(BSDFSpec(k_d=(0.65, 0.05, 0.05)))
    green = b.add_bsdf(BSDFSpec(k_d=(0.12, 0.45, 0.15)))
    light_m = b.add_bsdf(BSDFSpec(k_d=(0.0, 0.0, 0.0)))
    em = b.add_emitter(
        EmitterSpec(etype=T.EMITTER_AREA, emission=(1.0, 1.0, 1.0), scaler=light_scale)
    )

    # box interior (normals point inward via winding; we shade two-sided)
    b.add_mesh(quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]), white)  # floor
    b.add_mesh(quad([0, 1, 0], [0, 1, 1], [1, 1, 1], [1, 1, 0]), white)  # ceiling
    b.add_mesh(quad([0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]), white)  # back
    b.add_mesh(quad([0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0]), red)  # left
    b.add_mesh(quad([1, 0, 0], [1, 1, 0], [1, 1, 1], [1, 0, 1]), green)  # right
    # light panel slightly below ceiling (wound so the normal faces DOWN
    # into the room — area emitters are one-sided)
    b.add_mesh(
        quad(
            [0.35, 0.998, 0.35],
            [0.65, 0.998, 0.35],
            [0.65, 0.998, 0.65],
            [0.35, 0.998, 0.65],
        ),
        light_m,
        emitter_id=em,
    )
    # two interior boxes (as simple scaled cubes)
    if tall_box_bsdf is None:
        tall_box_bsdf = white
    elif isinstance(tall_box_bsdf, BSDFSpec):
        tall_box_bsdf = b.add_bsdf(tall_box_bsdf)

    def box_mesh(lo, hi):
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        c = lambda x, y, z: np.array(
            [lo[0] + x * (hi[0] - lo[0]), lo[1] + y * (hi[1] - lo[1]), lo[2] + z * (hi[2] - lo[2])],
            np.float32,
        )
        quads = [
            quad(c(0, 0, 0), c(1, 0, 0), c(1, 1, 0), c(0, 1, 0)),  # front
            quad(c(1, 0, 1), c(0, 0, 1), c(0, 1, 1), c(1, 1, 1)),  # back
            quad(c(0, 0, 1), c(0, 0, 0), c(0, 1, 0), c(0, 1, 1)),  # left
            quad(c(1, 0, 0), c(1, 0, 1), c(1, 1, 1), c(1, 1, 0)),  # right
            quad(c(0, 1, 0), c(1, 1, 0), c(1, 1, 1), c(0, 1, 1)),  # top
        ]
        return np.concatenate(quads, axis=0)

    b.add_mesh(box_mesh([0.53, 0.0, 0.45], [0.83, 0.6, 0.75]), tall_box_bsdf)
    b.add_mesh(box_mesh([0.15, 0.0, 0.15], [0.45, 0.3, 0.45]), white)

    scene = b.compile()
    cam = cam_mod.make_camera(
        origin=(0.5, 0.5, -1.35),
        target=(0.5, 0.5, 0.5),
        fov=40.0,
        width=width,
        height=height,
    )
    return scene, cam, b


def furnace(width=32, height=32, albedo=1.0, btype=T.BSDF_LAMBERTIAN, **bsdf_kw):
    """White furnace: unit-radiance envmap + single sphere of given BSDF.

    Energy conservation ⇒ every pixel must converge to 1.0 exactly for any
    energy-preserving BSDF.
    """
    b = SceneBuilder()
    kw = dict(k_d=(albedo,) * 3, k_s=(1.0, 1.0, 1.0))
    kw.update(bsdf_kw)
    mat = b.add_bsdf(BSDFSpec(btype=btype, **kw))
    b.add_emitter(
        EmitterSpec(
            etype=T.EMITTER_ENVMAP,
            emission=(1.0, 1.0, 1.0),
            scaler=1.0,
            extra=(1.0, 0.0, 0.0, 0.0),
        )
    )
    b.add_sphere((0.0, 0.0, 0.0), 1.0, mat)
    scene = b.compile()
    cam = cam_mod.make_camera(
        origin=(0.0, 0.0, -3.5),
        target=(0.0, 0.0, 0.0),
        fov=35.0,
        width=width,
        height=height,
    )
    return scene, cam, b
