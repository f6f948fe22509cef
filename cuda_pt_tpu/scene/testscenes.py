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


def _torus_mesh(center, R, r, ns, nt, scale_y=1.0):
    """UV-mapped torus: (2*ns*nt, 3, 3) tris + matching normals + uvs."""
    c = np.asarray(center, np.float32)
    u = np.linspace(0.0, 2 * np.pi, ns, endpoint=False)
    v = np.linspace(0.0, 2 * np.pi, nt, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")  # (ns, nt)

    def P(uu, vv):
        x = (R + r * np.cos(vv)) * np.cos(uu)
        z = (R + r * np.cos(vv)) * np.sin(uu)
        y = r * np.sin(vv) * scale_y
        return np.stack([x, y, z], axis=-1).astype(np.float32) + c

    def N(uu, vv):
        nx = np.cos(vv) * np.cos(uu)
        nz = np.cos(vv) * np.sin(uu)
        ny = np.sin(vv) / max(scale_y, 1e-6)
        n = np.stack([nx, ny, nz], axis=-1)
        return (n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32)

    iu1 = (np.arange(ns) + 1) % ns
    iv1 = (np.arange(nt) + 1) % nt
    p00, n00 = P(uu, vv), N(uu, vv)
    p10, n10 = P(uu[iu1], vv[iu1]), N(uu[iu1], vv[iu1])
    p01, n01 = P(uu[:, iv1], vv[:, iv1]), N(uu[:, iv1], vv[:, iv1])
    p11, n11 = P(uu[iu1][:, iv1], vv[iu1][:, iv1]), N(uu[iu1][:, iv1], vv[iu1][:, iv1])
    t00 = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], axis=-1).astype(np.float32)
    t10 = np.stack([(uu[iu1]) / (2 * np.pi), vv[iu1] / (2 * np.pi)], -1).astype(np.float32)
    t01 = np.stack([uu[:, iv1] / (2 * np.pi), vv[:, iv1] / (2 * np.pi)], -1).astype(np.float32)
    t11 = np.stack([uu[iu1][:, iv1] / (2 * np.pi), vv[iu1][:, iv1] / (2 * np.pi)], -1).astype(np.float32)

    def flat(*arrs):
        return [a.reshape(-1, 3) if a.shape[-1] == 3 else a.reshape(-1, 2) for a in arrs]

    p00, p10, p01, p11, n00, n10, n01, n11 = flat(p00, p10, p01, p11, n00, n10, n01, n11)
    t00, t10, t01, t11 = flat(t00, t10, t01, t11)
    tri_p = np.concatenate([
        np.stack([p00, p10, p11], axis=1), np.stack([p00, p11, p01], axis=1)])
    tri_n = np.concatenate([
        np.stack([n00, n10, n11], axis=1), np.stack([n00, n11, n01], axis=1)])
    tri_uv = np.concatenate([
        np.stack([t00, t10, t11], axis=1), np.stack([t00, t11, t01], axis=1)])
    return tri_p, tri_n, tri_uv


def _checker_texture(n=256, tiles=12, c0=(0.85, 0.82, 0.75), c1=(0.22, 0.2, 0.25)):
    ij = np.arange(n)
    cell = ((ij[:, None] * tiles // n) + (ij[None, :] * tiles // n)) % 2
    img = np.where(cell[..., None] == 0, np.asarray(c0, np.float32),
                   np.asarray(c1, np.float32))
    return img.astype(np.float32)


def _noise_texture(n=256, seed=7, lo=0.25, hi=0.95):
    rng = np.random.default_rng(seed)
    img = rng.random((n // 8, n // 8, 3)).astype(np.float32)
    for _ in range(3):  # cheap smooth upsample (marble-ish blotches)
        img = np.repeat(np.repeat(img, 2, 0), 2, 1)
        img = 0.25 * (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
                      + np.roll(img, 1, (0, 1)))
    return (lo + (hi - lo) * img).astype(np.float32)


def _sky_hdr(h=128, w=256, sun_dir=(0.35, 0.65, 0.4), sun_lum=80.0):
    """Lat-long HDR sky: horizon-to-zenith gradient + a bright sun disc —
    exercises HDR texel range + envmap importance sampling at bench scale."""
    th = (np.arange(h) + 0.5) / h * np.pi  # zenith angle
    ph = (np.arange(w) + 0.5) / w * 2 * np.pi - np.pi
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt), np.sin(tt) * np.sin(pp)], -1)
    s = np.asarray(sun_dir, np.float32)
    s = s / np.linalg.norm(s)
    cos_sun = np.clip((d * s).sum(-1), -1, 1)
    sky_t = np.clip(np.cos(tt), 0, 1)[..., None]
    img = (1.0 - sky_t) * np.array([0.35, 0.32, 0.3]) + sky_t * np.array([0.25, 0.45, 0.9])
    img = img + sun_lum * np.exp((cos_sun[..., None] - 1.0) * 4000.0)
    return img.astype(np.float32)


def kitchen_stress(width=128, height=128, grid=7, ns=36, nt=28,
                   forest_chunk=None, node_fmt="f32", bvh_cfg=None):
    """Kitchen-class synthesized stress scene (VERDICT r2 item 6: the
    reference's kitchen.xml — textures + envmap + WFPT config,
    /root/reference/scene/xml/kitchen.xml — has its meshes missing from the
    checkout, so this procedural equivalent carries the bench slot).

    Contents: ~grid²·2·ns·nt tessellated torus prims (default ~98k) cycling
    through 5 BSDF families (textured lambertian, GGX conductor, plastic,
    smooth dielectric, dispersion), a checker-textured floor + noise-textured
    back wall, an HDR gradient-sky envmap with a hot sun disc (importance
    tables exercised), plus one area panel light. Returns (scene, camera,
    builder)."""
    b = SceneBuilder()
    checker = b.add_texture(_checker_texture())
    marble = b.add_texture(_noise_texture())
    sky = b.add_texture(_sky_hdr())

    floor_m = b.add_bsdf(BSDFSpec(k_d=(1.0, 1.0, 1.0),
                                  tex_ids=(checker, -1, -1, -1, -1)))
    wall_m = b.add_bsdf(BSDFSpec(k_d=(1.0, 1.0, 1.0),
                                 tex_ids=(marble, -1, -1, -1, -1)))
    mats = [
        b.add_bsdf(BSDFSpec(k_d=(0.8, 0.55, 0.3),
                            tex_ids=(checker, -1, -1, -1, -1))),
        b.add_bsdf(BSDFSpec(btype=T.BSDF_GGX_CONDUCTOR,
                            eta=(0.143, 0.375, 1.444), k=(3.983, 2.386, 1.603),
                            roughness_x=0.15, roughness_y=0.15)),  # gold-ish
        b.add_bsdf(BSDFSpec(btype=T.BSDF_PLASTIC, k_d=(0.1, 0.3, 0.65),
                            k_s=(1.0, 1.0, 1.0), ior=1.5, thickness=0.2)),
        b.add_bsdf(BSDFSpec(btype=T.BSDF_TRANSLUCENT, k_s=(0.98, 0.98, 0.98),
                            ior=1.5)),
        b.add_bsdf(BSDFSpec(btype=T.BSDF_DISPERSION, k_s=(0.99, 0.99, 0.99),
                            cauchy_a=1.5046, cauchy_b=0.0042)),
    ]

    b.add_emitter(EmitterSpec(etype=T.EMITTER_ENVMAP, emission=(1.0, 1.0, 1.0),
                              scaler=1.0, tex_id=sky, extra=(1.0, 0.0, 0.0, 0.0)))
    panel = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                      emission=(1.0, 0.95, 0.85), scaler=40.0))

    ext = grid * 1.1
    fl_p = quad([-ext, 0, -ext], [ext, 0, -ext], [ext, 0, ext], [-ext, 0, ext])
    fl_uv = np.array([[[0, 0], [4, 0], [4, 4]], [[0, 0], [4, 4], [0, 4]]], np.float32)
    b.add_mesh(fl_p, floor_m, uv=fl_uv)
    wl_p = quad([-ext, 0, ext], [ext, 0, ext], [ext, ext, ext], [-ext, ext, ext])
    b.add_mesh(wl_p, wall_m, uv=fl_uv)
    lp = 0.25 * ext
    b.add_mesh(
        quad([-lp, 0.98 * ext, -lp], [lp, 0.98 * ext, -lp],
             [lp, 0.98 * ext, lp], [-lp, 0.98 * ext, lp]),
        floor_m, emitter_id=panel)

    rng = np.random.default_rng(42)
    for gi in range(grid):
        for gj in range(grid):
            cx = (gi - (grid - 1) / 2) * 2.0
            cz = (gj - (grid - 1) / 2) * 2.0
            ry = 0.6 + 0.5 * rng.random()
            p, n, uv = _torus_mesh((cx, 0.45, cz), R=0.55, r=0.22,
                                   ns=ns, nt=nt, scale_y=ry)
            b.add_mesh(p, mats[(gi * grid + gj) % len(mats)], n=n, uv=uv)

    scene = b.compile(bvh_cfg, forest_chunk=forest_chunk, node_fmt=node_fmt)
    cam = cam_mod.make_camera(
        origin=(0.0, grid * 0.85, -grid * 1.45),
        target=(0.0, 0.3, 0.0),
        fov=55.0,
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


def grid_smoke(width=16, height=16, n=16, sigma=4.0, light_scale=6.0):
    """Smoke ball in a cube: a soft-sphere density grid medium inside a
    null-interface (forward-BSDF) container under an area light — the
    minimal grid-cbox-class scene (reference scene/xml/grid-cbox.xml; its
    .nvdb asset is absent upstream, so the density is synthesized)."""
    from .builder import MediumSpec

    b = SceneBuilder()
    white = b.add_bsdf(BSDFSpec(k_d=(0.7, 0.7, 0.7)))
    fwd = b.add_bsdf(BSDFSpec(btype=T.BSDF_FORWARD))
    em = b.add_emitter(EmitterSpec(etype=T.EMITTER_AREA,
                                   emission=(1, 1, 1), scaler=light_scale))
    b.add_mesh(quad([-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]),
               white, emitter_id=em)
    g = np.linspace(-1, 1, n)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    dens = np.maximum(0.0, 1.0 - np.sqrt(xx**2 + yy**2 + zz**2)) * sigma
    gid = b.add_grid(dens.astype(np.float32), (-1, -1, -1), (1, 1, 1))
    med = b.add_medium(MediumSpec(mtype=T.MEDIUM_GRID, grid_id=gid,
                                  sigma_s=(0.9, 0.9, 0.9), scale=1.0))
    cube = np.concatenate([
        quad([-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]),
        quad([1, -1, 1], [-1, -1, 1], [-1, 1, 1], [1, 1, 1]),
        quad([-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]),
        quad([1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]),
        quad([-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]),
        quad([-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]),
    ], axis=0)
    b.add_mesh(cube, fwd, medium_in=med, cullable=True)
    # floor catches scattered light (keeps the image non-trivial)
    b.add_mesh(quad([-3, -1.2, -3], [3, -1.2, -3], [3, -1.2, 3],
                    [-3, -1.2, 3]), white)
    scene = b.compile()
    cam = cam_mod.make_camera((0, 0.2, -4), (0, 0, 0), fov=35,
                              width=width, height=height)
    return scene, cam, b
