"""Showcase render: every round-2 feature in one frame.

Cornell-style room with a dispersive diamond sphere, a frosted
(rough-dielectric) pane, a gold GGX conductor sphere and an Oren-Nayar
clay sphere — rendered with the Owen-Sobol sampler under tile-adaptive
allocation, then variance-guided denoised. Writes docs/showcase.png
(raw + denoised side by side).

Usage: python scripts/showcase.py [--width 160] [--budget 64]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_scene():
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder
    from cuda_pt_tpu.scene.presets import CONDUCTORS, DISPERSION

    b = SceneBuilder()
    q = testscenes.quad
    white = b.add_bsdf(BSDFSpec(k_d=(0.73, 0.73, 0.73)))
    red = b.add_bsdf(BSDFSpec(k_d=(0.65, 0.05, 0.05)))
    green = b.add_bsdf(BSDFSpec(k_d=(0.12, 0.45, 0.15)))
    clay = b.add_bsdf(BSDFSpec(btype=T.BSDF_OREN_NAYAR, k_d=(0.65, 0.45, 0.3),
                               roughness_x=0.7, roughness_y=0.7))
    a_d, b_d = DISPERSION["Diamond"]
    diamond = b.add_bsdf(BSDFSpec(btype=T.BSDF_DISPERSION, k_s=(1, 1, 1),
                                  cauchy_a=a_d, cauchy_b=b_d))
    eta, kk = CONDUCTORS["Au"]
    gold = b.add_bsdf(BSDFSpec(btype=T.BSDF_GGX_CONDUCTOR, k_g=(1, 1, 1),
                               eta=eta, k=kk, roughness_x=0.15,
                               roughness_y=0.35))
    frost = b.add_bsdf(BSDFSpec(btype=T.BSDF_GGX_DIELECTRIC, k_s=(1, 1, 1),
                                ior=1.5, roughness_x=0.12, roughness_y=0.12))
    dark = b.add_bsdf(BSDFSpec(k_d=(0, 0, 0)))
    em = b.add_emitter(EmitterSpec(emission=(1.0, 0.9, 0.75), scaler=18.0))

    s = 1.0  # room half-size
    b.add_mesh(q([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s]), white)  # floor
    b.add_mesh(q([-s, 2 * s, -s], [s, 2 * s, -s], [s, 2 * s, s], [-s, 2 * s, s]), white)  # ceiling
    b.add_mesh(q([-s, 0, s], [-s, 2 * s, s], [s, 2 * s, s], [s, 0, s]), white)  # back
    b.add_mesh(q([-s, 0, -s], [-s, 2 * s, -s], [-s, 2 * s, s], [-s, 0, s]), red)  # left
    b.add_mesh(q([s, 0, s], [s, 2 * s, s], [s, 2 * s, -s], [s, 0, -s]), green)  # right
    b.add_mesh(q([-0.3, 1.98, -0.3], [0.3, 1.98, -0.3], [0.3, 1.98, 0.3],
                 [-0.3, 1.98, 0.3]), dark, emitter_id=em)  # light (faces down)
    b.add_sphere((-0.45, 0.32, 0.3), 0.32, diamond)
    b.add_sphere((0.5, 0.3, -0.1), 0.3, gold)
    b.add_sphere((0.0, 0.22, -0.45), 0.22, clay)
    # frosted pane standing mid-room
    b.add_mesh(q([-0.75, 0.0, -0.15], [-0.75, 0.9, -0.15],
                 [-0.05, 0.9, -0.35], [-0.05, 0.0, -0.35]), frost)
    scene = b.compile()
    cam = cam_mod.make_camera((0, 1.0, -2.9), (0, 0.75, 0), fov=42,
                              width=160, height=160)
    return scene, cam


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--out", default=str(REPO / "docs" / "showcase.png"))
    args = ap.parse_args()

    import dataclasses

    from cuda_pt_tpu.core import film as film_mod
    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import adaptive, debug_renderers, denoise
    from cuda_pt_tpu.utils.image import save_png

    scene, cam = build_scene()
    if args.width != cam.width:
        cam = dataclasses.replace(cam, width=args.width, height=args.width)
    md = MaxDepthParams(max_depth=8, max_transmit=10, max_specular=10)

    img, n, var = adaptive.render_adaptive(scene, cam, md, args.budget,
                                           seed=3, sampler="sobol",
                                           return_variance=True)
    from cuda_pt_tpu.models import path_tracer as ptm

    aovs = debug_renderers.render_aovs(
        scene, cam, spp=8, seed=7919,
        use_bvh=scene.geom.num_prims > ptm.BRUTE_FORCE_MAX_PRIMS)
    dn = denoise.atrous_denoise(img, aovs, variance=var)

    raw8 = np.asarray(film_mod.to_srgb(img) * 255 + 0.5).astype(np.uint8)
    dn8 = np.asarray(film_mod.to_srgb(dn) * 255 + 0.5).astype(np.uint8)
    side = np.concatenate([raw8, dn8], axis=1)
    save_png(args.out, side)
    print(f"wrote {args.out} (left raw adaptive+sobol {args.budget} budget, "
          f"right denoised); n range [{float(n.min()):.0f}, "
          f"{float(n.max()):.0f}]")


if __name__ == "__main__":
    main()
