"""Equal-budget quality benchmark: sampler × allocation × denoise.

The throughput bench (bench.py / scripts/bench_suite.py) measures rays per
second; this one measures error per sample — the axis where the round-2
sampling stack (Owen-Sobol QMC, tile-adaptive allocation, à-trous denoise,
stratified dispersion wavelengths) beats the reference's uniform+xorshift
design. MSE is computed against a 1024-spp reference render.

Writes QUALITY_BENCH.json and prints one JSON row per configuration.

Usage: python scripts/quality_bench.py [--width 64] [--budgets 4 8 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", choices=["cornell", "slot"], default="cornell",
                    help="slot = light through a narrow slot (concentrated "
                         "variance; the adaptive sampler's best case)")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--budgets", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--target-mse", type=float, default=None,
                    help="time-to-quality target (default: uniform_pcg's "
                         "MSE at the largest budget)")
    ap.add_argument("--out", default=str(REPO / "QUALITY_BENCH.json"))
    args = ap.parse_args()

    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import adaptive, denoise
    from cuda_pt_tpu.models import debug_renderers
    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.scene import testscenes

    w = args.width
    if args.scene == "slot":
        sys.path.insert(0, str(REPO / "tests"))
        from test_guiding import _slot_scene

        scene, cam0 = _slot_scene()
        from cuda_pt_tpu.core import camera as cam_mod

        cam = cam_mod.make_camera((0, 0.7, -2.6), (0, 0.3, 0), fov=35,
                                  width=w, height=w)
    else:
        scene, cam, _ = testscenes.cornell_box(width=w, height=w)
    md = MaxDepthParams(max_depth=5)
    ref = np.asarray(pt.render(scene, cam, md, spp=1024, seed=991,
                               use_bvh=False))

    aovs = debug_renderers.render_aovs(scene, cam, spp=4, seed=7919,
                                       use_bvh=False)

    def mse(img):
        return float(((np.asarray(img) - ref) ** 2).mean())

    def uniform(budget, sampler):
        return pt.render(scene, cam, md, spp=budget, seed=0, use_bvh=False,
                         sampler=sampler)

    def adapt(budget, sampler):
        img, _ = adaptive.render_adaptive(scene, cam, md, budget, seed=0,
                                          use_bvh=False, sampler=sampler)
        return img

    def denoised_adaptive(budget, sampler):
        """Everything on: adaptive + QMC + variance-guided denoise, with
        the denoiser fed adaptive's own per-pixel variance."""
        img, _, var = adaptive.render_adaptive(
            scene, cam, md, budget, seed=0, use_bvh=False, sampler=sampler,
            return_variance=True)
        return denoise.atrous_denoise(img, aovs, variance=var)

    def denoised_uniform(budget, sampler):
        """Film-accumulated render → variance-guided à-trous denoise."""
        import jax.numpy as jnp

        from cuda_pt_tpu.core import film as film_mod

        film = film_mod.make_film(w, w)
        for i in range(budget):
            film = film_mod.accumulate(
                film, pt.render_sample(scene, cam, md, 0, i, False,
                                       sampler=sampler))
        var = film_mod.variance(film) / jnp.maximum(film.count, 1)
        return denoise.atrous_denoise(film.mean, aovs, variance=var)

    rows = []
    for budget in args.budgets:
        configs = {
            "uniform_pcg": lambda: uniform(budget, "pcg"),
            "uniform_sobol": lambda: uniform(budget, "sobol"),
            "adaptive_pcg": lambda: adapt(budget, "pcg"),
            "adaptive_sobol": lambda: adapt(budget, "sobol"),
            "uniform_pcg_denoised_vg": lambda: denoised_uniform(budget, "pcg"),
            "uniform_sobol_denoised_vg": lambda: denoised_uniform(
                budget, "sobol"),
            "adaptive_sobol_denoised_vg": lambda: denoised_adaptive(
                budget, "sobol"),
        }
        base = None
        for name, fn in configs.items():
            m = mse(fn())
            if base is None:
                base = m
            rows.append({"budget_spp": budget, "config": name, "mse": m,
                         "vs_uniform_pcg": round(m / base, 4)})
            print(json.dumps(rows[-1]))

    # ---- time-to-quality: samples + wall time to reach a target MSE ------
    # (the user-facing metric: adaptive+sobol reaches uniform+pcg's 16-spp
    # error with several-fold fewer samples)
    target = args.target_mse
    if target is None:
        target = next(r["mse"] for r in rows
                      if r["budget_spp"] == max(args.budgets)
                      and r["config"] == "uniform_pcg")
    tt_rows = []
    for name, fn in [
        ("uniform_pcg", lambda b: uniform(b, "pcg")),
        ("uniform_sobol", lambda b: uniform(b, "sobol")),
        ("adaptive_sobol", lambda b: adapt(b, "sobol")),
    ]:
        # adaptive needs >=2 warm-up passes below its budget
        budget, m, dt = (4 if name.startswith("adaptive") else 2), float("inf"), 0.0
        while budget <= 512:
            t0 = time.perf_counter()
            img = fn(budget)
            np.asarray(img)
            dt = time.perf_counter() - t0
            m = mse(img)
            if m <= target:
                break
            budget *= 2
        tt_rows.append({"config": name, "target_mse": target,
                        "spp_to_target": budget if m <= target else None,
                        "mse": m, "seconds": round(dt, 3)})
        print(json.dumps(tt_rows[-1]))

    out = args.out
    if args.scene != "cornell" and out == str(REPO / "QUALITY_BENCH.json"):
        out = str(REPO / f"QUALITY_BENCH_{args.scene}.json")
    Path(out).write_text(json.dumps(
        {"scene": f"{args.scene} {w}x{w} depth5", "reference_spp": 1024,
         "metric": "MSE vs reference", "rows": rows,
         "time_to_quality": tt_rows}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
