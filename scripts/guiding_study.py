"""Guided-sampling quality study (ROADMAP #6).

Measures equal-spp error of the guided wavefront estimator on the slot
scene (bright light visible only through a narrow slot — NEE mostly
occluded, cosine sampling rarely finds the slot) as a function of the
online fit schedule: training-data spp, Adam steps, and the guide
selection-probability cap. Writes GUIDING_STUDY.json and prints one JSON
row per configuration.

Error metric: mean per-pixel seed-to-seed variance across N seeds at equal
render spp (the quantity one-sample-MIS guiding is allowed to change), plus
the mean-image drift vs the unguided mean (unbiasedness check).

Usage: python scripts/guiding_study.py [--seeds 10] [--spp 6]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--spp", type=int, default=6)
    ap.add_argument("--out", default=str(REPO / "GUIDING_STUDY.json"))
    args = ap.parse_args()

    from test_guiding import _slot_scene  # reuse the canonical occluder scene

    from cuda_pt_tpu.core.config import MaxDepthParams
    from cuda_pt_tpu.models import guiding, wavefront

    scene, cam = _slot_scene()
    md = MaxDepthParams(max_depth=3)

    def stats(guide):
        t0 = time.perf_counter()
        imgs = np.stack([
            np.asarray(
                wavefront.render(scene, cam, md, spp=args.spp, seed=50 + s,
                                 use_bvh=False, guide=guide)
            )
            for s in range(args.seeds)
        ])
        render_s = (time.perf_counter() - t0) / args.seeds
        return float(imgs.mean()), float(imgs.var(axis=0).mean()), render_s

    rows = []
    m0, v0, t_r0 = stats(None)
    # second timing pass: first includes compile
    _, _, t_r0 = stats(None)
    rows.append({"config": "unguided", "mean": m0, "var": v0,
                 "vs_unguided": 1.0, "render_seconds": round(t_r0, 2)})
    print(json.dumps(rows[-1]))

    best_equal_time = 0.0
    for fit_spp, steps in [(2, 50), (6, 50), (6, 150), (6, 400), (12, 150)]:
        t0 = time.perf_counter()
        guide, loss = guiding.train_guide(
            scene, cam, md, seed=3, use_bvh=False, spp=fit_spp, steps=steps
        )
        fit_s = time.perf_counter() - t0
        m, v, t_rg = stats(guide)
        # Equal-TIME win (VERDICT r2 item 8): variance of the mean scales as
        # var/spp ∝ var·t; charging the guided estimator its fit time +
        # per-frame overhead, the effective win is
        #   (v0 / v) · (t_unguided / (t_guided + fit/frames)).
        # One-frame amortization is the honest viewer/offline-single-frame
        # case; the 'amortized' field spreads the fit over 100 frames (the
        # animation case where the guide is reused).
        et_1 = (v0 / max(v, 1e-12)) * (t_r0 / max(t_rg + fit_s, 1e-9))
        et_100 = (v0 / max(v, 1e-12)) * (t_r0 / max(t_rg + fit_s / 100, 1e-9))
        best_equal_time = max(best_equal_time, et_1)
        rows.append({
            "config": f"fit_spp{fit_spp}_steps{steps}",
            "mean": m, "var": v, "vs_unguided": v / v0,
            "mean_drift": abs(m - m0) / max(m0, 1e-9),
            "fit_loss": loss, "fit_seconds": round(fit_s, 2),
            "render_seconds": round(t_rg, 2),
            "equal_time_win": round(et_1, 3),
            "equal_time_win_amortized100": round(et_100, 3),
        })
        print(json.dumps(rows[-1]))

    # Kill threshold (VERDICT r2 item 8): <1.3x equal-time win on the slot
    # scene → guiding stays experimental, off by default (it already is:
    # guide=None everywhere unless the caller trains and passes one).
    verdict = ("pays" if best_equal_time >= 1.3 else
               "experimental-off-by-default (<1.3x equal-time win)")
    Path(args.out).write_text(json.dumps(
        {"scene": "slot", "render_spp": args.spp, "n_seeds": args.seeds,
         "metric": "mean per-pixel seed-to-seed variance",
         "equal_time_threshold": 1.3, "best_equal_time_win": best_equal_time,
         "verdict": verdict, "rows": rows},
        indent=1,
    ))
    print(json.dumps({"verdict": verdict,
                      "best_equal_time_win": round(best_equal_time, 3)}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
