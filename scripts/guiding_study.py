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
        imgs = np.stack([
            np.asarray(
                wavefront.render(scene, cam, md, spp=args.spp, seed=50 + s,
                                 use_bvh=False, guide=guide)
            )
            for s in range(args.seeds)
        ])
        return float(imgs.mean()), float(imgs.var(axis=0).mean())

    rows = []
    m0, v0 = stats(None)
    rows.append({"config": "unguided", "mean": m0, "var": v0, "vs_unguided": 1.0})
    print(json.dumps(rows[-1]))

    for fit_spp, steps in [(2, 50), (6, 50), (6, 150), (6, 400), (12, 150)]:
        t0 = time.perf_counter()
        guide, loss = guiding.train_guide(
            scene, cam, md, seed=3, use_bvh=False, spp=fit_spp, steps=steps
        )
        fit_s = time.perf_counter() - t0
        m, v = stats(guide)
        rows.append({
            "config": f"fit_spp{fit_spp}_steps{steps}",
            "mean": m, "var": v, "vs_unguided": v / v0,
            "mean_drift": abs(m - m0) / max(m0, 1e-9),
            "fit_loss": loss, "fit_seconds": round(fit_s, 2),
        })
        print(json.dumps(rows[-1]))

    Path(args.out).write_text(json.dumps(
        {"scene": "slot", "render_spp": args.spp, "n_seeds": args.seeds,
         "metric": "mean per-pixel seed-to-seed variance", "rows": rows},
        indent=1,
    ))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
