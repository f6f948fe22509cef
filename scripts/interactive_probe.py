"""Interactive-rate probe: sustained api.Renderer fps on the live chip.

The reference's headline interactive loop renders 1 spp/frame with live
edits (/root/reference/app/viewer.cu:150-220). Round 2's best on-chip
512²×1spp frame was 5.5 s (0.2 fps). This measures the same loop through
the fused megakernel: N successive render_raw() calls (each fenced by the
film readback the viewer would do), reporting sustained fps + ms/frame,
plus a camera-move reset mid-run (the viewer's dirty-flag path).

Writes INTERACTIVE_PROBE.json. Usage: python scripts/interactive_probe.py
[--width 512] [--frames 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--out", default=str(REPO / "INTERACTIVE_PROBE.json"))
    args = ap.parse_args()

    import jax
    import numpy as np

    from cuda_pt_tpu.api import Renderer
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.core.config import RenderingConfig
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import ParsedScene
    from cuda_pt_tpu.utils import timing

    warm = timing.warm_readback() if jax.default_backend() != "cpu" else 0.0
    W = args.width
    scene, cam, _ = testscenes.cornell_box(width=W, height=W)
    ps = ParsedScene(scene, cam, RenderingConfig(width=W, height=W), None)
    r = Renderer(ps)
    info = r.info()

    r.render_raw()  # compile
    timing.force(r.film.mean)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        r.render_raw()
        # the viewer reads back a preview every frame: fence like it would
        timing.force(r.film.mean)
    dt = (time.perf_counter() - t0) / args.frames

    # live camera edit: update_camera resets the film; next frame recompiles
    # nothing (same shapes) — measure the first frame after the edit
    cam2 = cam_mod.make_camera(origin=(0.4, 0.55, -1.2), target=(0.5, 0.5, 0.5),
                               fov=40.0, width=W, height=W)
    r.update_camera(cam2)
    t1 = time.perf_counter()
    r.render_raw()
    timing.force(r.film.mean)
    edit_frame_s = time.perf_counter() - t1

    out = {
        "backend": jax.default_backend(),
        "traversal": info["traversal"],
        "width": W,
        "spp_per_frame": 1,
        "warm_s": round(warm, 1),
        "ms_per_frame": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 1),
        "frames": args.frames,
        "ms_first_frame_after_camera_edit": round(edit_frame_s * 1e3, 1),
        "film_mean": float(np.asarray(r.film.mean).mean()),
    }
    print(json.dumps(out))
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
