"""Round-4 big-scene fused experiments on the live TPU.

Child mode (one TPU client per process, TUNNEL.md rules): warm readback,
then cornell regression + bunny tile sweep + whiskey compact-pack probes,
emitting one JSON row per line on stdout.

Parent mode (default): runs N sequential fresh children (the whiskey
worker-fault reproducer was session-scoped — EXP_FUSED_BIG r3), aggregates
rows + per-child survival into EXP_R4_BIG.json.

Usage:
  python scripts/exp_r4_bigscene.py            # parent, N=3 children
  python scripts/exp_r4_bigscene.py --children 5
  python scripts/exp_r4_bigscene.py --child quick|full   # one child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def emit(r):
    print(json.dumps(r), flush=True)


def child(mode: str) -> None:
    import jax

    from cuda_pt_tpu.models import path_tracer as pt
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene import testscenes
    from cuda_pt_tpu.scene.xml_parser import load_xml
    from cuda_pt_tpu.utils import timing

    t0 = time.time()
    warm = timing.warm_readback()
    emit({"event": "warm", "backend": jax.default_backend(),
          "warm_s": round(warm, 1)})

    def ray_count(scene, cam, md, spp):
        # HOST-side count (TUNNEL.md §5, solved): the composed counting
        # kernel on whiskey-class meshes runs past the tunnel's ~60 s
        # per-call budget and kills the TPU worker — that kill, not the
        # fused kernel, was every round-4 "whiskey crash".
        return timing.host_count(
            lambda s: pt.count_rays(s, cam, md, spp=spp, seed=1,
                                    use_bvh=True), scene)

    def run(tag, scene, cam, md, spp, tile=None, reps=3, **mkw):
        try:
            pack = mk.make_pack(scene, **mkw)
            ml = int(scene.bvh.max_leaf)
            old_tile = mk.TILE
            if tile:
                mk.TILE = tile
            try:
                f = jax.jit(lambda p, s: mk.render_pack(
                    p, cam, md, spp=spp, seed=s, max_leaf=ml))
                dt = timing.timeit(f, pack, 1, reps=reps)
            finally:
                mk.TILE = old_tile
            rays = ray_count(scene, cam, md, spp)
            emit({"tag": tag, "tile": tile or mk.TILE, "sec": round(dt, 4),
                  "rays": rays, "mrays": round(rays / dt / 1e6, 2),
                  "node_fmt": pack.node_fmt, "attr_fmt": pack.attr_fmt,
                  "prim_fmt": pack.prim_fmt,
                  "pack_mb": round(sum(
                      int(v.size) * 4 for v in pack.values()) / 2**20, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"tag": tag, "tile": tile, "error": repr(e)[:300]})

    W = 256
    # 1. cornell regression (r3 headline config: 256^2 x 4spp depth 5)
    scene, cam, _ = testscenes.cornell_box(width=W, height=W)
    from cuda_pt_tpu.core.config import MaxDepthParams

    md = MaxDepthParams(max_depth=5)
    run("cornell", scene, cam, md, spp=4)

    # 2. whiskey compact pack (auto: bf16 nodes/attrs + t9 prims, ~5.3 MB).
    # In full mode it runs AFTER kitchen/bunny so a fault can't eat their
    # rows (that ordering cost round 4 its first full measurement pass).
    ps = load_xml("/root/reference/scene/xml/whiskey.xml",
                  override_res=(W, W))
    wmd = ps.config.md
    if mode != "full":
        run("whiskey_compact", ps.scene, ps.camera, wmd, spp=1, reps=3)

    if mode == "full":
        # 3. kitchen-class fused (deferred textures + envmap epilogue +
        # dispersion in-kernel — the round-4 envelope)
        ks, kc, _ = testscenes.kitchen_stress(width=W, height=W)
        if mk.megakernel_ok(ks, md):
            run("kitchen_fused", ks, kc, md, spp=1)
        else:
            emit({"tag": "kitchen_fused", "error": "outside envelope"})
        # 3b. bunny tile sweep on the compact pack
        bp = load_xml("/root/reference/scene/xml/bunny.xml",
                      override_res=(W, W))
        for tile in (2048, 4096, 8192):
            run(f"bunny", bp.scene, bp.camera, bp.config.md, spp=1,
                tile=tile)
        # 3c. Z-order swizzle A/B on bunny (identity perm = r3 behavior)
        import numpy as _np

        real_swz = mk._tile_swizzle_np
        mk._tile_swizzle_np = lambda w, h: (
            _np.arange(w * h, dtype=_np.int32),
            _np.arange(w * h, dtype=_np.int32))
        try:
            run("bunny_noswizzle", bp.scene, bp.camera, bp.config.md,
                spp=1, tile=4096)
        finally:
            mk._tile_swizzle_np = real_swz
        # 4. bunny with the r3-style f32 pack for an apples-to-apples delta
        run("bunny_f32", bp.scene, bp.camera, bp.config.md, spp=1,
            tile=4096, node_fmt="f32", attr_fmt="f32", prim_fmt="f32")
        # 5. whiskey: compact pack, then the f32 pack (the r3 "fault"
        # config — stable now that ray counting is host-side)
        run("whiskey_compact", ps.scene, ps.camera, wmd, spp=1, reps=3)
        run("whiskey_f32", ps.scene, ps.camera, wmd, spp=1, reps=3,
            node_fmt="f32", attr_fmt="f32", prim_fmt="f32")
    emit({"event": "child_done", "total_s": round(time.time() - t0, 1)})


def parent(n_children: int) -> None:
    out = REPO / "EXP_R4_BIG.json"
    rows = []
    for i in range(n_children):
        mode = "full" if i == 0 else "quick"
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--child", mode],
                capture_output=True, text=True, timeout=3600,
                cwd=str(REPO),
            )
            ok = p.returncode == 0
            child_rows = []
            for line in p.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        child_rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
            whiskey_ok = any(
                r.get("tag", "").startswith("whiskey") and "mrays" in r
                for r in child_rows)
            rows.append({"child": i, "mode": mode, "exit": p.returncode,
                         "alive": ok, "whiskey_ok": whiskey_ok,
                         "wall_s": round(time.time() - t0, 1),
                         "rows": child_rows,
                         "stderr_tail": p.stderr[-400:] if not ok else ""})
        except subprocess.TimeoutExpired:
            rows.append({"child": i, "mode": mode, "alive": False,
                         "error": "timeout 3600s"})
        out.write_text(json.dumps(rows, indent=1))
        print(f"child {i} done ({rows[-1].get('alive')})", flush=True)
        time.sleep(5)
    n_ok = sum(1 for r in rows if r.get("whiskey_ok"))
    summary = {"children": n_children, "whiskey_survived": n_ok}
    rows.append(summary)
    out.write_text(json.dumps(rows, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--child" in sys.argv:
        mode = sys.argv[sys.argv.index("--child") + 1]
        child(mode)
    else:
        n = 3
        if "--children" in sys.argv:
            n = int(sys.argv[sys.argv.index("--children") + 1])
        os.chdir(REPO)
        parent(n)
