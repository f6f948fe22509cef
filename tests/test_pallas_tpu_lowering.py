"""AOT TPU-lowering gate for every Pallas kernel entry point.

``jax.export(..., platforms=["tpu"])`` runs the full Pallas→Mosaic lowering
(layout, MLIR verification) WITHOUT TPU hardware — the strongest lowering
check available while the tunnel is down (VERDICT r1 item 2: the kernel had
only ever run in interpret mode). This gate already caught a real rejection:
'tpu.bitcast' requires vector operands, so the bf16 node unpack must
bit-twiddle the (1, 128) row before scalar extraction (_unpack2_field).

Note the residual risk this cannot cover: the Mosaic *compiler* backend
(MLIR → TPU machine code) still runs inside device compile on real
hardware. scripts/tpu_validate.py holds that ladder.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import export as jexport

from cuda_pt_tpu.ops.pallas import traverse_kernel as tk
from cuda_pt_tpu.scene import testscenes


@pytest.fixture(scope="module")
def setup():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    o = jnp.zeros((256, 3), jnp.float32) + jnp.asarray([0.0, 1.0, 3.0])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (256, 1))
    return scene, o, d


def _export_ok(fn, *args):
    exp = jexport.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert "tpu_custom_call" in exp.mlir_module()


def test_single_chunk_closest_hit_lowers(setup):
    scene, o, d = setup
    ml = scene.bvh.max_leaf
    _export_ok(
        lambda o, d: tk.traverse_pallas(scene.geom, scene.bvh, o, d, None, ml),
        o, d,
    )


def test_single_chunk_occlusion_lowers(setup):
    scene, o, d = setup
    ml = scene.bvh.max_leaf
    _export_ok(
        lambda o, d: tk.traverse_pallas(
            scene.geom, scene.bvh, o, d, jnp.full(256, 2.0), ml, True
        ),
        o, d,
    )


@pytest.mark.parametrize("fmt", ["f32", "bf16"])
def test_forest_lowers(setup, fmt):
    scene, o, d = setup
    ml = scene.bvh.max_leaf
    forest = tk.build_forest(scene.geom, chunk_prims=16, node_fmt=fmt)
    _export_ok(lambda o, d: tk.traverse_forest(forest, o, d, max_leaf=ml), o, d)
    _export_ok(
        lambda o, d: tk.traverse_forest(
            forest, o, d, jnp.full(256, 2.0), ml, True
        ),
        o, d,
    )


def test_multi_tile_lowers(setup):
    """Ray counts spanning SEVERAL packet tiles (T_ > 1). The first live-chip
    run failed exactly here: a 2D (R<8, 128) ray block over a multi-tile
    array violates Mosaic's sublane-divisibility rule, but a single-tile
    shape (block == array) hides it. Blocks are 3D (1, R, 128) now; this
    pins the multi-tile shape class forever."""
    scene, _, _ = setup
    ml = scene.bvh.max_leaf
    n = 3 * tk.TILE  # deliberately > one tile and not a multiple of 1024
    o = jnp.zeros((n, 3), jnp.float32) + jnp.asarray([0.0, 1.0, 3.0])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    _export_ok(
        lambda o, d: tk.traverse_pallas(scene.geom, scene.bvh, o, d, None, ml),
        o, d,
    )
    _export_ok(
        lambda o, d: tk.traverse_pallas(
            scene.geom, scene.bvh, o, d, jnp.full(n, 2.0), ml, True
        ),
        o, d,
    )


def test_counting_variant_lowers(setup):
    scene, o, d = setup
    ml = scene.bvh.max_leaf
    _export_ok(
        lambda o, d: tk.traverse_pallas(
            scene.geom, scene.bvh, o, d, None, ml, False, None, True
        ),
        o, d,
    )
