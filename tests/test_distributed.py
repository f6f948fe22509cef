"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.parallel import distributed as dist
from cuda_pt_tpu.scene import testscenes


@pytest.fixture(scope="module")
def cbox():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    return scene, cam, MaxDepthParams(max_depth=3)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_tile_sharded_matches_single_device(cbox):
    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=1)  # 1x8 tile sharding
    img_d = np.asarray(
        dist.render_distributed(scene, cam, md, spp=4, mesh=mesh, seed=0, use_bvh=False)
    )
    # Same seeds/sample indices → same estimator. Measured bit-identical
    # on the virtual mesh (round 4); allow at most a couple of pixels for
    # an XLA-version fusion-order RR flip, everything else tight (VERDICT
    # r3 weak #7: the old 95%@1e-4 could hide real estimator drift).
    img_s = np.asarray(pt.render(scene, cam, md, spp=4, seed=0, use_bvh=False))
    bad = (np.abs(img_d - img_s).max(axis=-1) > 1e-5).sum()
    assert bad <= 2, f"{bad} divergent pixels"
    assert abs(img_d.mean() - img_s.mean()) < 1e-4


def test_sample_sharded_render(cbox):
    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=2)  # 2x4: 2-way samples, 4-way tiles
    img = np.asarray(
        dist.render_distributed(scene, cam, md, spp=4, mesh=mesh, seed=0, use_bvh=False)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # statistically consistent with the plain render
    ref = np.asarray(pt.render(scene, cam, md, spp=64, seed=9, use_bvh=False))
    assert abs(img.mean() - ref.mean()) < 0.15


def test_train_step_grads_allreduced(cbox):
    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=2)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    loss, grads = jax.jit(
        lambda s: dist.render_train_step(s, cam, md, target, mesh, spp=2, seed=0)
    )(scene)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # darkening the scene reduces MSE to a black target → emission grad > 0
    g_em = np.asarray(grads["emission"])
    assert g_em[1].sum() > 0.0

    # remat=True is the same estimator: identical loss and gradients
    loss_r, grads_r = jax.jit(
        lambda s: dist.render_train_step(s, cam, md, target, mesh, spp=2,
                                         seed=0, remat=True)
    )(scene)
    np.testing.assert_array_equal(np.asarray(loss), np.asarray(loss_r))
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tile_sharded_with_bvh():
    """BVH traversal while_loops must compile inside shard_map (regression:
    varying-axis carry init)."""
    import numpy as np

    from cuda_pt_tpu.scene import testscenes

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    mesh = dist.make_mesh(sp=2)
    img = np.asarray(
        dist.render_distributed(scene, cam, md, spp=2, mesh=mesh, seed=1, use_bvh=True)
    )
    assert np.isfinite(img).all() and img.max() > 0.01


def test_host_chip_mesh_axes(cbox):
    """2 hosts x 4 chips topology: tiles sharded over the host axis too
    (BASELINE multi-host target, simulated on the virtual device mesh)."""
    import numpy as np
    from jax.sharding import Mesh

    scene, cam, md = cbox
    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("sp", "dp"))  # sp across "hosts"
    img = np.asarray(
        dist.render_distributed(scene, cam, md, spp=4, mesh=mesh, seed=0, use_bvh=False)
    )
    assert np.isfinite(img).all() and img.max() > 0.05


def test_distributed_wavefront_renderer(cbox):
    """Compacted wavefront runs under shard_map (sort/compaction per shard)."""
    import numpy as np

    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=1)
    img = np.asarray(dist.render_distributed(
        scene, cam, md, spp=2, mesh=mesh, seed=3, use_bvh=False, renderer="wfpt"))
    assert np.isfinite(img).all() and img.max() > 0.01
    ref = np.asarray(dist.render_distributed(
        scene, cam, md, spp=2, mesh=mesh, seed=3, use_bvh=False))
    # tiny 32-lane shards make RR-flip divergence more common; most pixels
    # still match exactly and the estimator means agree
    match = np.isclose(img, ref, atol=1e-4).mean()
    assert match > 0.75, match
    assert abs(img.mean() - ref.mean()) < 0.03


def test_distributed_vpt_renderer(cbox):
    """Volumetric PT (compacted) runs under shard_map via renderer="vpt";
    in a vacuum scene it must agree with the surface PT estimator."""
    import numpy as np

    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=1)
    img = np.asarray(dist.render_distributed(
        scene, cam, md, spp=2, mesh=mesh, seed=5, use_bvh=False, renderer="vpt"))
    assert np.isfinite(img).all() and img.max() > 0.01
    ref = np.asarray(dist.render_distributed(
        scene, cam, md, spp=2, mesh=mesh, seed=5, use_bvh=False))
    assert abs(img.mean() - ref.mean()) < 0.05, (img.mean(), ref.mean())


def test_distributed_sobol_matches_single_device(cbox):
    """The QMC sampler under tile sharding: same per-(pixel, sample)
    low-discrepancy sequences as the single-device render."""
    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=1)
    img_d = np.asarray(
        dist.render_distributed(scene, cam, md, spp=4, mesh=mesh, seed=0,
                                use_bvh=False, sampler="sobol")
    )
    img_s = np.asarray(pt.render(scene, cam, md, spp=4, seed=0,
                                 use_bvh=False, sampler="sobol"))
    match = np.isclose(img_d, img_s, atol=1e-4).mean()
    assert match > 0.95, match
    assert abs(img_d.mean() - img_s.mean()) < 0.02


def test_distributed_sample_window_advances(cbox):
    """sample_base0 must shift the per-pixel sample indices: two windows
    give different (decorrelated) but unbiased passes."""
    scene, cam, md = cbox
    mesh = dist.make_mesh(sp=1)
    a = np.asarray(dist.render_distributed(
        scene, cam, md, spp=2, mesh=mesh, seed=0, use_bvh=False,
        sampler="sobol", sample_base0=0))
    b = np.asarray(dist.render_distributed(
        scene, cam, md, spp=2, mesh=mesh, seed=0, use_bvh=False,
        sampler="sobol", sample_base0=2))
    assert np.abs(a - b).max() > 1e-3  # different samples
    assert abs(a.mean() - b.mean()) < 0.05  # same estimator
    # windows [0,2) and [2,4) must average to the [0,4) render
    both = np.asarray(dist.render_distributed(
        scene, cam, md, spp=4, mesh=mesh, seed=0, use_bvh=False,
        sampler="sobol"))
    np.testing.assert_allclose((a + b) / 2, both, atol=2e-4)


def test_forest_traversal_under_mesh():
    """VERDICT r2 item 9: the Pallas streaming-forest path (chunked HBM
    node/prim arrays) must compile and run under shard_map tile sharding —
    forest chunk streaming inside a sharded while_loop was untested. Runs in
    interpret mode on the CPU mesh; the driver dry-runs the same path
    compiled."""
    from cuda_pt_tpu.ops.pallas import traverse_kernel as tk

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=2)
    old = tk.INTERPRET
    tk.INTERPRET = True
    try:
        scene = scene.replace(
            forest=tk.build_forest(scene.geom, chunk_prims=16),
            traversal="pallas",
        )
        mesh = dist.make_mesh(sp=1)
        img = np.asarray(
            dist.render_distributed(scene, cam, md, spp=1, mesh=mesh,
                                    seed=0, use_bvh=True)
        )
        assert np.isfinite(img).all()
        ref = np.asarray(
            pt.render(scene.replace(traversal="xla", forest=None), cam, md,
                      spp=1, seed=0, use_bvh=True))
        match = np.isclose(img, ref, atol=1e-4).mean()
        assert match > 0.95, match
    finally:
        tk.INTERPRET = old


def test_fused_megakernel_under_mesh():
    """The fused in-kernel megakernel runs under shard_map tile sharding
    (interpret mode on the CPU mesh) and matches the composed distributed
    render."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    old = mk.INTERPRET
    mk.INTERPRET = True
    try:
        pack = mk.make_pack(scene)
        mesh = dist.make_mesh(sp=1)
        img_f = np.asarray(dist.render_distributed(
            scene, cam, md, spp=2, mesh=mesh, seed=0, use_bvh=True,
            renderer="fused", fused_pack=pack,
            fused_max_leaf=int(scene.bvh.max_leaf)))
        img_c = np.asarray(dist.render_distributed(
            scene, cam, md, spp=2, mesh=mesh, seed=0, use_bvh=True))
        assert np.isfinite(img_f).all()
        match = np.isclose(img_f, img_c, atol=2e-2, rtol=1e-3).mean()
        assert match > 0.95, match
    finally:
        mk.INTERPRET = old


def test_fused_vpt_under_mesh():
    """The fused VOLUMETRIC megakernel (homogeneous media in-kernel) also
    shards: medium-cbox tiles over the virtual mesh, finite and
    mean-consistent with the composed distributed VPT."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml("/root/reference/scene/xml/medium-cbox.xml",
                  override_res=(16, 16))
    md = MaxDepthParams(max_depth=4, max_volume=6)
    old = mk.INTERPRET
    mk.INTERPRET = True
    try:
        pack = mk.make_pack(ps.scene, vpt=True)
        assert pack.has_media
        mesh = dist.make_mesh(sp=1)
        img_f = np.asarray(dist.render_distributed(
            ps.scene, ps.camera, md, spp=2, mesh=mesh, seed=0,
            use_bvh=True, renderer="fused", fused_pack=pack,
            fused_max_leaf=int(ps.scene.bvh.max_leaf)))
        assert np.isfinite(img_f).all()
        # sharding correctness: the mesh render must match the
        # single-device fused render (same estimator, same seeds)
        from cuda_pt_tpu.core import camera as cam_mod
        from cuda_pt_tpu.core import qmc

        B = ps.camera.width * ps.camera.height
        acc = np.zeros((B, 3), np.float32)
        for idx in range(2):
            lane = jnp.arange(B, dtype=jnp.int32)
            rng = qmc.make_state("pcg", 0, lane, idx)
            o, d, rng = cam_mod.generate_rays(ps.camera, lane, rng)
            acc += np.asarray(mk.trace_megakernel(pack, md, o, d, rng))
        img_s = (acc / 2).reshape(16, 16, 3)
        match = np.isclose(img_f, img_s, atol=1e-4, rtol=1e-4).mean()
        assert match > 0.99, match
    finally:
        mk.INTERPRET = old
