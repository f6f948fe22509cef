"""AOT TPU lowering of the FULL render pipelines (not just Pallas kernels).

Mirrors the driver's single-chip compile check locally:
``jax.export(platforms=["tpu"])`` traces + lowers the whole graph with TPU
lowering rules (while_loop, sorts, scatters, gathers, the Sobol bit math)
without hardware, so a TPU-only lowering regression fails CI here instead
of at the first on-chip run.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import export as jexport

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import adaptive
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.models import volume_pt, wavefront
from cuda_pt_tpu.scene import testscenes


@pytest.fixture(scope="module")
def cornell():
    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    return scene, cam, MaxDepthParams(max_depth=3)


def _lowers(fn, *args):
    exp = jexport.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exp.mlir_module()


def test_graft_entry_lowers_for_tpu():
    import __graft_entry__

    fn, (scene, seed) = __graft_entry__.entry()
    _lowers(fn, scene, seed)


def test_megakernel_sobol_lowers(cornell):
    scene, cam, md = cornell
    _lowers(
        lambda s, seed: pt.render(s, cam, md, spp=2, seed=seed,
                                  use_bvh=True, sampler="sobol"),
        scene, jnp.int32(0),
    )


def test_wavefront_compacted_lowers(cornell):
    scene, cam, md = cornell
    _lowers(
        lambda s, seed: wavefront.render(s, cam, md, spp=2, seed=seed,
                                         use_bvh=True, compact=True),
        scene, jnp.int32(0),
    )


def test_adaptive_lowers(cornell):
    scene, cam, md = cornell
    def f(s):
        img, n = adaptive.render_adaptive(s, cam, md, 4, base_spp=2,
                                          use_bvh=True)
        return img, n
    _lowers(f, scene)


def test_vpt_lowers(cornell):
    scene, cam, md = cornell
    _lowers(
        lambda s, seed: volume_pt.render(s, cam, md, spp=1, seed=seed,
                                         use_bvh=True),
        scene, jnp.int32(0),
    )


def test_grad_render_lowers(cornell):
    """The differentiable (remat) gradient render must lower for TPU too."""
    scene, cam, md = cornell

    def loss(s):
        img = pt.render(s, cam, md, spp=1, seed=0, use_bvh=True,
                        differentiable="remat")
        return jnp.mean(img)

    _lowers(lambda s: jax.grad(
        lambda kd: loss(s.replace(bsdfs=s.bsdfs.replace(k_d=kd)))
    )(s.bsdfs.k_d), scene)


def test_fused_megakernel_lowers(cornell):
    """The full in-kernel Pallas megakernel must pass Mosaic lowering AOT
    (the r2 lesson: interpret-mode green ≠ compiles on silicon)."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk

    scene, cam, md = cornell
    assert mk.megakernel_ok(scene, md)
    pack = mk.make_pack(scene)  # host-side (concrete scene)
    _lowers(
        lambda p, seed: mk.render_pack(p, cam, md, spp=1, seed=seed,
                                       max_leaf=int(scene.bvh.max_leaf),
                                       interpret=False),
        pack, jnp.int32(0),
    )


def test_fused_env_textured_disp_lowers():
    """Round-4 fused variants (envmap epilogue, deferred textures,
    dispersion, compact bf16/t9 pack) must pass AOT TPU lowering."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk

    scene, cam, _ = testscenes.kitchen_stress(width=16, height=16, grid=2,
                                              ns=6, nt=4)
    md = MaxDepthParams(max_depth=4)
    assert mk.megakernel_ok(scene, md)
    pack = mk.make_pack(scene)
    assert pack.textured and pack.has_env and pack.has_disp
    _lowers(
        lambda p, seed: mk.render_pack(p, cam, md, spp=1, seed=seed,
                                       max_leaf=int(scene.bvh.max_leaf),
                                       interpret=False),
        pack, jnp.int32(0),
    )


def test_fused_compact_pack_lowers():
    """bf16 nodes + bf16 attrs + t9 prims (the whiskey-class compact
    format) through the fused kernel's AOT TPU lowering."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk

    scene, cam, _ = testscenes.cornell_box(width=16, height=16)
    md = MaxDepthParams(max_depth=3)
    # cornell has a sphere -> t9 not allowed; use bf16 nodes+attrs there
    pack = mk.make_pack(scene, node_fmt="bf16", attr_fmt="bf16")
    _lowers(
        lambda p, seed: mk.render_pack(p, cam, md, spp=1, seed=seed,
                                       max_leaf=int(scene.bvh.max_leaf),
                                       interpret=False),
        pack, jnp.int32(0),
    )
    tscene, tcam, _ = testscenes.kitchen_stress(width=16, height=16,
                                                grid=2, ns=6, nt=4)
    tpack = mk.make_pack(tscene, node_fmt="bf16", attr_fmt="bf16",
                         prim_fmt="t9")
    _lowers(
        lambda p, seed: mk.render_pack(p, tcam, md, spp=1, seed=seed,
                                       max_leaf=int(tscene.bvh.max_leaf),
                                       interpret=False),
        tpack, jnp.int32(0),
    )


def test_fused_vpt_lowers():
    """Fused homogeneous-media VPT (free-flight + phase + interface-walked
    shadow transmittance in-kernel) through AOT TPU lowering on the
    reference's medium-cbox."""
    from cuda_pt_tpu.ops.pallas import megakernel as mk
    from cuda_pt_tpu.scene.xml_parser import load_xml

    ps = load_xml("/root/reference/scene/xml/medium-cbox.xml",
                  override_res=(16, 16))
    md = MaxDepthParams(max_depth=5, max_volume=6)
    assert mk.megakernel_ok(ps.scene, md, renderer="vpt")
    pack = mk.make_pack(ps.scene, vpt=True)
    cam = ps.camera
    _lowers(
        lambda p, seed: mk.render_pack(p, cam, md, spp=1, seed=seed,
                                       interpret=False),
        pack, jnp.int32(0),
    )
