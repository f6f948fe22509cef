"""Multi-chip / multi-host rendering over a jax.sharding Mesh.

TPU-native replacement for the reference's nanobind + PyTorch-DDP/NCCL path
(scripts/ddp_render.py): instead of one process per GPU with NCCL all_reduce
on images (:70-82), we lay a 2-axis device mesh:

  axis "sp" — sample-space parallelism: every sp-rank renders the full tile
              set with decorrelated seeds (reference rank-salted seeds,
              ddp_render.py:141-143) and images are psum-averaged over ICI.
  axis "dp" — tile parallelism: pixels sharded across dp-ranks; the scene +
              BVH stay replicated per device (BASELINE.json requirement).

Parameter gradients are psum'd over BOTH axes inside the same shard_mapped
backward, so the all-reduce is fused/overlapped by XLA rather than issued as
a separate NCCL call after the step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..core import camera as cam_mod
from ..core import qmc
from ..core.config import MaxDepthParams
from ..models import path_tracer as pt
from ..scene import types as T


def make_mesh(devices=None, sp: int = 1, dp=None) -> Mesh:
    """Build an (sp, dp) mesh from the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert sp * dp == n, f"mesh {sp}x{dp} != {n} devices"
    arr = np.asarray(devices).reshape(sp, dp)
    return Mesh(arr, axis_names=("sp", "dp"))


def _render_tile_lanes(scene, cam, md, seed, sample_base, lane_ids, use_bvh, n_samples,
                       differentiable=False, renderer: str = "pt",
                       sampler: str = "pcg", fused_pack=None,
                       fused_max_leaf: int = 4):
    """Render n_samples passes for the given flat pixel ids; (L, B, 3) sum."""

    def body(i, acc):
        s_idx = sample_base + i
        rng = qmc.make_state(sampler, seed, lane_ids, s_idx)
        o, d, rng = cam_mod.generate_rays(cam, lane_ids, rng)
        wl_u = pt.wl_stratum_u(seed, s_idx, lane_ids)
        if renderer == "wfpt" and not differentiable:
            from ..models import wavefront

            Lw, pix_local = wavefront.trace_paths_wavefront(
                scene, md, o, d, rng, use_bvh, sort_rays=True, compact=True,
                wl_u=wl_u,
            )
            # scatter back to this shard's lane order
            L = (o[:, :1] * 0.0 + jnp.zeros((1, 3))).at[pix_local].add(Lw)
        elif renderer == "fused":
            # fully-fused Pallas megakernel under the mesh: the pack is a
            # replicated pytree of packed rows built OUTSIDE shard_map
            # (ops/pallas/megakernel.make_pack needs a concrete scene)
            from ..ops.pallas import megakernel as mk

            L = mk.trace_megakernel(fused_pack, md, o, d, rng,
                                    max_leaf=fused_max_leaf)
        elif renderer == "vpt":
            from ..models import volume_pt

            if differentiable:
                L = volume_pt.trace_paths(
                    scene, md, o, d, rng, use_bvh, differentiable=True,
                    wl_u=wl_u,
                )
            else:
                Lv, pix_local = volume_pt.trace_paths(
                    scene, md, o, d, rng, use_bvh, compact=True, wl_u=wl_u
                )
                L = (o[:, :1] * 0.0 + jnp.zeros((1, 3))).at[pix_local].add(Lv)
        else:
            L = pt.trace_paths(scene, md, o, d, rng, use_bvh, differentiable,
                               wl_u=wl_u)
        return acc + L

    # derive from lane_ids AND sample_base so the carry inherits every
    # shard_map varying axis ("dp" via lanes, "sp" via the sample window)
    init = ((lane_ids + sample_base * 0).astype(jnp.float32) * 0.0)[:, None] * jnp.ones(
        (1, 3), jnp.float32
    )
    return jax.lax.fori_loop(0, n_samples, body, init)


def render_distributed(
    scene: T.Scene,
    cam: cam_mod.Camera,
    md: MaxDepthParams,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    use_bvh=None,
    differentiable: bool = False,
    renderer: str = "pt",
    sampler: str = "pcg",
    sample_base0=0,
    fused_pack=None,
    fused_max_leaf: int = 4,
):
    """SPMD render: pixels sharded over "dp", samples over "sp".

    renderer="fused" drives the in-kernel Pallas megakernel per shard;
    pass fused_pack = megakernel.make_pack(scene) (built from the concrete
    scene outside any jit) and the scene's bvh.max_leaf.

    Returns the full (H, W, 3) image (replicated). Differentiable.
    ``sample_base0`` offsets every lane's sample index — drivers that
    accumulate multiple calls pass ``pass_idx * spp`` so per-pixel sample
    indices keep advancing (required for the Sobol sampler's
    low-discrepancy prefix; harmless decorrelation for pcg).
    """
    if renderer == "fused" and sampler != "pcg":
        # Sobol state is (B, 4); trace_megakernel would truncate it to two
        # columns (sample idx, dim) that are IDENTICAL across lanes and
        # reinterpret them as pcg2d state — every lane then draws the same
        # sequence: image-wide correlated samples that never converge
        # (ADVICE r3, medium). api.Renderer has the same guard.
        raise ValueError("renderer='fused' supports sampler='pcg' only")
    if use_bvh is None:
        use_bvh = scene.geom.num_prims > pt.BRUTE_FORCE_MAX_PRIMS
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    B = cam.width * cam.height
    pad = (-B) % dp
    lanes = jnp.arange(B + pad, dtype=jnp.int32).reshape(dp, (B + pad) // dp)
    lanes = jnp.minimum(lanes, B - 1)  # padded lanes re-render last pixel
    assert spp % sp == 0, (
        f"spp={spp} must divide evenly over the sp axis (sp={sp}); "
        "pad spp or resize the mesh so the requested sample count is honored"
    )
    spp_per = spp // sp

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("dp", None)),
        out_specs=P("dp", None, None),
        # pallas_call out_shapes carry no varying-mesh-axes annotation, so
        # the static vma checker rejects the Pallas forest traversal under
        # shard_map; the collectives here are explicit psums over known axes
        check_vma=False,
    )
    def shard_fn(scene_rep, lane_blk):
        lane_flat = lane_blk[0]
        sp_rank = jax.lax.axis_index("sp")
        # decorrelated per-sp-rank sample window
        sample_base = sp_rank * spp_per + jnp.asarray(sample_base0, jnp.int32)
        acc = _render_tile_lanes(
            scene_rep, cam, md, seed, sample_base, lane_flat, use_bvh, spp_per,
            differentiable, renderer, sampler, fused_pack, fused_max_leaf,
        )
        acc = jax.lax.psum(acc, "sp") / (sp * spp_per)
        return acc[None]

    out = shard_fn(scene, lanes)  # (dp, lanes/dp, 3)
    img = out.reshape(-1, 3)[:B].reshape(cam.height, cam.width, 3)
    return img


def render_train_step(
    scene: T.Scene,
    cam: cam_mod.Camera,
    md: MaxDepthParams,
    target: jnp.ndarray,
    mesh: Mesh,
    spp: int = 1,
    seed: int = 0,
    remat: bool = False,
):
    """One differentiable-render training step (inverse-rendering style).

    remat=True checkpoints each bounce and pass (jax.checkpoint): same
    gradients, backward memory independent of spp and depth — use it when
    the grad render does not fit HBM.

    Loss = MSE(render, target); returns (loss, grads) where grads cover the
    differentiable scene tables (BSDF/emitter/media). Gradients are psum'd
    over the mesh inside the shard_mapped backward (the JAX-native analogue
    of DDP's overlapped gradient all-reduce).
    """

    def loss_fn(p):
        s = scene.replace(
            bsdfs=scene.bsdfs.replace(
                k_d=p["k_d"], k_s=p["k_s"], k_g=p["k_g"],
                eta=p["eta"], k=p["k"], params=p["bsdf_params"],
            ),
            emitters=scene.emitters.replace(
                emission=p["emission"], scaler=p["scaler"]
            ),
            media=scene.media.replace(
                sigma_a=p["sigma_a"], sigma_s=p["sigma_s"], scale=p["med_scale"]
            ),
        )
        img = render_distributed(s, cam, md, spp, mesh, seed=seed,
                                 differentiable="remat" if remat else True)
        return jnp.mean((img - target) ** 2)

    params = diff_params(scene)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return loss, grads


def diff_params(scene: T.Scene) -> dict:
    """The float-valued differentiable parameter set of a scene."""
    return {
        "k_d": scene.bsdfs.k_d,
        "k_s": scene.bsdfs.k_s,
        "k_g": scene.bsdfs.k_g,
        "eta": scene.bsdfs.eta,
        "k": scene.bsdfs.k,
        "bsdf_params": scene.bsdfs.params,
        "emission": scene.emitters.emission,
        "scaler": scene.emitters.scaler,
        "sigma_a": scene.media.sigma_a,
        "sigma_s": scene.media.sigma_s,
        "med_scale": scene.media.scale,
    }
