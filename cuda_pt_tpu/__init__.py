"""cuda_pt_tpu — a TPU-native differentiable path tracer in JAX/XLA/Pallas.

A from-scratch re-design (NOT a port) of the capability surface of the
reference CUDA renderer (Enigmatisms/cuda-pt, mounted at /root/reference):

- Wavefront unidirectional path tracing as a ``lax.while_loop`` over bounces
  with SoA ray buffers and argsort/gather stream compaction
  (reference: src/pt_impl/megakernel_pt.cu, src/pt_impl/wavefront_pt.cu).
- Host-built stackless SAH BVH traversed by batched JAX / Pallas kernels
  (reference: src/impl/bvh.cu, src/renderer/tracing_func.cuh).
- Mitsuba-style XML scenes, OBJ meshes + analytic spheres, 8 BSDF families,
  area/point/spot/envmap emitters, textures
  (reference: src/impl/scene.cu, src/bsdf/).
- Homogeneous + grid volumetric media with delta/ratio tracking
  (reference: src/volume/).
- Differentiable end-to-end (new capability, see BASELINE.json north star).
- Multi-chip/multi-host scaling via jax.sharding Mesh + shard_map with tile
  sharding and psum image/grad reduction (replacing scripts/ddp_render.py's
  PyTorch-DDP/NCCL path).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level exports (keep `import cuda_pt_tpu` cheap — no jax import)
    if name == "Renderer":
        from .api import Renderer

        return Renderer
    if name == "PythonRenderer":
        from .pyrender import PythonRenderer

        return PythonRenderer
    if name == "load_xml":
        from .scene.xml_parser import load_xml

        return load_xml
    raise AttributeError(name)
