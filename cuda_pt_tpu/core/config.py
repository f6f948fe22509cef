"""Render configuration dataclasses.

Parity with the reference RenderingConfig / MaxDepthParams / BVHConfig
(src/core/config.h:29-53, src/core/max_depth.h:27-42, parsed in
src/impl/config.cpp:27-157). These are static Python-side configs — they
select compiled program shapes (bounce caps, resolution), so they are NOT
pytree leaves.
"""

from __future__ import annotations

import dataclasses
import enum


class RendererType(str, enum.Enum):
    """Reference enum src/core/enums.cuh:26-37."""

    MEGAKERNEL_PT = "pt"
    WAVEFRONT_PT = "wfpt"
    MEGAKERNEL_LT = "lt"
    VOLUME_PT = "vpt"
    DEPTH = "depth"
    BVH_COST = "bvh-cost"


@dataclasses.dataclass(frozen=True)
class MaxDepthParams:
    max_depth: int = 16  # total bounce cap
    max_diffuse: int = 8
    max_specular: int = 8
    max_transmit: int = 12
    max_volume: int = 8
    # Time-of-flight gating window (reference SUPPORTS_TOF_RENDERING path).
    min_time: float = 0.0
    max_time: float = 0.0  # <= 0 disables ToF gating


@dataclasses.dataclass(frozen=True)
class BVHConfig:
    max_prims_per_leaf: int = 4  # reference max_node_num (1..255)
    cache_level: int = 5  # top tree levels resident in VMEM during traversal
    overlap_w: float = 1.0  # SAH overlap-area penalty weight
    use_sbvh: bool = False
    use_ref_unsplit: bool = False
    # SBVH duplicate-reference budget as a fraction of the prim count
    # (scripts/sbvh_budget_sweep.py measures the tradeoff per scene);
    # None = 0.5 with reference unsplitting, 1.0 without (round-1 defaults)
    dup_budget_frac: float | None = None


@dataclasses.dataclass(frozen=True)
class RenderingConfig:
    renderer: RendererType = RendererType.MEGAKERNEL_PT
    spp: int = 64
    width: int = 512
    height: int = 512
    md: MaxDepthParams = dataclasses.field(default_factory=MaxDepthParams)
    bvh: BVHConfig = dataclasses.field(default_factory=BVHConfig)
    gamma: bool = True
    # Light-tracer / bidirectional knobs (reference config.h:37-41).
    bidirectional: bool = False
    specular_constraint: int = 0
    caustic_scaling: float = 1.0
    seed: int = 0
