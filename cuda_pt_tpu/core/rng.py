"""Counter-free stateful SoA RNG for the render loop.

TPU-native replacement for the reference's TinySampler (xorshift128 in 2xu32
state, src/core/sampler.cuh:28-168). We keep the same design point — tiny
per-ray state advanced in the hot loop, NOT a cryptographic counter RNG —
because the bounce loop consumes many draws per ray and threefry would burn
VPU cycles for no variance benefit.

State is a (..., 2) uint32 array (one pair per ray lane). The advance step is
the pcg2d hash of Jarzynski & Olano, "Hash Functions for GPU Rendering" (JCGT
2020) — public-domain construction with good equidistribution, implemented
here from the published formula. Seeding mixes (seed, lane index) through one
pcg2d round so adjacent pixels are decorrelated (the reference salts seeds
per rank the same way, scripts/ddp_render.py:141-143).

Everything is pure: functions return (value, new_state).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
# 1/2^32 — maps uint32 to [0, 1)
_INV_U32 = jnp.float32(2.3283064365386963e-10)


def _pcg2d(v: jnp.ndarray) -> jnp.ndarray:
    """One pcg2d mixing round on a (..., 2) uint32 array."""
    x = v[..., 0]
    y = v[..., 1]
    x = x * _U32(1664525) + _U32(1013904223)
    y = y * _U32(1664525) + _U32(1013904223)
    x = x + y * _U32(1664525)
    y = y + x * _U32(1013904223)
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    x = x + y * _U32(1664525)
    y = y + x * _U32(1013904223)
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    return jnp.stack([x, y], axis=-1)


def seed(base_seed, lane_idx: jnp.ndarray) -> jnp.ndarray:
    """Build per-lane state from a scalar seed and (...,) int lane indices."""
    s = jnp.asarray(base_seed, dtype=_U32)
    idx = lane_idx.astype(_U32)
    v = jnp.stack([idx ^ (s * _U32(0x9E3779B9)), s + idx * _U32(0x85EBCA6B)], axis=-1)
    return _pcg2d(_pcg2d(v))


def next2d(state: jnp.ndarray):
    """Draw two uniforms in [0,1). Returns ((..., 2) float32, new_state).

    Dispatches on the state layout: (..., 2) = pcg2d stream, (..., 4) =
    Owen-scrambled Sobol (core/qmc.py) — so every draw site works with
    either sampler unchanged. The dispatch is on a static shape, free
    under jit."""
    if state.shape[-1] == 4:
        from . import qmc

        return qmc.next2d(state)
    new_state = _pcg2d(state)
    u = new_state.astype(jnp.float32) * _INV_U32
    return u, new_state


def next1d(state: jnp.ndarray):
    """Draw one uniform in [0,1). Returns ((...,) float32, new_state)."""
    if state.shape[-1] == 4:
        from . import qmc

        return qmc.next1d(state)
    u, new_state = next2d(state)
    return u[..., 0], new_state


def discrete1d(state: jnp.ndarray, n):
    """Draw an integer in [0, n). Mirrors TinySampler::discrete1D."""
    u, new_state = next1d(state)
    idx = jnp.minimum((u * n).astype(jnp.int32), jnp.asarray(n - 1, jnp.int32))
    return idx, new_state
