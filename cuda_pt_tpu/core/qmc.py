"""Owen-scrambled Sobol (0,2)-sequence sampler — padded 2D pairs.

Quasi-Monte-Carlo upgrade over the pcg2d stream sampler (core/rng.py); the
reference ships only xorshift-style samplers (src/core/sampler.cuh), so this
is a beyond-parity quality feature. Design follows the publicly documented
production recipe (Burley, "Practical Hash-based Owen Scrambling", JCGT
2020): every consecutive PAIR of path dimensions uses the same base-2 Sobol
(0,2) sequence — dimension A is van der Corput (bit reversal), dimension B
the classic second Sobol dimension (direction numbers v ^= v >> 1) — with

- a per-(pixel, dim-pair) *index shuffle* (Laine-Karras style hash on
  reversed bits), decorrelating pairs from each other, and
- a per-(pixel, dim-pair, component) *Owen scramble* of the value, keeping
  every elementary-interval stratification of the (0,2) sequence intact.

The result: each pixel's samples 0..2^m-1 of any dimension pair are exactly
stratified on every 2^a × 2^b grid with a+b=m (the property the tests pin
down), pixels are mutually decorrelated, and the whole thing is branchless
u32 bit arithmetic — VPU-native, no tables, no gathers.

State layout is (..., 4) uint32: [sample_index, dim, key_hi, key_lo].
``core.rng.next1d/next2d/discrete1d`` dispatch on the trailing dimension
(2 = pcg2d stream, 4 = this sampler), so every draw site in the renderers
works with either sampler unchanged. Lanes that consume different dimension
counts (divergent control flow) stay consistent: each lane carries its own
dim counter. Dimensions beyond MAX_DIMS fall back to the pcg2d hash of
(index, dim, key) — deep-bounce draws lose stratification, never
correctness.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import rng as prng

_U32 = jnp.uint32

# Stratified dimensions per path before falling back to hash draws. The
# first pairs are the valuable ones (pixel jitter, lens, first-bounce BSDF).
MAX_DIMS = 64

# Direction numbers of the classic Sobol second dimension: v_0 = 1<<31,
# v_{k+1} = v_k ^ (v_k >> 1) (Pascal-matrix recurrence).
_V2 = np.zeros(32, np.uint32)
_v = np.uint32(1 << 31)
for _k in range(32):
    _V2[_k] = _v
    _v = np.uint32(_v ^ (_v >> np.uint32(1)))
_V2 = jnp.asarray(_V2)

_INV_U32 = jnp.float32(2.3283064365386963e-10)


def _reverse_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = ((x & _U32(0x55555555)) << 1) | ((x >> 1) & _U32(0x55555555))
    x = ((x & _U32(0x33333333)) << 2) | ((x >> 2) & _U32(0x33333333))
    x = ((x & _U32(0x0F0F0F0F)) << 4) | ((x >> 4) & _U32(0x0F0F0F0F))
    x = ((x & _U32(0x00FF00FF)) << 8) | ((x >> 8) & _U32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _lk_hash(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras-style hash: output bit k depends only on input bits <= k
    (the reversed-bit form of an Owen scramble). Constants from Burley,
    JCGT 2020 (public domain listing)."""
    x = x + seed
    x = x ^ (x * _U32(0x6C50B47C))
    x = x ^ (x * _U32(0xB82F1E52))
    x = x ^ (x * _U32(0xC7AFE638))
    x = x ^ (x * _U32(0x8D22F6E6))
    return x


def _owen_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen scramble of a [0,1)-as-u32 value: bit k of the output depends
    only on bits above k — preserves every elementary interval."""
    return _reverse_bits(_lk_hash(_reverse_bits(x), seed))


def _sobol2(idx: jnp.ndarray) -> jnp.ndarray:
    """Second Sobol dimension at index idx (XOR of set-bit direction nums)."""
    bits = (idx[..., None] >> jnp.arange(32, dtype=_U32)) & _U32(1)
    terms = jnp.where(bits.astype(bool), _V2, _U32(0))
    # XOR-reduce over the bit axis (associative fold of 32 constants)
    out = terms[..., 0]
    for k in range(1, 32):
        out = out ^ terms[..., k]
    return out


def _mix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One-round integer mix for key derivation (finalizer-style)."""
    h = a ^ (b * _U32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    return h ^ (h >> 16)


def seed(base_seed, lane_idx: jnp.ndarray, sample_idx) -> jnp.ndarray:
    """Sampler state for (scene seed, pixel lane, sample index).

    Unlike prng.seed, the sample index must be passed separately — folding
    it into the seed (the stream sampler's trick) would give every sample an
    unrelated scramble and destroy the low-discrepancy property.
    """
    s = jnp.asarray(base_seed, _U32)
    lane = lane_idx.astype(_U32)
    idx = jnp.broadcast_to(jnp.asarray(sample_idx, _U32), lane.shape)
    key_hi = _mix(lane, s)
    key_lo = _mix(lane ^ _U32(0xDEADBEEF), s + _U32(0x632BE59B))
    dim = jnp.zeros_like(lane)
    return jnp.stack([idx, dim, key_hi, key_lo], axis=-1)


def _component(idx, dim, key_hi, key_lo):
    """One scrambled Sobol component: pair = dim>>1, component = dim&1."""
    pair = dim >> 1
    comp = dim & _U32(1)
    pair_key = _mix(key_hi, pair)
    shuffled = _reverse_bits(_lk_hash(_reverse_bits(idx), pair_key))
    base = jnp.where(comp == 0, _reverse_bits(shuffled), _sobol2(shuffled))
    value_key = _mix(key_lo, (pair << 1) | comp)
    scrambled = _owen_scramble(base, value_key)
    # beyond MAX_DIMS: plain hash draw (correct, just not stratified)
    fallback = _mix(_mix(key_hi ^ key_lo, dim), idx)
    return jnp.where(dim < _U32(MAX_DIMS), scrambled, fallback)


def next2d(state: jnp.ndarray):
    idx, dim = state[..., 0], state[..., 1]
    key_hi, key_lo = state[..., 2], state[..., 3]
    # align 2D draws to a pair boundary: a draw straddling two pairs would
    # get two unrelated components instead of a true (0,2) 2D point
    dim = (dim + _U32(1)) & ~_U32(1)
    a = _component(idx, dim, key_hi, key_lo)
    b = _component(idx, dim + _U32(1), key_hi, key_lo)
    u = jnp.stack([a, b], axis=-1).astype(jnp.float32) * _INV_U32
    new_state = jnp.stack([idx, dim + _U32(2), key_hi, key_lo], axis=-1)
    return u, new_state


def next1d(state: jnp.ndarray):
    idx, dim = state[..., 0], state[..., 1]
    key_hi, key_lo = state[..., 2], state[..., 3]
    a = _component(idx, dim, key_hi, key_lo)
    new_state = jnp.stack([idx, dim + _U32(1), key_hi, key_lo], axis=-1)
    return a.astype(jnp.float32) * _INV_U32, new_state


def discrete1d(state: jnp.ndarray, n):
    u, new_state = next1d(state)
    i = jnp.minimum((u * n).astype(jnp.int32), jnp.asarray(n - 1, jnp.int32))
    return i, new_state


def make_state(sampler: str, base_seed, lane_idx, sample_idx) -> jnp.ndarray:
    """Renderer entry helper: 'pcg' stream state or 'sobol' QMC state."""
    if sampler == "sobol":
        return seed(base_seed, lane_idx, sample_idx)
    assert sampler == "pcg", sampler
    return prng.seed(
        jnp.asarray(base_seed, _U32)
        + jnp.asarray(sample_idx, _U32) * _U32(9781),
        lane_idx,
    )
