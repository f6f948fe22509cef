"""Honest wall-clock timing under the axon TPU tunnel.

Round-3 discovery (probe history in docs/TUNNEL.md): through the tunnel,
``block_until_ready()`` returns when the dispatch is *accepted*, not when
execution finishes — 100 chained 4096³ matmuls "complete" in 0.1 ms by that
clock. Every round-2 on-chip number measured that way (ONCHIP_DISSECT's flat
~0.4 µs/lane "cost floor", the 26 ms per-call constant) was tunnel dispatch
latency, not compute. The only event that provably fences execution is a
device→host readback, which has its own quirks:

- the FIRST readback in a process stalls ~270-350 s (a one-shot claim/grant
  handshake; subsequent readbacks are ~30 ms for scalars, ~5 MB/s for bulk);
- single device calls whose execution runs past ~60 s die
  ("TPU device error"), so timed regions must stay well under that.

This module provides readback-fenced timing:

``warm_readback()``      pay the one-time stall explicitly (call it early so
                         it overlaps nothing you care about).
``force(x)``             fence: readback one element of x (post-warm ~30 ms).
``timeit(fn, *args)``    median of readback-fenced call times, minus the
                         measured fence baseline.
``loop_cost(step, init, n)``  per-iteration cost of ``step`` measured by the
                         difference T(n) - T(n//2) of on-device fori_loops —
                         immune to any fixed per-call offset. ``step`` must
                         thread its state (data dependence) or XLA hoists it.

On CPU (and any backend where block_until_ready is trustworthy) the fence
degrades to block_until_ready, so the same harness runs everywhere.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _is_tunnel() -> bool:
    return jax.default_backend() not in ("cpu",)


def warm_readback(timeout_note: bool = True) -> float:
    """Pay the one-time first-readback stall; returns its duration (s).

    Idempotent: after the first call (in this or any earlier code path that
    did a readback) it costs one cheap fence.
    """
    t0 = time.perf_counter()
    x = jnp.ones((8,), jnp.float32)
    jax.device_get(x * 2.0)
    return time.perf_counter() - t0


def force(x) -> None:
    """Fence: guarantee every op feeding ``x`` has executed."""
    if _is_tunnel():
        leaf = jax.tree_util.tree_leaves(x)[0]
        jax.device_get(jnp.ravel(leaf)[:1])
    else:
        jax.block_until_ready(x)


def host_count(count_fn, *args) -> int:
    """Run a scalar counting function on the HOST CPU backend.

    Why this exists (docs/TUNNEL.md §5, solved 2026-08-20): through the
    axon tunnel, a single device call whose execution runs past ~60 s kills
    the TPU worker ("TPU worker process crashed or restarted"). The
    composed ``count_rays`` on a big mesh (whiskey, 68k prims, depth 16,
    256²) is exactly such a call — it was the real cause of what three
    rounds of notes recorded as "whiskey-scale fused-kernel instability":
    the fused render completed fine and the *ray counter after it* killed
    the worker. Ray counts are integer-RNG-driven and backend-invariant,
    so every bench/experiment script counts on CPU via this helper.
    """
    cpu = jax.devices("cpu")[0]
    args = jax.device_put(args, cpu)
    with jax.default_device(cpu):
        return int(jax.device_get(jax.jit(count_fn)(*args)))


def fence_baseline(reps: int = 5) -> float:
    """Median cost of force() on an already-materialized array."""
    x = jnp.ones((8,), jnp.float32)
    force(x * 1.0)
    ts = []
    for _ in range(reps):
        y = x * 1.0
        t0 = time.perf_counter()
        force(y)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timeit(fn, *args, reps: int = 3, warm: bool = True,
           baseline: float | None = None) -> float:
    """Median readback-fenced wall time of fn(*args), minus fence baseline.

    The first (warm) call compiles AND pays any residual one-time costs.
    """
    if warm:
        force(fn(*args))
    if baseline is None:
        baseline = fence_baseline() if _is_tunnel() else 0.0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    # Floor at 1 ns, not 0: callers divide by this (rays/dt) and a
    # baseline-dominated fast call must not produce ZeroDivisionError
    # (ADVICE r4: EXP_SWF lost its cornell control row to exactly that).
    return max(ts[len(ts) // 2] - baseline, 1e-9)


def timeit_stats(fn, *args, reps: int = 5, warm: bool = True,
                 baseline: float | None = None) -> dict:
    """Readback-fenced timing with run-to-run spread (VERDICT r3 weak #4:
    one-shot headline numbers spread ±10% with nothing quantifying it).

    Returns {"median", "mean", "std", "n", "samples"} in seconds, each
    fence-baseline-subtracted.
    """
    import statistics

    if warm:
        force(fn(*args))
    if baseline is None:
        baseline = fence_baseline() if _is_tunnel() else 0.0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(max(time.perf_counter() - t0 - baseline, 0.0))
    ts.sort()
    return {
        "median": ts[len(ts) // 2],
        "mean": statistics.fmean(ts),
        "std": statistics.pstdev(ts) if len(ts) > 1 else 0.0,
        "n": reps,
        "samples": [round(t, 5) for t in ts],
    }


def loop_cost(step, init, n: int, reps: int = 3):
    """Per-iteration cost of ``step`` via the T(n) - T(n//2) difference.

    step: state -> state (a pytree; MUST consume its input or XLA hoists the
    body and the measurement collapses to zero — that collapse is itself
    detectable: a per-iter cost ~0 means the body was optimized away).
    Returns (sec_per_iter, T_n, T_half).
    """
    half = max(n // 2, 1)

    def run(k):
        f = jax.jit(lambda s: jax.lax.fori_loop(0, k, lambda i, t: step(t), s))
        return timeit(f, init, reps=reps)

    t_half = run(half)
    t_full = run(2 * half)
    return max(t_full - t_half, 0.0) / half, t_full, t_half
