"""Timing utilities.

Port of the reference timer semantics (include/utils/libxsmm_timer.h:29,
src/libxsmm_timer.c TSC+calibration) to the TPU execution model: wall-clock
ticks plus device-honest bench helpers.

Two backend hazards shape the discipline here (both measured on the axon
backend, see CLAUDE.md):
  * repeat jit executions with IDENTICAL inputs are memoized — timing loops
    must chain a data dependency through every rep (`bench_chain`);
  * jax.block_until_ready does NOT flush the async pipeline — the only true
    sync is a HOST FETCH of chain-dependent data (`device_sync`).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def tick() -> float:
    """libxsmm_timer_tick analogue (seconds, monotonic)."""
    return time.perf_counter()


def duration(t0: float, t1: float) -> float:
    """libxsmm_timer_duration analogue."""
    return t1 - t0


def device_sync(out) -> float:
    """Force completion of `out` (any pytree) via a 1-element host fetch."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def bench(fn: Callable, args: Tuple = (), reps: int = 50,
          warmup: int = 2) -> float:
    """Average seconds per call, device-synchronized.

    NOTE: with fixed args the runtime may memoize reps; prefer bench_chain
    for kernel-selection decisions.
    """
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / reps


def bench_chain(fn: Callable, args: Tuple, chain_idx: int = 0,
                reps: int = 20, warmup: int = 2, rounds: int = 3,
                min_launch_s: float = 0.05) -> float:
    """Average seconds per call with a data dependency chained through
    args[chain_idx] each rep (a zero-valued output readback folded in), so
    the runtime cannot memoize or dead-code-eliminate the body.

    All reps run INSIDE one launch (lax.fori_loop) AND the rep count is
    CALIBRATED so each launch runs at least `min_launch_s`: per-launch
    overhead on this backend swings 1.2 ms to ~28 ms with the time-sharing
    window — a fixed small rep count silently measures launch overhead
    instead of the kernel in bad windows (every candidate then reads
    launch_ms/reps, and autotunes pick arbitrarily). `reps` is the lower
    bound / first probe size. The final sync is a host fetch
    (block_until_ready does not flush the pipeline)."""
    args = tuple(args)

    def step(x):
        call = [x if i == chain_idx else a for i, a in enumerate(args)]
        out = fn(*call)
        # The chain must consume EVERY output element, or XLA computes only
        # the live part: slice-of-dot rewrites to dot-of-slice (a chain
        # through out[0] times a 2048^2 matmul at 1 row), and
        # optimization-barrier tuples get unused elements DCE'd (a barrier
        # pairing elided the kernel entirely). A full float reduction is
        # un-narrowable, and `total * 0.0` is un-foldable for floats (the
        # value could be NaN/inf), unlike integer mul-by-zero.
        total = sum(jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out))
        zero = (total * 0.0).astype(x.dtype)
        return x.at[(0,) * x.ndim].add(zero)

    def make(r):
        return jax.jit(lambda s: jax.lax.fori_loop(
            0, r, lambda i, ss: step(ss), s))

    looped = make(reps)
    x = args[chain_idx]
    x = looped(x)                      # compile + warmup
    device_sync(x)
    t0 = time.perf_counter()
    x = looped(x)
    device_sync(x)
    t_probe = time.perf_counter() - t0
    if t_probe < min_launch_s:
        # scale reps so launch overhead is amortized below ~launch/target
        reps = min(100000, max(reps + 1,
                               int(reps * 2 * min_launch_s
                                   / max(t_probe, 1e-6))))
        looped = make(reps)
        x = looped(x)                  # compile + warmup at the new count
        device_sync(x)
    best = float("inf")
    for _ in range(max(1, rounds)):
        t0 = time.perf_counter()
        x = looped(x)
        device_sync(x)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def gflops(nflops: int, seconds: float) -> float:
    return nflops / max(seconds, 1e-12) / 1e9


def tickint() -> int:
    """libxsmm_timer_tickint analogue (integer nanosecond ticks)."""
    return time.perf_counter_ns()


def ncycles(t0: int, t1: int) -> int:
    """libxsmm_timer_ncycles analogue: monotonic tick delta (ns units here;
    the reference returns TSC cycles — there is no user-visible cycle
    counter on the TPU host path)."""
    return max(0, int(t1) - int(t0))
