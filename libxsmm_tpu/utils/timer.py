"""Timing utilities.

Port of the reference timer semantics (include/utils/libxsmm_timer.h:29,
src/libxsmm_timer.c TSC+calibration) to the TPU execution model: wall-clock
ticks plus a device-honest `bench` helper that forces completion with
block_until_ready — the discipline every driver in this repo uses (async
dispatch makes naive timing meaningless on TPU).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax


def tick() -> float:
    """libxsmm_timer_tick analogue (seconds, monotonic)."""
    return time.perf_counter()


def duration(t0: float, t1: float) -> float:
    """libxsmm_timer_duration analogue."""
    return t1 - t0


def bench(fn: Callable, args: Tuple = (), reps: int = 50,
          warmup: int = 2) -> float:
    """Average seconds per call, device-synchronized."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def gflops(nflops: int, seconds: float) -> float:
    return nflops / max(seconds, 1e-12) / 1e9
