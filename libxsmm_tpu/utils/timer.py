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


def launch_overhead(refresh: bool = False) -> float:
    """Best-of-3 time of a trivial chained launch: the per-launch queue /
    dispatch overhead of the current window. On this backend it swings
    from ~1.2 ms to ~28 ms and can stay degraded for 45+ minutes — any
    per-rep timing must either amortize far past it or subtract it.
    Cached per process; pass refresh=True to re-measure."""
    global _LAUNCH_OVERHEAD, _NULL_FN
    if _LAUNCH_OVERHEAD is not None and not refresh:
        return _LAUNCH_OVERHEAD
    if _NULL_FN is None:
        _NULL_FN = jax.jit(lambda s: s * 1.0000001)   # chains: no memo
    f = _NULL_FN
    x = jnp.full((8, 128), 1.0, jnp.float32)
    x = f(x)
    device_sync(x)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = f(x)
        device_sync(x)
        best = min(best, time.perf_counter() - t0)
    _LAUNCH_OVERHEAD = best
    return best


_LAUNCH_OVERHEAD = None
_NULL_FN = None


class _ChainRunner:
    """One calibrated chained-timing loop (shared by bench_chain and
    bench_chain_interleaved): reps fold inside ONE jit launch via
    lax.fori_loop with a RUNTIME trip count, the chain consumes every
    output leaf (times 0.0) so nothing is memoized/DCE'd, and the rep
    count is calibrated so a launch runs well past the measured per-launch
    overhead.

    The trip count is a traced jit ARGUMENT (fori_loop lowers to
    while_loop), so recalibrating the rep count NEVER recompiles — one
    executable per kernel, any rep count (measured r4: dynamic-n matmul
    loop scales honestly 16->1024 reps with zero recompiles; the r2/r3
    power-of-two quantization existed only because a static trip count
    was part of the compile-cache key).

    The calibration LOOPS until the target is reached: a single one-shot
    rescale (the r2 implementation) diverges in degraded windows — with
    ~28 ms launch overhead the probe time IS the overhead, so one rescale
    lands at overhead^2/(reps*2*target) per rep (~260 us) for every
    candidate regardless of its work (observed in the r3 BCSC probe). The
    measured overhead is also SUBTRACTED from each launch timing.

    `deadline` (absolute time.perf_counter() value) bounds calibration:
    past it the runner keeps whatever rep count it has — degraded
    precision, bounded wall clock (VERDICT r3 #1)."""

    def __init__(self, fn: Callable, args: Tuple, chain_idx: int,
                 reps: int, min_launch_s: float, deadline: float = None):
        args = tuple(args)
        # The chained operand may itself be a pytree — packed GEMM operands
        # are (payload, scales) tuples. Chain through its FIRST leaf: one
        # data dependency per launch is enough to defeat memoization, and
        # the remaining leaves stay loop-invariant like the other args.
        leaves, treedef = jax.tree_util.tree_flatten(args[chain_idx])
        # Every operand rides as a jit ARGUMENT (device-resident once),
        # never a closure constant: constants are re-uploaded per launch
        # (~430us, CLAUDE.md) and that cost would sit OUTSIDE the
        # null-launch subtraction. (Arrays fn itself closes over are out
        # of this runner's reach.)
        nargs = len(args)
        rest_flat, rest_def = jax.tree_util.tree_flatten(
            tuple(a for i, a in enumerate(args) if i != chain_idx))
        rest_dev = [jax.device_put(a) if hasattr(a, "shape") else a
                    for a in rest_flat]
        tail_dev = [jax.device_put(a) if hasattr(a, "shape") else a
                    for a in leaves[1:]]

        def step(x, tail, rest):
            op = jax.tree_util.tree_unflatten(treedef, [x] + list(tail))
            others = iter(jax.tree_util.tree_unflatten(rest_def,
                                                       list(rest)))
            call = [op if i == chain_idx else next(others)
                    for i in range(nargs)]
            out = fn(*call)
            # The chain must consume EVERY output element, or XLA computes
            # only the live part: slice-of-dot rewrites to dot-of-slice (a
            # chain through out[0] times a 2048^2 matmul at 1 row), and
            # optimization-barrier tuples get unused elements DCE'd (a
            # barrier pairing elided the kernel entirely). A full float
            # reduction is un-narrowable, and `total * 0.0` is un-foldable
            # for floats (the value could be NaN/inf), unlike integer
            # mul-by-zero.
            total = sum(jnp.sum(leaf.astype(jnp.float32))
                        for leaf in jax.tree_util.tree_leaves(out))
            zero = (total * 0.0).astype(x.dtype)
            return x.at[(0,) * x.ndim].add(zero)

        def run(s, tail, rest, n):
            return jax.lax.fori_loop(
                0, n, lambda i, ss: step(ss, tail, rest), s)

        jr = jax.jit(run)
        self._looped = lambda s, n: jr(s, tail_dev, rest_dev, n)

        self._null = launch_overhead(refresh=True)
        # the launch must dwarf the overhead even after subtraction
        target = max(min_launch_s, 3.0 * self._null)
        self.reps = max(1, reps)
        x = self._looped(jax.device_put(leaves[0]), 1)  # compile + warmup
        device_sync(x)
        for _ in range(8):
            if deadline is not None and time.perf_counter() >= deadline:
                break                      # degraded-but-bounded (r3 fix)
            t0 = time.perf_counter()
            x = self._looped(x, self.reps)
            device_sync(x)
            t_probe = time.perf_counter() - t0
            if t_probe >= target or self.reps >= 200000:
                break
            # estimate the true per-rep cost net of overhead and size the
            # next launch to ~1.3x target; the dynamic trip count makes
            # this a pure re-run, never a recompile
            per = max((t_probe - self._null) / self.reps, 1e-9)
            want = int((1.3 * target) / per)
            if want <= self.reps:
                break
            self.reps = min(200000, want)
        self._x = x

    def run_once(self, null: float = None) -> float:
        """One timed launch; returns seconds per rep, net of the per-launch
        overhead (clamped so a window improvement between the overhead probe
        and this launch cannot yield <=0). `null` should be an overhead
        measured ADJACENT to this launch (bench_chain* probe one per round
        and share it across candidates) — the construction-time fallback
        can be a different window's and would skew candidate ratios."""
        if null is None:
            null = self._null
        t0 = time.perf_counter()
        self._x = self._looped(self._x, self.reps)
        device_sync(self._x)
        t = time.perf_counter() - t0
        return max(t - null, 0.25 * t) / self.reps


def bench_chain(fn: Callable, args: Tuple, chain_idx: int = 0,
                reps: int = 20, rounds: int = 3,
                min_launch_s: float = 0.05,
                deadline: float = None) -> float:
    """Best seconds per call over `rounds` calibrated chained launches
    (see _ChainRunner for the measurement discipline)."""
    runner = _ChainRunner(fn, args, chain_idx, reps, min_launch_s,
                          deadline=deadline)
    return min(runner.run_once(launch_overhead(refresh=True))
               for _ in range(max(1, rounds)))


def bench_chain_interleaved(cands, reps: int = 20, rounds: int = 3,
                            min_launch_s: float = 0.05,
                            per_round: bool = False,
                            deadline: float = None):
    """Best seconds per call for SEVERAL candidates with their timed
    launches INTERLEAVED round by round: candidate i's round-r launch runs
    adjacent to candidate j's, so every candidate samples the same
    time-share windows and the RATIO between the returned times survives
    any window (a sequential per-candidate loop does not — the device
    throughput swings ~100x between minutes, and whichever candidate ran
    in the bad window loses regardless of merit; VERDICT r2 weak #2).

    cands: iterable of (fn, args, chain_idx). Returns [sec_per_call,...]
    in candidate order; a candidate that fails to build/compile or errors
    mid-run yields None instead of poisoning the others.

    per_round=True additionally returns the raw per-round times
    ([[sec,...] per candidate], None on a failed round) so callers can
    decide on the MEDIAN of same-window paired ratios — a pair of
    candidates measured adjacently within one round shares a window, and
    the median over rounds drops the outlier windows (the bench.py
    paired_ratio discipline; min-of-rounds ratios flip on a single lucky
    draw when the margin is small).
    """
    runners = []
    for fn, args, chain_idx in cands:
        if deadline is not None and time.perf_counter() >= deadline:
            # budget exhausted mid-construction: later candidates are
            # dropped (None) rather than blowing the caller's wall clock
            runners.append(None)
            continue
        try:
            runners.append(_ChainRunner(fn, args, chain_idx, reps,
                                        min_launch_s, deadline=deadline))
        except Exception:
            runners.append(None)
    best = [float("inf") if r is not None else None for r in runners]
    rows = [[] for _ in runners]
    for rnd in range(max(1, rounds)):
        if (deadline is not None and rnd > 0
                and time.perf_counter() >= deadline):
            break                  # every built runner already has 1 round
        # one null per round, shared by every candidate: runner construction
        # is sequential and slow (tunnel compiles), so construction-time
        # nulls can straddle a window change and over/under-subtract one
        # candidate relative to another — the exact skew interleaving exists
        # to prevent. An adjacent same-window probe keeps ratios honest.
        null = launch_overhead(refresh=True)
        for i, r in enumerate(runners):
            if r is None:
                rows[i].append(None)
                continue
            try:
                t = r.run_once(null)
                best[i] = min(best[i], t)
                rows[i].append(t)
            except Exception:
                runners[i] = None
                best[i] = None
                rows[i].append(None)
    if per_round:
        return best, rows
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


class TimerInfo:
    """libxsmm_timer_info analogue (include/utils/libxsmm_timer.h): tsc=1
    means tickint() counts raw hardware cycles; our host path is always the
    OS monotonic nanosecond clock, so tsc is always 0."""

    __slots__ = ("tsc",)

    def __init__(self, tsc: int = 0):
        self.tsc = tsc


def get_timer_info() -> TimerInfo:
    """libxsmm_get_timer_info (src/libxsmm_timer.c:21)."""
    return TimerInfo(tsc=0)
