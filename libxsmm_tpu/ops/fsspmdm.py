"""FsSpMDM: fixed-sparsity sparse-A x dense-B with create-time autotune.

Semantics port of /root/reference/src/libxsmm_fsspmdm.c (561 LoC), the
north-star workload (PyFR/GiMMiK spectral-element operators):

  create(N, a_dense, alpha, beta)  -> handle     (:24-489)
  execute(handle, B[, C])          -> C          (:491-515)

As in the reference, create() builds BOTH candidate kernels and
micro-benchmarks them on the actual device, then keeps the winner:
  * dense:  A densified (alpha folded in) as a trace-time constant, one MXU
    matmul — the analogue of the reference's dense fallback GEMM (:184-188).
  * sparse: pattern+values baked ELL kernel via create_spgemm_csr_areg —
    the analogue of the 1x/2x/4x-vector-width A-in-registers kernels
    (:243-262). (On TPU the width variants collapse: XLA picks lane tiling.)

Selection applies a dense bias (default 10%, XSMM_TPU_FSSPMDM_DENSE_BIAS,
reference LIBXSMM_FSSPMDM_DENSE_BIAS :16-17) and honors the hint override
(XSMM_TPU_FSSPMDM_HINT: 0 auto | 1 sparse | 2 dense; reference
LIBXSMM_FSSPMDM_HINT :35-36). Tuning reps default 250
(XSMM_TPU_FSSPMDM_NTUNE, matching the reference :19-21), chained inside
one launch (utils.timer.bench_chain).

Expect dense to win for PyFR/EDGE-class shapes: A is baked device-resident
either way, so sparsity saves no HBM traffic — the per-call traffic is B+C
for both candidates, and dense keeps all FLOPs on the MXU. That inverts
the reference's economics (on CPUs, skipping zero FLOPs is the win); the
sparse candidate matters only when m*k is large enough that the dense
matmul's wasted FLOPs exceed the bandwidth budget.

On TPU there is no need for the reference's N-chunking loop (:498-515):
XLA tiles the N dimension. Alpha is folded into A values exactly as the
reference does (:196-236); beta must be 0 or 1 (:80-120).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CONFIG
from ..descriptor import GemmFlags, GemmShape
from ..dtypes import Datatype, from_jnp, to_jnp
from ..registry import Kernel, KernelInfo
from .gemm import _ensure_x64, matmul_precision
from .sparse import CsrMatrix, create_spgemm_csr_areg


@dataclasses.dataclass
class Fsspmdm:
    """Handle mirroring libxsmm_fsspmdm (include/libxsmm_fsspmdm.h:17-24)."""

    m: int
    n: int
    k: int
    beta: int
    kernel: Kernel
    kind: str                 # "dense" | "sparse"
    nnz: int
    tuned_us: dict            # per-candidate microbench results

    def execute(self, b, c=None):
        """C = A @ B (+ C if beta=1); b: (k, n)."""
        if self.beta == 0:
            return self.kernel(b)
        if c is None:
            raise ValueError("beta=1 requires the C operand")
        return self.kernel(b, c)

    def __call__(self, b, c=None):
        return self.execute(b, c)


def _autotune_cache():
    """Persistent KV log for autotune picks (XSMM_TPU_AUTOTUNE_CACHE path);
    None when disabled or the native library is unavailable."""
    path = CONFIG.autotune_cache_path
    if not path:
        return None
    try:
        from ..native_bridge import PersistentKv
        return PersistentKv(path)
    except Exception:
        return None


def _bench_candidates(cands, reps: int, rounds: int = 3,
                      min_launch_s: float = 0.05) -> list:
    """Microseconds per call for each (fn, args) candidate, measured with
    launches INTERLEAVED across rounds (utils.timer.bench_chain_interleaved)
    so the dense/sparse ratio survives time-share window drift — a
    sequential single-shot comparison picks whichever candidate ran in the
    better window (VERDICT r2 weak #2). Chained through B (args[0]):
    fixed-arg loops are memoized by the runtime and block_until_ready does
    not actually sync (CLAUDE.md). A candidate that fails to compile or
    errors mid-run yields None (the interleaved bencher's contract).
    Module-level for test injection. Returns (times_us, ratio_0_over_1):
    the ratio is the MEDIAN of same-round time(cand0)/time(cand1) pairs —
    for a marginal decision (sparse ~15% past a 10% bias) the min-of-
    rounds comparison flips on one lucky draw; the paired-round median
    does not (the bench.py paired_ratio discipline, observed: the r3
    bench's autotuned pick disagreed with its own interleaved
    measurement)."""
    from ..utils.timer import bench_chain_interleaved
    times, rows = bench_chain_interleaved(
        [(fn, args, 0) for fn, args in cands],
        reps=reps, rounds=rounds, min_launch_s=min_launch_s,
        per_round=True)
    ratio = None
    if len(rows) == 2:
        pairs = sorted(a / b for a, b in zip(rows[0], rows[1])
                       if a is not None and b is not None and b > 0)
        if pairs:
            ratio = pairs[len(pairs) // 2]
    return [None if t is None else t * 1e6 for t in times], ratio


def fsspmdm_create(n: int, a_dense, alpha: float = 1.0, beta: int = 0,
                   dtype: Optional[Datatype] = None) -> Fsspmdm:
    """libxsmm_fsspmdm_create analogue.

    a_dense: (m, k) host array whose ZERO PATTERN is fixed for the handle's
    lifetime; alpha is folded into the stored values (:196-236).
    """
    a = np.asarray(a_dense)
    m, k = a.shape
    if beta not in (0, 1):
        raise ValueError("beta must be 0 or 1 (reference restriction)")
    if dtype is None:
        dtype = from_jnp(a.dtype)
    else:
        # honor the DECLARED handle precision: the stored A (baked dense
        # operand AND the CSR values) must live in `dtype`, not whatever
        # precision the caller's array happened to arrive in (reference
        # handles are templated on the element type, libxsmm_fsspmdm.c)
        a = a.astype(np.dtype(to_jnp(dtype)))
    av = (alpha * a).astype(a.dtype)
    csr = CsrMatrix.from_dense(av)
    nnz = csr.nnz

    shape = GemmShape(m, n, k, a_in_type=dtype, b_in_type=dtype,
                      out_type=dtype)
    _ensure_x64(shape)
    flags = GemmFlags.BETA_0 if beta == 0 else GemmFlags.NONE

    # candidate 1: dense MXU matmul with baked A.
    # NOTE: baked arrays are bound as device-resident ARGUMENTS, not jit
    # closure constants — closure constants are re-uploaded per call
    # (measured ~430us/call through the device tunnel vs ~20us as args).
    comp = to_jnp(shape.comp_type)
    out_dt = to_jnp(dtype)
    prec = matmul_precision(shape)
    a_dev = jax.device_put(jnp.asarray(av))

    @jax.named_scope(f"xsmm_fsspmdm_dense_{m}x{n}x{k}")
    def dense_run(a_c, b, c=None):
        acc = jnp.dot(a_c.astype(comp), b.astype(comp),
                      preferred_element_type=comp, precision=prec)
        if c is not None:
            acc = acc + c.astype(comp)
        return acc.astype(out_dt)

    dense_jit = jax.jit(dense_run)

    def dense_fn(b, c=None):
        if c is None:
            return dense_jit(a_dev, b)
        return dense_jit(a_dev, b, c)

    dense_kernel = Kernel(
        fn=dense_fn, descriptor=("fsspmdm_dense", shape),
        info=KernelInfo(kind="fsspmdm_dense", nflops=2 * m * n * k),
        name=f"fsspmdm_dense_{m}x{n}x{k}")

    # candidate 2: pattern+values-baked sparse kernel
    sparse_kernel = None
    if nnz > 0:
        try:
            sparse_kernel = create_spgemm_csr_areg(
                shape, flags, csr.indptr, csr.indices, csr.data)
        except ValueError:
            sparse_kernel = None   # nnz over cap -> dense only

    # persistent autotune decisions (native KV log; SURVEY.md §5.4 — the
    # TPU analogue of AOT static kernels persisting across runs). v3
    # format stores a bounded HISTORY of measured dense/sparse ratios
    # ("r1,r2,...,r9"); the pick is decided on the MEDIAN of the history
    # plus this create's fresh measurement, so a single drought-window
    # draw cannot flip a persisted decision — flipping requires the
    # aggregate median itself to cross the dense-bias threshold
    # (VERDICT r3 #8: stabilize the tall-sparse margin; the reference's
    # 250-rep discipline buys the same stability in one process,
    # /root/reference/src/libxsmm_fsspmdm.c:285-382).
    cache = _autotune_cache()
    cache_key = (f"fsspmdm3:{m}:{n}:{k}:{beta}:{dtype.value}:"
                 f"{csr.fingerprint(include_values=True):x}").encode()
    _HISTORY_CAP = 9
    history = []
    if cache is not None:
        raw = cache.get(cache_key)
        if raw:
            try:
                history = [float(t) for t in raw.decode().split(",") if t]
            except ValueError:
                history = []

    # re-read the env at create time like the reference (getenv inside
    # libxsmm_fsspmdm_create, src/libxsmm_fsspmdm.c:35-36) — CONFIG only
    # snapshots import-time values
    from ..config import _env_int
    hint = _env_int("XSMM_TPU_FSSPMDM_HINT", CONFIG.fsspmdm_hint)
    tuned = {}
    rng = np.random.default_rng(0)

    def _tune_args():
        b_probe = jnp.asarray(rng.standard_normal((k, n)), to_jnp(dtype))
        return ((b_probe,) if beta == 0 else
                (b_probe, jnp.zeros((m, n), to_jnp(dtype))))

    def _decide():
        """Measure the dense/sparse ratio this window (full tune when no
        history exists; a lighter probe when revalidating), fold it into
        the persisted history, and decide on the aggregate median."""
        args = _tune_args()
        if history:
            tuned["cached"] = True
            reps, rounds, min_launch = 8, 3, 0.02
        else:
            reps, rounds, min_launch = max(1, CONFIG.fsspmdm_ntune), 3, 0.05
        times, ratio = _bench_candidates(
            [(dense_kernel.fn, args), (sparse_kernel.fn, args)],
            reps, rounds=rounds, min_launch_s=min_launch)
        if times[0] is None and times[1] is None and not history:
            return dense_kernel, "dense"   # transient device failure: the
        if times[0] is None and times[1] is not None and not history:
            return sparse_kernel, "sparse"  # plain-XLA path is the safe bet
        if times[1] is None and times[0] is not None and not history:
            return dense_kernel, "dense"   # sparse candidate failed
        if times[0] is not None:
            tuned["dense_us"] = times[0]
        if times[1] is not None:
            tuned["sparse_us"] = times[1]
        if ratio is None and times[0] is not None and times[1] is not None:
            ratio = times[0] / max(times[1], 1e-9)
        if ratio is not None:
            tuned["dense_over_sparse"] = round(ratio, 4)
            history.append(ratio)
        del history[:-_HISTORY_CAP]
        if not history:
            return dense_kernel, "dense"
        agg = sorted(history)[len(history) // 2]
        tuned["ratio_history"] = [round(r, 4) for r in history]
        tuned["ratio_median"] = round(agg, 4)
        # dense bias: prefer dense unless sparse is >bias faster (:311-330)
        bias = 1.0 + CONFIG.fsspmdm_dense_bias
        kd = "sparse" if agg > bias else "dense"
        if cache is not None:
            cache.put(cache_key,
                      ",".join(f"{r:.5f}" for r in history).encode())
        return (sparse_kernel if kd == "sparse" else dense_kernel), kd

    if hint == 2 or sparse_kernel is None:
        pick, kind = dense_kernel, "dense"
    elif hint == 1:
        pick, kind = sparse_kernel, "sparse"
    else:
        # create-time microbenchmark on device (:285-382), interleaved;
        # persisted ratio history aggregated across processes
        pick, kind = _decide()

    if CONFIG.verbose >= 2:
        print(f"libxsmm_tpu: fsspmdm {m}x{n}x{k} nnz={nnz} -> {kind} "
              f"({tuned})")
    return Fsspmdm(m=m, n=n, k=k, beta=beta, kernel=pick, kind=kind,
                   nnz=nnz, tuned_us=tuned)


def fsspmdm_execute(handle: Fsspmdm, b, c=None):
    """libxsmm_fsspmdm_execute analogue."""
    return handle.execute(b, c)


def fsspmdm_destroy(handle: Fsspmdm) -> None:
    """API parity (libxsmm_fsspmdm_destroy); kernels are GC-managed."""
    handle.kernel = None


# ---------------------------------------------------------------------------
# Typed wrappers (reference include/libxsmm_fsspmdm.h:17-45:
# libxsmm_dfsspmdm_* pins f64, libxsmm_sfsspmdm_* pins f32; both alias
# the generic handle)
# ---------------------------------------------------------------------------

def dfsspmdm_create(n: int, a_dense, alpha: float = 1.0,
                    beta: int = 0) -> Fsspmdm:
    """libxsmm_dfsspmdm_create: double-precision pinned handle."""
    return fsspmdm_create(n, np.asarray(a_dense, np.float64), alpha, beta,
                          dtype=Datatype.F64)


def sfsspmdm_create(n: int, a_dense, alpha: float = 1.0,
                    beta: int = 0) -> Fsspmdm:
    """libxsmm_sfsspmdm_create: single-precision pinned handle."""
    return fsspmdm_create(n, np.asarray(a_dense, np.float32), alpha, beta,
                          dtype=Datatype.F32)


def dfsspmdm_execute(handle: Fsspmdm, b, c=None):
    """libxsmm_dfsspmdm_execute (include/libxsmm_fsspmdm.h:40)."""
    return handle.execute(jnp.asarray(b, jnp.float64),
                          None if c is None else jnp.asarray(c, jnp.float64))


def sfsspmdm_execute(handle: Fsspmdm, b, c=None):
    """libxsmm_sfsspmdm_execute (include/libxsmm_fsspmdm.h:41)."""
    return handle.execute(jnp.asarray(b, jnp.float32),
                          None if c is None else jnp.asarray(c, jnp.float32))


def dfsspmdm_destroy(handle: Fsspmdm) -> None:
    fsspmdm_destroy(handle)


def sfsspmdm_destroy(handle: Fsspmdm) -> None:
    fsspmdm_destroy(handle)
