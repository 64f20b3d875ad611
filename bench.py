"""Benchmark driver — prints ONE JSON line for the round harness.

Headline metric (BASELINE.md): roofline fraction of the batched 32-class
small GEMM (the reference's smmbench/magazine streaming workload,
/root/reference/samples/utilities/smmbench). The workload is HBM-bound
(5.33 FLOP/byte at 32^3 f32), so the roofline is measured memory bandwidth
times intensity, capped by MXU peak. vs_baseline = fraction / 0.80 (the
BASELINE.json target), so >= 1.0 means target met.

Extras report GFLOP/s for BRGEMM, SpMM nnz/s (fsspmdm + BCSC), and the
measured copy bandwidth, mirroring the reference's per-driver GFLOP/s
reporting via libxsmm_get_kernel_info nflops.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _bench_fn(fn, args, reps=50, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_copy_bw():
    """Effective HBM bandwidth via a big streaming copy (read+write)."""
    import jax
    import jax.numpy as jnp

    nbytes = 256 * 2**20
    x = jnp.ones((nbytes // 4,), jnp.float32)
    f = jax.jit(lambda v: v * 1.000001)
    dt = _bench_fn(f, (x,), reps=20)
    return 2 * nbytes / dt  # bytes/s (read + write)


def bench_batched_smm(geom, bw_bytes):
    import jax.numpy as jnp

    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import GemmFlags, GemmShape

    B, m, n, k = 16384, 32, 32, 32
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, m, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, k, n)), jnp.float32)
    kern = xt.dispatch_gemm_batched(GemmShape(m, n, k), GemmFlags.BETA_0)
    dt = _bench_fn(kern.fn, (a, b), reps=50)
    flops = 2 * B * m * n * k
    bytes_moved = B * (m * k + k * n + m * n) * 4
    gflops = flops / dt / 1e9
    intensity = flops / bytes_moved
    roofline = min(geom.peak_f32_tflops * 1e12, intensity * bw_bytes)
    frac = (flops / dt) / roofline
    return gflops, frac, bytes_moved / dt / 1e9


def bench_brgemm(geom):
    import jax.numpy as jnp

    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                        GemmFlags, GemmShape)
    from libxsmm_tpu.dtypes import Datatype

    br, m, n, k = 1024, 256, 256, 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((br, m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((br, k, n)), jnp.bfloat16)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    kern = xt.dispatch_brgemm(shape, GemmFlags.BETA_0,
                              BatchReduceConfig(BatchReduceType.STRIDE, br))
    dt = _bench_fn(kern.fn, (a, b), reps=20)
    return 2 * br * m * n * k / dt / 1e9  # GFLOP/s


def bench_fsspmdm():
    """nnz/s on a synthetic spectral-element-like operator (the PyFR shape
    class: small dense-ish rows, N streaming)."""
    import jax.numpy as jnp

    from libxsmm_tpu.ops.fsspmdm import fsspmdm_create

    rng = np.random.default_rng(1)
    m, k, n = 125, 75, 4800   # p3 hex-element class, TEST_N default
    a = rng.standard_normal((m, k)).astype(np.float32)
    a[rng.random((m, k)) > 0.3] = 0.0
    h = fsspmdm_create(n, a)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    dt = _bench_fn(h.kernel.fn, (b,), reps=50)
    return h.nnz / dt / 1e9, h.kind  # Gnnz/s


def bench_bcsc_spmm():
    import jax.numpy as jnp

    from libxsmm_tpu.descriptor import GemmFlags, GemmShape, SpgemmConfig
    from libxsmm_tpu.dtypes import Datatype
    from libxsmm_tpu.ops.sparse import BcscMatrix, create_packed_spgemm_bcsc

    rng = np.random.default_rng(2)
    m, k, n, bk, bn = 1024, 1024, 1024, 32, 32
    bmat = rng.standard_normal((k, n)).astype(np.float32)
    keep = rng.random((k // bk, n // bn)) < 0.2
    bmat *= np.kron(keep, np.ones((bk, bn), np.float32))
    bcsc = BcscMatrix.from_dense(bmat, bk, bn)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    kern = create_packed_spgemm_bcsc(shape, GemmFlags.BETA_0,
                                     SpgemmConfig(1, bk, bn),
                                     column_ptr=bcsc.indptr,
                                     row_idx=bcsc.indices)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    v = jnp.asarray(bcsc.data, jnp.bfloat16)
    dt = _bench_fn(kern.fn, (a, v), reps=20)
    nnz = bcsc.nblocks * bk * bn
    return 2 * nnz * m / dt / 1e9, nnz / dt / 1e9  # GFLOP/s, Gnnz/s


def main():
    from libxsmm_tpu.device import get_geometry, on_tpu

    geom = get_geometry()
    bw = measure_copy_bw()
    smm_gflops, frac, smm_gbs = bench_batched_smm(geom, bw)
    brgemm_gflops = bench_brgemm(geom)
    fsspmdm_gnnz, fsspmdm_kind = bench_fsspmdm()
    bcsc_gflops, bcsc_gnnz = bench_bcsc_spmm()

    result = {
        "metric": "batched_smm32_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction",
        "vs_baseline": round(frac / 0.80, 4),
        "extras": {
            "device": geom.name,
            "on_tpu": on_tpu(),
            "copy_bw_gbps": round(bw / 1e9, 1),
            "smm32_f32_gflops": round(smm_gflops, 1),
            "smm32_stream_gbps": round(smm_gbs, 1),
            "brgemm_bf16_gflops": round(brgemm_gflops, 1),
            "fsspmdm_gnnz_per_s": round(fsspmdm_gnnz, 3),
            "fsspmdm_kind": fsspmdm_kind,
            "bcsc_spmm_bf16_gflops": round(bcsc_gflops, 1),
            "bcsc_spmm_gnnz_per_s": round(bcsc_gnnz, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
