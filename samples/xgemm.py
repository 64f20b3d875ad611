"""xgemm — the universal GEMM/BRGEMM kernel tester.

TPU rendition of /root/reference/samples/xgemm/gemm_kernel.c (5415 LoC):
random shape sweeps over dtype/flag/BR axes, golden compare through matdiff
norms, GFLOP/s report from kernel nflops. Exit code 0 only if every case
passes its tolerance (the reference distinguishes reference-kernel runs via
exit codes :29-37; here the jnp oracle IS the gold, so we report per-case).

Usage: python xgemm.py [ncases] [--bench]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                    GemmFlags, GemmShape)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import DEFAULT_MARGINS, matdiff

DTYPES = [
    (Datatype.F32, Datatype.F32, np.float32, "f32"),
    (Datatype.BF16, Datatype.F32, None, "bf16"),
    (Datatype.F64, Datatype.F64, np.float64, "f64"),
]


def run_case(rng, bench=False):
    import jax.numpy as jnp

    m = int(rng.integers(1, 101))
    n = int(rng.integers(1, 101))
    k = int(rng.integers(1, 101))
    adt, odt, npdt, tol_name = DTYPES[rng.integers(0, len(DTYPES))]
    flags = GemmFlags.NONE
    if rng.random() < 0.5:
        flags |= GemmFlags.BETA_0
    trans_a = rng.random() < 0.25
    trans_b = rng.random() < 0.25
    if trans_a:
        flags |= GemmFlags.TRANS_A
    if trans_b:
        flags |= GemmFlags.TRANS_B
    br = int(rng.integers(1, 9)) if rng.random() < 0.4 else 0

    shape = GemmShape(m, n, k, a_in_type=adt, b_in_type=adt, out_type=odt)
    a_shape = (k, m) if trans_a else (m, k)
    b_shape = (n, k) if trans_b else (k, n)
    if br:
        a_shape = (br, *a_shape)
        b_shape = (br, *b_shape)
        kern = xt.dispatch_brgemm(shape, flags,
                                  BatchReduceConfig(BatchReduceType.STRIDE,
                                                    br))
    else:
        kern = xt.dispatch_gemm(shape, flags)

    a64 = rng.standard_normal(a_shape)
    b64 = rng.standard_normal(b_shape)
    if adt == Datatype.BF16:
        a = jnp.asarray(a64, jnp.bfloat16)
        b = jnp.asarray(b64, jnp.bfloat16)
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
    else:
        a = jnp.asarray(a64.astype(npdt))
        b = jnp.asarray(b64.astype(npdt))

    am = np.swapaxes(a64, -1, -2) if trans_a else a64
    bm = np.swapaxes(b64, -1, -2) if trans_b else b64
    ref = (np.einsum("bmk,bkn->mn", am, bm) if br
           else am @ bm)
    if flags & GemmFlags.BETA_0:
        args = (a, b)
    else:
        c64 = rng.standard_normal((m, n))
        c = jnp.asarray(c64.astype(npdt if npdt is not None else np.float32))
        ref = ref + np.asarray(c, np.float64)
        args = (a, b, c)

    t0 = time.perf_counter()
    out = kern(*args)
    import jax
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    info = matdiff(ref, np.asarray(out, np.float64))
    margin = DEFAULT_MARGINS[tol_name] * max(1.0, np.sqrt(k * max(1, br)))
    ok = info.normf_rel <= margin or info.linf_abs <= margin
    label = (f"{'brgemm' if br else 'gemm'} {tol_name} "
             f"{m}x{n}x{k}{f' br={br}' if br else ''} "
             f"{'tA' if trans_a else ''}{'tB' if trans_b else ''} "
             f"beta={0 if flags & GemmFlags.BETA_0 else 1}")
    gflops = ""
    if bench:
        # chained-in-one-launch + host-fetch sync (see utils.timer)
        from libxsmm_tpu.utils.timer import bench_chain
        per = bench_chain(kern, args, chain_idx=0, reps=50)
        gflops = f"  {xt.get_kernel_info(kern).nflops / per / 1e9:8.1f} GF/s"
    print(f"{'OK  ' if ok else 'FAIL'} {label:48s} "
          f"normf_rel={info.normf_rel:.2e}{gflops}")
    return ok


def main():
    ncases = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    bench = "--bench" in sys.argv
    rng = np.random.default_rng(20260816)
    results = [run_case(rng, bench) for _ in range(ncases)]
    info = xt.get_registry_info()
    print(f"\n{sum(results)}/{len(results)} passed; registry: "
          f"{info['nkernels']} kernels, {info['hits']} hits")
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
