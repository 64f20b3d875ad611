"""spmm — BCSC B-sparse SpMM driver (xgemm_sparse sample parity).

TPU rendition of the reference's BCSC driver
(/root/reference/samples/xgemm_sparse/spmm_kernel.c): random dense-grid
block sparsification (:68-72), every available lowering strategy checked
against a dense NumPy reference (dense_gemm_ref, :74+), exit-code counts
failures. `--bench` adds chained-timing rates per strategy on the current
backend (honest measurement per CLAUDE.md: full-output consumption,
calibrated rep counts).

Usage: python samples/spmm.py [--bench] [--size N] [--densities d1,d2,...]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from libxsmm_tpu.descriptor import GemmFlags, GemmShape, SpgemmConfig
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import matdiff
from libxsmm_tpu.ops.sparse import BcscMatrix, create_packed_spgemm_bcsc

STRATEGIES = ("dense", "sparse", "pallas", "super", "union", "union2")


def run_case(m, k, n, bk, bn, density, dtype, bench, rng, fails):
    bmat = rng.standard_normal((k, n)).astype(np.float32)
    keep = rng.random((k // bk, n // bn)) < density
    bmat *= np.kron(keep, np.ones((bk, bn), np.float32))
    bcsc = BcscMatrix.from_dense(bmat, bk, bn)
    if bcsc.nblocks == 0:
        return
    a = rng.standard_normal((m, k)).astype(np.float32)

    in_dt = Datatype.BF16 if dtype == "bf16" else Datatype.F32
    shape = GemmShape(m, n, k, a_in_type=in_dt, b_in_type=in_dt,
                      out_type=Datatype.F32)
    if dtype == "bf16":
        import jax.numpy as jnp
        a_dev = jnp.asarray(a, jnp.bfloat16)
        v_dev = jnp.asarray(bcsc.data, jnp.bfloat16)
        ref = np.asarray(a_dev, np.float32) @ _densify(
            bcsc, np.asarray(v_dev, np.float32))
        tol = 2e-2
    else:
        a_dev, v_dev = a, bcsc.data
        ref = a @ bmat
        tol = 1e-5

    for strat in STRATEGIES:
        name = f"{dtype} {m}x{n}x{k} b{bk}x{bn} d{density:g} {strat}"
        try:
            kern = create_packed_spgemm_bcsc(
                shape, GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
                column_ptr=bcsc.indptr, row_idx=bcsc.indices,
                strategy=strat)
        except Exception as e:
            print(f"{name:<44s} SKIP ({type(e).__name__}: {e})")
            continue
        out = np.asarray(kern(a_dev, v_dev), np.float32)
        info = matdiff(ref, out)
        ok = info.normf_rel < tol
        line = f"{name:<44s} {'OK ' if ok else 'FAIL'} " \
               f"normf_rel={info.normf_rel:.2e}"
        if bench:
            from libxsmm_tpu.utils.timer import bench_chain
            import jax.numpy as jnp

            # a_dev rides as a bench_chain ARGUMENT (device-resident once):
            # closed over, it would bake into the runner's jit as a
            # closure constant re-uploaded per launch (CLAUDE.md); the
            # runner's own full-output chain replaces the hand-rolled one
            sec = bench_chain(lambda vv, aa: kern(aa, vv),
                              (jnp.asarray(v_dev), jnp.asarray(a_dev)),
                              chain_idx=0, reps=16)
            nnz = bcsc.nblocks * bk * bn
            line += f"  {2 * nnz * m / sec / 1e9:8.1f} Gflop/s" \
                    f" ({nnz / 1e3:.0f}k nnz)"
        print(line)
        if not ok:
            fails.append(name)


def _densify(bcsc, values):
    k, n = bcsc.shape
    out = np.zeros((k, n), np.float32)
    bk, bn = bcsc.bk, bcsc.bn
    for bc in range(len(bcsc.indptr) - 1):
        for e in range(bcsc.indptr[bc], bcsc.indptr[bc + 1]):
            br = bcsc.indices[e]
            out[br * bk:(br + 1) * bk, bc * bn:(bc + 1) * bn] = values[e]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--size", type=int, default=None,
                    help="m=n=k (default 256, or 1024 with --bench)")
    ap.add_argument("--densities", default="0.05,0.2,0.5")
    args = ap.parse_args()
    size = args.size or (1024 if args.bench else 256)
    densities = [float(d) for d in args.densities.split(",")]

    rng = np.random.default_rng(7)
    fails = []
    for density in densities:
        for bk, bn in ((32, 32), (16, 64)) if not args.bench else ((32, 32),):
            for dtype in ("f32", "bf16"):
                run_case(size, size, size, bk, bn, density, dtype,
                         args.bench, rng, fails)
    print(f"\n{'ALL OK' if not fails else f'{len(fails)} FAILED: {fails}'}")
    sys.exit(len(fails))


if __name__ == "__main__":
    main()
