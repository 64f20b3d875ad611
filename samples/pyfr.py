"""pyfr — fixed-sparsity SpMM driver on spectral-element operators.

TPU rendition of /root/reference/samples/xgemm_sparse_Ainregs
(pyfr_driver_asp_reg.c + performance.sh): sweep the PyFR operator set,
create an fsspmdm handle per operator (create-time autotune, dense vs
pattern-baked), validate against the NumPy oracle, and report Gnnz/s and
effective GFLOP/s per operator for the streaming N=4800 case (reference
TEST_N default, test.sh:16).

Operators: the REAL PyFR/GiMMiK .mtx matrices bundled with the reference
snapshot (samples/xgemm_sparse_Ainregs/mats/p*/{hex,tet,...}/m*-sp.mtx)
are read in place when present; otherwise utils/testmats.py synthesizes
operators of the same class (kron-structured derivative ops, tall-skinny
face-interp ops).

Usage: python samples/pyfr.py [N] [--synthetic]      (default N=4800)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(n=4800, synthetic=False):
    import jax
    import jax.numpy as jnp

    from libxsmm_tpu.ops.fsspmdm import fsspmdm_create
    from libxsmm_tpu.matdiff import matdiff
    from libxsmm_tpu.utils.testmats import (have_reference_pyfr_mats,
                                            hex_derivative_operator,
                                            hex_interp_operator,
                                            reference_pyfr_operators)

    if have_reference_pyfr_mats() and not synthetic:
        ops = [(f"{name:18s}", a) for name, a in
               reference_pyfr_operators(orders=("p2", "p3", "p4"),
                                        elems=("hex",))]
        print(f"{len(ops)} REAL PyFR operators "
              "(reference mats/, read in place)")
    else:
        ops = []
        for p in (1, 2, 3, 4):
            ops.append((f"p{p} hex deriv     ", hex_derivative_operator(p)))
            ops.append((f"p{p} hex interp    ", hex_interp_operator(p)))

    rng = np.random.default_rng(0)
    inner = 256
    failures = 0
    for name, a in ops:
        m, k = a.shape
        h = fsspmdm_create(n, a.astype(np.float32))
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

        # correctness vs oracle
        got = np.asarray(h.execute(b))
        want = a.astype(np.float64) @ np.asarray(b, np.float64)
        d = matdiff(want, got)
        ok = d.normf_rel < 1e-5
        failures += not ok

        # perf: the library's calibrated chained timing (full-output
        # chain, rep-count calibration, null-launch subtraction) — a
        # fixed inner count silently measures launch_ms/inner in the
        # documented 28 ms-launch drought windows
        from libxsmm_tpu.utils.timer import bench_chain
        best = bench_chain(h.kernel.fn, (b,), reps=inner)
        gnnz = h.nnz * n / best / 1e9
        eff = 2 * h.nnz * n / best / 1e9
        dense_frac = h.nnz / (m * k)
        print(f"{name} {m:4d}x{k:4d} nnz={h.nnz:6d} ({dense_frac:4.0%}) "
              f"[{h.kind:6s}] {'OK ' if ok else 'FAIL'} "
              f"{gnnz:8.1f} Gnnz/s {eff:8.1f} GF/s(eff)")
    if failures:
        print(f"{failures} operator(s) FAILED tolerance")
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 4800
    sys.exit(main(n, synthetic="--synthetic" in sys.argv))
