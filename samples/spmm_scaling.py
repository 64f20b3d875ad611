"""Weak-scaling harness for the distributed BSR SpMM.

Measures nnz/s at 1..N devices with per-device problem size held constant
(the BASELINE.json scaling config: >=70% weak-scaling efficiency target).
On CPU it validates the harness against a virtual device mesh; on a real
multi-chip slice the same script measures ICI halo-exchange overlap.

Usage: python spmm_scaling.py [max_devices] [--density D] [--n N] [--tpu]
(default: virtual CPU mesh; --tpu uses the real multi-chip backend)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    # positional max_devices is optional and flags may come first:
    # `spmm_scaling.py --tpu` must not die on int("--tpu")
    pos = [a for a in sys.argv[1:] if not a.startswith("--")
           and not sys.argv[max(0, sys.argv.index(a) - 1)].startswith("--")]
    max_dev = int(pos[0]) if pos else 8
    density = 0.1
    ncols = 256
    if "--density" in sys.argv:
        density = float(sys.argv[sys.argv.index("--density") + 1])
    if "--n" in sys.argv:
        ncols = int(sys.argv[sys.argv.index("--n") + 1])

    import os
    # Virtual CPU mesh by default; pass --tpu on a real multi-chip slice.
    # The explicit flag beats detection: probing jax.devices() here would
    # initialize the backend BEFORE jax_platforms can be set (and hangs
    # indefinitely on a dead tunnel), and the old XLA_FLAGS-contents gate
    # made the real-slice mode unreachable (review finding).
    want_cpu = "--tpu" not in sys.argv
    if want_cpu and "host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={max_dev}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from libxsmm_tpu.utils.timer import bench_chain

    from libxsmm_tpu.ops.sparse import BsrMatrix
    from libxsmm_tpu.parallel.mesh import make_mesh
    from libxsmm_tpu.parallel.spmm_dist import DistributedBsrSpmm

    rng = np.random.default_rng(0)
    br = bc = 16
    rows_per_dev = 512          # constant per-device rows (weak scaling)
    k_fixed = 2048              # fixed contraction dim -> nnz/device const

    results = {}
    ndevs = [d for d in (1, 2, 4, 8, 16) if d <= max_dev
             and d <= len(jax.devices())]
    for nd in ndevs:
        m, k = rows_per_dev * nd, k_fixed
        mask = rng.random((m // br, k // bc)) < density
        for i in range(m // br):
            if not mask[i].any():
                mask[i, rng.integers(k // bc)] = True
        a = rng.standard_normal((m, k)).astype(np.float32)
        a *= np.kron(mask, np.ones((br, bc), np.float32))
        bsr = BsrMatrix.from_dense(a, br, bc)
        mesh = make_mesh([("x", nd)])
        spmm = DistributedBsrSpmm(bsr, ncols, mesh)
        x = rng.standard_normal((k, ncols)).astype(np.float32)

        # verify once (np.asarray is a HOST FETCH — the only true sync
        # on the tunneled backend, CLAUDE.md)
        err = float(np.abs(np.asarray(spmm(x)) - a @ x).max())
        assert err < 1e-2 * max(1.0, float(np.abs(a @ x).max())), err

        # calibrated chained timing: fixed-rep loops with identical inputs
        # are memoized by the runtime, and block_until_ready does not
        # flush the pipeline (CLAUDE.md) — bench_chain is the discipline
        xj = jax.device_put(x)
        nnz_rate = bsr.nnz / bench_chain(spmm, (xj,), reps=8)
        results[nd] = nnz_rate
        base = results[ndevs[0]] * nd / ndevs[0]
        eff = nnz_rate / base
        print(f"devices={nd:2d}  m={m:6d} k={k}  nnz={bsr.nnz:9d}  "
              f"{nnz_rate / 1e9:7.3f} Gnnz/s  weak-eff={eff:5.2f}")

    # two-level DCN x ICI mesh (multi-slice pods): same weak-scaling
    # measurement over the largest device count, rings kept on ICI
    if max(ndevs) >= 4:
        from libxsmm_tpu.parallel.spmm_dist import DistributedBsrSpmm2Level
        nd = max(ndevs)
        m, k = rows_per_dev * nd, k_fixed
        mask = rng.random((m // br, k // bc)) < density
        for i in range(m // br):
            if not mask[i].any():
                mask[i, rng.integers(k // bc)] = True
        a = rng.standard_normal((m, k)).astype(np.float32)
        a *= np.kron(mask, np.ones((br, bc), np.float32))
        bsr = BsrMatrix.from_dense(a, br, bc)
        mesh2 = make_mesh([("dcn", 2), ("ici", nd // 2)])
        spmm2 = DistributedBsrSpmm2Level(bsr, ncols, mesh2)
        x = rng.standard_normal((k, ncols)).astype(np.float32)
        out = np.asarray(spmm2(x))
        err = float(np.abs(out - a @ x).max())
        assert err < 1e-2 * max(1.0, float(np.abs(a @ x).max())), err
        xj = jax.device_put(x)
        best = bench_chain(spmm2, (xj,), reps=8)
        print(f"2-level dcn=2 x ici={nd // 2}: nnz={bsr.nnz:9d}  "
              f"{bsr.nnz / best / 1e9:7.3f} Gnnz/s")

    if jax.devices()[0].platform == "cpu":
        print("NOTE: virtual CPU devices share physical cores — efficiency "
              "here validates the harness, not the hardware; run on a real "
              "slice for the >=70% weak-scaling target.")


if __name__ == "__main__":
    main()
