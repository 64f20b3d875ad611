"""Weak-scaling harness for the distributed BSR SpMM.

Measures nnz/s at 1..N devices with per-device problem size held constant
(the BASELINE.json scaling config: >=70% weak-scaling efficiency target).
On CPU it validates the harness against a virtual device mesh; on a real
multi-chip slice the same script measures ICI halo-exchange overlap.

Usage: python spmm_scaling.py [max_devices] [--density D] [--n N]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    density = 0.1
    ncols = 256
    if "--density" in sys.argv:
        density = float(sys.argv[sys.argv.index("--density") + 1])
    if "--n" in sys.argv:
        ncols = int(sys.argv[sys.argv.index("--n") + 1])

    import os
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={max_dev}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

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

        out = spmm(x)
        jax.block_until_ready(out)
        # verify once
        err = float(np.abs(np.asarray(out) - a @ x).max())
        assert err < 1e-2 * max(1.0, float(np.abs(a @ x).max())), err

        reps = 10
        best = float("inf")
        xj = jax.device_put(x)
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(reps):
                o = spmm(xj)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / reps)
        nnz_rate = bsr.nnz / best
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
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(10):
                o = spmm2(xj)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"2-level dcn=2 x ici={nd // 2}: nnz={bsr.nnz:9d}  "
              f"{bsr.nnz / best / 1e9:7.3f} Gnnz/s")

    if jax.devices()[0].platform == "cpu":
        print("NOTE: virtual CPU devices share physical cores — efficiency "
              "here validates the harness, not the hardware; run on a real "
              "slice for the >=70% weak-scaling target.")


if __name__ == "__main__":
    main()
