"""utilities — micro-benchmarks for the L0 service layer (parity sample).

Mirrors /root/reference/samples/utilities/{matcopy,memcmp,rng,sync}
(documentation/libxsmm_samples.md "Utilities" section) on their TPU-native
equivalents:

  matcopy  IDENTITY / XOR meltw TPPs (copy + zero), GB/s
  transpose NORM_TO_NORMT meltw TPP, GB/s
  rng      jax.random f32 sequence (reference: xoshiro128+ AVX-512), GB/s
  memcmp   host-side native CRC32 + registry find (reference: SIMD diff)
  dispatch covered separately by samples/dispatch_bench.py

Usage: python samples/utilities.py [m] [n]     (default 4096 4096)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(m=4096, n=4096):
    import jax
    import jax.numpy as jnp

    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import UnaryType
    from libxsmm_tpu import rng as xrng

    # calibrated chained timing (utils.timer.bench_chain): the old
    # hand-rolled fixed-rep loop measured launch_ms/reps in degraded
    # windows, and its transpose chain `tr(x).T` let XLA cancel
    # transpose-of-transpose — the runner's full-reduction chain is
    # un-narrowable (review findings)
    from libxsmm_tpu.utils.timer import bench_chain

    def run(fn, state, nbytes):
        return nbytes / bench_chain(fn, (state,), reps=32) / 1e9

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((m, n)),
                     jnp.float32)

    copy = xt.dispatch_meltw_unary(UnaryType.IDENTITY, m, n)
    gb = run(copy, x0, 2 * m * n * 4)
    print(f"matcopy  (IDENTITY TPP):      {gb:7.1f} GB/s")

    tr = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_NORMT, m, n)
    gb = run(tr, x0, 2 * m * n * 4)
    print(f"transpose (NORM_TO_NORMT):    {gb:7.1f} GB/s")

    def rng_step(s):
        key = jax.random.fold_in(jax.random.PRNGKey(0),
                                 (s[0, 0] * 0).astype(jnp.int32))
        return jax.random.uniform(key, (m, n), jnp.float32)
    gb = run(rng_step, x0, m * n * 4)
    print(f"rng      (f32 sequence):      {gb:7.1f} GB/s")
    del xrng

    # host-side: native CRC32 + registry find (the reference's hash/diff)
    from libxsmm_tpu import native_bridge as nb
    data = np.random.default_rng(1).bytes(1 << 20)
    if nb.crc32(b"x") is not None:
        t0 = time.perf_counter()
        reps = 200
        for _ in range(reps):
            nb.crc32(data)
        per = (time.perf_counter() - t0) / reps
        print(f"crc32    (native, 1 MiB):     {(1 << 20) / per / 1e9:7.1f} GB/s")
    else:
        print("crc32    (native):            unavailable (no toolchain)")


if __name__ == "__main__":
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    main(m, n)
