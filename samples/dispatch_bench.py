"""Dispatch-overhead microbenchmark.

TPU rendition of /root/reference/samples/utilities/dispatch (the reference
documents cached vs non-cached vs JIT dispatch costs,
documentation/libxsmm_samples.md:500-505): measures

  * cache-hit dispatch (descriptor -> cached Kernel object),
  * cache-miss dispatch (first build: trace + XLA compile),
  * invoke overhead (Python -> jitted call round trip),
  * native C++ registry find (the hash-table analogue).

Usage: python dispatch_bench.py [iterations]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import GemmFlags, GemmShape


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

    # cache-hit dispatch
    shape = GemmShape(23, 23, 23)
    xt.dispatch_gemm(shape, GemmFlags.BETA_0)          # prime
    t0 = time.perf_counter()
    for _ in range(iters):
        xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    hit_ns = (time.perf_counter() - t0) / iters * 1e9
    print(f"dispatch (cache hit):   {hit_ns:10.0f} ns")

    # cache-miss dispatch (build+compile); average over a few fresh shapes
    t0 = time.perf_counter()
    nmiss = 5
    for i in range(nmiss):
        kern = xt.dispatch_gemm(GemmShape(29, 29, 29 + i), GemmFlags.BETA_0)
        a = np.ones((29, 29 + i), np.float32)
        b = np.ones((29 + i, 29), np.float32)
        out = np.asarray(kern(a, b))                   # include compile,
        del out                                        # host-fetch sync
    miss_ms = (time.perf_counter() - t0) / nmiss * 1e3
    print(f"dispatch (miss+compile):{miss_ms:10.2f} ms")

    # invoke overhead on device
    kern = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    import jax
    import jax.numpy as jnp
    a = jnp.ones((23, 23), jnp.float32)
    out = kern(a, a)
    float(jnp.ravel(out)[0])       # host-fetch sync (see utils.timer)
    t0 = time.perf_counter()
    n = 200
    for _ in range(n):
        out = kern(out, a)                             # chained (no memo)
    float(jnp.ravel(out)[0])
    print(f"invoke (chained 23^3):  {(time.perf_counter()-t0)/n*1e6:10.1f} us")

    # native registry find
    from libxsmm_tpu import native_bridge
    if native_bridge.load() is not None:
        reg = native_bridge.NativeRegistry()
        key = b"gemm_23x23x23_f32_beta0"
        reg.insert(key, 42)
        t0 = time.perf_counter()
        for _ in range(iters):
            reg.find(key)
        print(f"native registry find:   "
              f"{(time.perf_counter()-t0)/iters*1e9:10.0f} ns")
    info = xt.get_registry_info()
    print(f"registry: {info['nkernels']} kernels, {info['hits']} hits")


if __name__ == "__main__":
    main()
