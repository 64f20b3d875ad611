"""smmbench — streaming-case SMM benchmark (reference parity sample).

Mirrors /root/reference/samples/utilities/smmbench (cases documented in
documentation/libxsmm_samples.md:514-546): C = A@B (+C) over a batch of
small matmuls, exercising every combination of which operands stream from
HBM vs stay resident:

  case 1  stream A,B,C   batched SMM            -> dispatch_gemm_batched_packed
  case 2  stream A,B     C accumulated on-chip  -> dispatch_brgemm (batch-reduce)
  case 3  stream A,C     B shared               -> packed kernel, B tiled+blockdiag
  case 4  stream B,C     A shared               -> one plain MXU dot (no mask)
  case 5  stream nothing repeat same multiply   -> chained dot (MXU latency)

Usage: python samples/smmbench.py [size] [batch]   (default 32 16384)

Timing discipline: iterations chained inside one jit (fori_loop), host-fetch
sync (see bench.py module docstring for why both are required here).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(size=32, batch=16384):
    import jax
    import jax.numpy as jnp

    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                        GemmFlags, GemmShape)

    m = n = k = size
    p = xt.smm_pack_factor(GemmShape(m, n, k))
    G = batch // p
    rng = np.random.default_rng(0)

    # calibrated chained timing (utils.timer.bench_chain): fixed inner
    # rep counts silently measure launch overhead in 28 ms-launch drought
    # windows (CLAUDE.md); the runner calibrates and subtracts the null
    from libxsmm_tpu.utils.timer import bench_chain

    def run(fn, args, traffic_bytes, nflops, reps=16, rounds=3):
        # operands ride as bench_chain ARGUMENTS (device-resident once);
        # captured in a lambda they bake into the runner's jit as closure
        # constants, re-uploaded per launch OUTSIDE the null subtraction
        best = bench_chain(fn, args, chain_idx=0, reps=reps, rounds=rounds)
        return nflops / best / 1e9, traffic_bytes / best / 1e9

    a_p = xt.pack_batched(
        jnp.asarray(rng.standard_normal((batch, m, k)), jnp.float32), p)
    b_p = xt.pack_batched(
        jnp.asarray(rng.standard_normal((batch, k, n)) * 0.1,
                    jnp.float32), p)
    flops = 2 * batch * m * n * k

    # case 1: stream A, B, C
    kern1 = xt.dispatch_gemm_batched_packed(GemmShape(m, n, k),
                                            GemmFlags.BETA_0)
    gf, gb = run(kern1, (a_p, b_p),
                 batch * (m*k + k*n + m*n) * 4, flops)
    print(f"case 1 (stream A,B,C; batched SMM):   {gf:8.1f} GF/s {gb:7.1f} GB/s")

    # case 2: stream A, B; accumulate C on-chip (batch-reduce)
    from libxsmm_tpu.dtypes import Datatype
    kern2 = xt.dispatch_brgemm(GemmShape(m, n, k),
                               GemmFlags.BETA_0,
                               BatchReduceConfig(BatchReduceType.STRIDE,
                                                 batch))
    a3 = jnp.asarray(rng.standard_normal((batch, m, k)), jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((batch, k, n)) * 0.01, jnp.float32)

    def step2(a, b):
        out = kern2(a, b)           # (m, n) accumulated over the batch
        return a + out[None, :m, :k] * 1e-9

    gf, gb = run(step2, (a3, b3), batch * (m*k + k*n) * 4, flops)
    print(f"case 2 (stream A,B; C on-chip; BRGEMM):{gf:7.1f} GF/s {gb:7.1f} GB/s")

    # case 3: stream A, C; B shared across the batch
    bs = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.float32)
    b_tiled = xt.pack_batched(jnp.broadcast_to(bs, (p, k, n)), p)[0]

    def step3(a, bt):
        return kern1(a, jnp.broadcast_to(bt, (G, k, p * n)))

    gf, gb = run(step3, (a_p, b_tiled), batch * (m*k + m*n) * 4, flops)
    print(f"case 3 (stream A,C; B cached):        {gf:8.1f} GF/s {gb:7.1f} GB/s")

    # case 4: stream B, C; A shared — C_i = A @ B_i is ONE plain MXU dot
    # on the packed layout (no block-diagonal needed)
    a_sh = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.float32)

    @jax.named_scope("smmbench_case4")
    def step4(b, ash):
        out = jax.lax.dot_general(
            ash, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (m, G, p*n)
        return jnp.swapaxes(out, 0, 1) * 0.999 + b * 1e-6

    gf, gb = run(step4, (b_p, a_sh), batch * (k*n + m*n) * 4, flops)
    print(f"case 4 (stream B,C; A cached):        {gf:8.1f} GF/s {gb:7.1f} GB/s")

    # case 5: nothing streamed — repeat the same multiply (MXU latency)
    kern5 = xt.dispatch_gemm(GemmShape(m, n, k), GemmFlags.BETA_0)
    a5 = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    b5 = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.float32)
    # tiny serial workload: needs a deep inner chain or launch overhead
    # (1.2-14 ms on this backend) swamps the ~1 us kernel
    gf, gb = run(lambda a, b: kern5(a, b) * 0.999 + a * 1e-6, (a5, b5),
                 0, 2 * m * n * k, reps=4096)
    print(f"case 5 (cached; repeated single SMM): {gf:8.1f} GF/s per-call "
          f"{2*m*n*k/gf/1e9*1e9:.0f} ns")


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    main(size, batch)
