"""BRGEMM stream-SoL lab: root-cause VERDICT r4 #3 on the real TPU.

r3 dev runs read brgemm_stream_sol_frac 0.71 (kernel vs its no-math
same-block-specs DMA twin); the r4 capture read 0.42 with a different
winning variant (pack_q=64, step_groups=1, acc_scratch=False). The two
hypotheses from the verdict:
  (a) the r4 fragment came from a bad window (stale fallback), or
  (b) the pack_q=64 winner is structurally worse against ITS twin than
      the r3-era variant was against its own — i.e. the ratio metric is
      not comparable across rounds with different winners.

This lab measures EVERY variant's kernel AND its own SoL twin in one
interleaved run (ratios of adjacent launches survive any window), plus a
copy-bandwidth probe to label the window. Output: per-variant
abs time, sol_frac (median of per-round paired ratios), and the pick
both by throughput and by sol_frac.

Usage: python scripts/brgemm_lab.py [--rounds 5]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                        GemmDescriptor, GemmFlags, GemmShape)
    from libxsmm_tpu.dtypes import Datatype
    from libxsmm_tpu.kernels.gemm_pallas import build_packed_brgemm_sol
    from libxsmm_tpu.utils.timer import bench_chain_interleaved

    print("devices:", jax.devices(), flush=True)
    br, m, n, k = 1024, 256, 256, 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((br, m, k)), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((br, k, n)), jnp.bfloat16)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    q = xt.brgemm_pack_factor(shape)
    br_cfg = BatchReduceConfig(BatchReduceType.STRIDE, br)
    desc = GemmDescriptor(shape=shape, flags=GemmFlags.BETA_0, br=br_cfg)

    axes = [(1, 16, False), (8, 2, False), (32, 1, False), (32, 1, True)]
    a_packed = {}
    names, cands = [], []

    def make_step(fn):
        def step(b):
            out = fn(b)
            return b.at[0].add((out[:k, :] * 1e-6).astype(jnp.bfloat16))
        return step

    for mult, sg, scr in axes:
        if mult not in a_packed:
            a_packed[mult] = xt.pack_batched(a, q * mult)
        a_p = a_packed[mult]
        kern = xt.dispatch_brgemm_packed(
            shape, GemmFlags.BETA_0, br_cfg, step_groups=sg,
            pack_q=q * mult if mult > 1 else None, acc_scratch=scr)
        sol = build_packed_brgemm_sol(
            desc, br, step_groups=sg,
            pack_q=q * mult if mult > 1 else None)
        tag = f"q{q * mult}_sg{sg}{'_scr' if scr else ''}"
        names.append(f"brg_{tag}")
        cands.append((make_step(lambda b_, c_=kern, ap_=a_p: c_(ap_, b_)),
                      (b0,), 0))
        if sol is not None:
            names.append(f"sol_{tag}")
            cands.append((make_step(
                lambda b_, c_=sol, ap_=a_p: c_(ap_, b_)), (b0,), 0))
        else:
            print(f"sol twin for {tag}: UNBUILDABLE", flush=True)

    # copy probe to label the window
    big = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

    def copy_step(x):
        return x + jnp.bfloat16(1.0)

    names.append("copy")
    cands.append((copy_step, (big,), 0))
    copy_bytes = 2 * big.size * 2

    t0 = time.perf_counter()
    times, rows = bench_chain_interleaved(cands, rounds=args.rounds,
                                          per_round=True)
    print(f"measured in {time.perf_counter() - t0:.1f}s", flush=True)

    flops = 2 * br * m * n * k
    idx = {nm: i for i, nm in enumerate(names)}
    if times[idx["copy"]]:
        print(f"window copy bw: "
              f"{copy_bytes / times[idx['copy']] / 1e9:.0f} GB/s")
    print(f"\n{'variant':>16} {'brg_us':>9} {'TF/s':>7} {'sol_us':>9} "
          f"{'sol_frac(med)':>14}")
    for mult, sg, scr in axes:
        tag = f"q{q * mult}_sg{sg}{'_scr' if scr else ''}"
        bi = idx.get(f"brg_{tag}")
        si = idx.get(f"sol_{tag}")
        tb = times[bi] if bi is not None else None
        ts = times[si] if si is not None else None
        fr = None
        if bi is not None and si is not None and rows[bi] and rows[si]:
            rs = [s_ / b_ for b_, s_ in zip(rows[bi], rows[si])
                  if b_ and s_]
            fr = float(np.median(rs)) if rs else None
        print(f"{tag:>16} "
              f"{tb * 1e6 if tb else float('nan'):9.1f} "
              f"{flops / tb / 1e12 if tb else float('nan'):7.1f} "
              f"{ts * 1e6 if ts else float('nan'):9.1f} "
              f"{fr if fr is not None else float('nan'):14.3f}")


if __name__ == "__main__":
    main()
