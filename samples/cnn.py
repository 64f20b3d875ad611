"""TPP-CNN driver: conv-as-BRGEMM correctness + throughput.

The LIBXSMM-DNN-style convolution sample (the reference's DNN operators
live in the companion repo, README.md:7; conv lowers to batch-reduce GEMM
over the R*S filter taps — TPP paper arXiv:2104.05755): validates the
kernel path (dispatch_brgemm_ext with fused bias+relu) against XLA's
native conv, then reports GFLOP/s for both through the chained-timing
discipline (interleaved, so the ratio survives time-share windows).

Usage: python samples/cnn.py [N H W C K R stride]
       default 32 56 56 64 64 3 1 (a ResNet-ish layer)
Exit code: number of failing correctness checks.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp

    from libxsmm_tpu.models.tpp_cnn import conv2d_kernel, conv2d_tpp
    from libxsmm_tpu.utils.timer import bench_chain_interleaved

    defaults = [32, 56, 56, 64, 64, 3, 1]
    args = [int(v) for v in (argv or sys.argv[1:])]
    n, h, w, c, k, r, stride = (args + defaults[len(args):])[:7]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((r, r, c, k)) / np.sqrt(r * r * c),
                     jnp.float32)
    b = jnp.asarray(rng.standard_normal((k,)), jnp.float32)

    p = (h - r) // stride + 1
    q = (w - r) // stride + 1
    flops = 2.0 * n * p * q * r * r * c * k

    failures = 0
    fused = conv2d_kernel(x.shape, wt.shape, stride=stride,
                          fused_bias=True, relu=True)
    got = np.asarray(fused(x, wt, b))
    want = np.asarray(jax.lax.conv_general_dilated(
        x, wt, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    want = np.maximum(want + np.asarray(b), 0.0)
    err = np.abs(got - want).max() / max(1e-9, np.abs(want).max())
    ok = err < 1e-5
    failures += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} fused conv {n}x{h}x{w}x{c} -> "
          f"{p}x{q}x{k} (r={r}, stride={stride}) rel_err={err:.2e}")

    got2 = np.asarray(conv2d_tpp(x, wt, b, stride=stride,
                                 activation="relu"))
    err2 = np.abs(got2 - want).max() / max(1e-9, np.abs(want).max())
    ok2 = err2 < 1e-5
    failures += 0 if ok2 else 1
    print(f"{'PASS' if ok2 else 'FAIL'} tpp formulation rel_err={err2:.2e}")

    @jax.jit
    def xla_conv(x, wt, b):
        out = jax.lax.conv_general_dilated(
            x, wt, (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(out + b[None, None, None, :], 0.0)

    # wt/b ride as bench ARGUMENTS (device-resident once) — captured in
    # the lambdas they would bake into the runner's jit as closure
    # constants, re-uploaded per launch (CLAUDE.md)
    times = bench_chain_interleaved(
        [(fused, (x, wt, b), 0),
         (xla_conv, (x, wt, b), 0)], reps=8, rounds=3)
    for name, t in zip(("brgemm-fused", "xla-native "), times):
        if t:
            print(f"{name}: {flops / t / 1e9:9.1f} GFLOP/s "
                  f"({t * 1e6:.0f} us)")
    if times[0] and times[1]:
        print(f"brgemm/xla ratio: {times[1] / times[0]:.3f}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
