"""Utility parity tests: math helpers, kernel dump, config tiers."""

import numpy as np
import pytest

from libxsmm_tpu.utils import mathx


def test_gcd_lcm():
    assert mathx.gcd(0, 0) == 1          # reference corner case
    assert mathx.gcd(12, 18) == 6
    assert mathx.lcm(4, 6) == 12
    assert mathx.lcm(0, 0) == 0


def test_isqrt_icbrt():
    assert mathx.isqrt2(17) == 4
    assert mathx.icbrt2(26) == 2
    assert mathx.icbrt2(27) == 3
    assert mathx.icbrt2(0) == 0


def test_sexp2():
    assert mathx.sexp2(3) == 8.0
    assert mathx.sexp2(-2) == 0.25


def test_matdiff_log(tmp_path):
    p = tmp_path / "eps.log"
    mathx.matdiff_log(1.5e-6, path=str(p), note="gemm 8x8x8")
    mathx.matdiff_log(2.5e-6, path=str(tmp_path))   # dir form
    assert "1.5e-06 gemm 8x8x8" in p.read_text()
    assert (tmp_path / "libxsmm_matdiff.log").exists()


def test_kernel_dump(tmp_path, monkeypatch):
    import libxsmm_tpu as xt
    from libxsmm_tpu.config import CONFIG
    from libxsmm_tpu.descriptor import GemmFlags, GemmShape
    kern = xt.dispatch_gemm(GemmShape(8, 8, 8), GemmFlags.BETA_0)
    a = np.ones((8, 8), np.float32)
    text = kern.lower_text(a, a)
    assert "stablehlo" in text or "module" in text
    monkeypatch.setattr(CONFIG, "dump_dir", str(tmp_path))
    path = kern.dump(a, a)
    assert path and (tmp_path / f"{kern.name}.stablehlo.txt").exists()


def test_verbose_statistic(capsys):
    from libxsmm_tpu.registry import Registry, Kernel, KernelInfo
    from libxsmm_tpu.descriptor import GemmShape, GemmFlags, GemmDescriptor
    reg = Registry()
    desc = GemmDescriptor(shape=GemmShape(8, 8, 8), flags=GemmFlags.BETA_0)
    reg.dispatch(desc, lambda d: Kernel(fn=lambda: None, descriptor=d,
                                        info=KernelInfo(kind="gemm"),
                                        name="k"))
    reg.print_statistic()
    out = capsys.readouterr().out
    assert "1 kernels" in out
    assert "sml" in out     # 8x8x8 -> small bucket


def test_aux_api_analogues():
    import libxsmm_tpu as xt
    from libxsmm_tpu.utils import timer

    assert isinstance(xt.cpuid(), str)
    assert xt.get_target_arch() == xt.cpuid()
    xt.xregister(b"aux_k", 7)
    assert xt.xdispatch(b"aux_k") == 7
    xt.xclear()
    assert xt.xdispatch(b"aux_k") is None
    t0 = timer.tickint()
    t1 = timer.tickint()
    assert timer.ncycles(t0, t1) >= 0


def test_bench_chain_interleaved_and_overhead():
    """Interleaved chained timing: per-candidate times returned in order,
    failing candidates yield None, and the null-launch overhead probe is a
    small positive number (r3 calibration discipline)."""
    import jax.numpy as jnp

    from libxsmm_tpu.utils import timer

    null = timer.launch_overhead(refresh=True)
    assert 0 < null < 5.0

    def fast(x):
        return x * 1.0001

    def slow(x):
        y = x
        for _ in range(20):
            y = y @ jnp.eye(64, dtype=y.dtype) * 1.0001
        return y

    def broken(x):
        raise RuntimeError("no kernel")

    x0 = jnp.ones((64, 64), jnp.float32)
    times = timer.bench_chain_interleaved(
        [(fast, (x0,), 0), (slow, (x0,), 0), (broken, (x0,), 0)],
        reps=8, rounds=2, min_launch_s=0.005)
    assert times[2] is None
    assert times[0] is not None and times[1] is not None
    assert times[0] > 0
    # slow does ~20 matmuls per step; it must not read faster than fast
    assert times[1] >= times[0] * 0.5


def test_chain_runner_dynamic_reps():
    """The chained-timing trip count is a RUNTIME jit argument (r4):
    recalibrating reps never recompiles — any positive count is valid and
    the runner still times correctly. A deadline in the past bounds
    calibration at the initial count (degraded-but-bounded, VERDICT r3 #1)."""
    import time

    import jax.numpy as jnp

    from libxsmm_tpu.utils.timer import _ChainRunner

    r = _ChainRunner(lambda x: x * 1.0001, (jnp.ones((8, 128)),), 0,
                     reps=8, min_launch_s=0.02)
    assert r.reps >= 8
    assert r.run_once() > 0.0
    bounded = _ChainRunner(lambda x: x * 1.0001, (jnp.ones((8, 128)),), 0,
                           reps=8, min_launch_s=0.02,
                           deadline=time.perf_counter() - 1.0)
    assert bounded.reps == 8             # calibration never ran


def test_bench_chain_pytree_operand():
    """The chained operand may be a pytree — packed GEMM operands are
    (payload, scales) tuples (samples/xgemm.py --bench chains through B).
    The chain rides the FIRST leaf; the other leaves stay loop-invariant."""
    import jax.numpy as jnp

    from libxsmm_tpu.utils import timer

    def fn(a, b):
        payload, scales = b
        return a @ (payload.astype(jnp.float32) * scales)

    a = jnp.ones((16, 32), jnp.float32)
    b = (jnp.ones((32, 8), jnp.int8), jnp.full((32, 8), 0.5, jnp.float32))
    per = timer.bench_chain(fn, (a, b), chain_idx=1, reps=4, rounds=1,
                            min_launch_s=0.002)
    assert per > 0
