"""Randomized brute-force shape sweeps vs the NumPy oracle.

The reference's kernel_test suites sample random (M,N,LD) tuples per run
multiplied over dtype/flag axes (samples/eltwise/kernel_test/
unary_simple.tpl:10-23, samples/xgemm kernel_test generators). Here the
sweep is seeded (reproducible) and runs on every CI pass; a failing case
prints its full descriptor for replay (the reference's LIBXSMM_VERBOSE=4
reproduction discipline, documentation/libxsmm_valid.md).
"""

import numpy as np
import pytest

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryType, GemmFlags, GemmShape,
                                    UnaryFlags, UnaryType)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import check

RNG = np.random.default_rng(20260816)

_UNARY_MATH_OPS = [
    UnaryType.IDENTITY, UnaryType.X2, UnaryType.SQRT, UnaryType.RELU,
    UnaryType.TANH, UnaryType.SIGMOID, UnaryType.GELU, UnaryType.NEGATE,
    UnaryType.INC, UnaryType.RECIPROCAL, UnaryType.EXP,
]

_ORACLE = {
    UnaryType.IDENTITY: lambda x: x,
    UnaryType.X2: lambda x: x * x,
    UnaryType.SQRT: np.sqrt,
    UnaryType.RELU: lambda x: np.maximum(x, 0),
    UnaryType.TANH: np.tanh,
    UnaryType.SIGMOID: lambda x: 1 / (1 + np.exp(-x)),
    UnaryType.GELU: lambda x: 0.5 * x * (1 + np.vectorize(__import__(
        "math").erf)(x / np.sqrt(2.0))),
    UnaryType.NEGATE: lambda x: -x,
    UnaryType.INC: lambda x: x + 1,
    UnaryType.RECIPROCAL: lambda x: 1 / x,
    UnaryType.EXP: np.exp,
}


@pytest.mark.parametrize("case", range(24))
def test_random_gemm(case):
    m = int(RNG.integers(1, 129))
    n = int(RNG.integers(1, 129))
    k = int(RNG.integers(1, 129))
    flags = GemmFlags.NONE
    if RNG.random() < 0.5:
        flags |= GemmFlags.BETA_0
    if RNG.random() < 0.25:
        flags |= GemmFlags.TRANS_A
    if RNG.random() < 0.25:
        flags |= GemmFlags.TRANS_B
    shape = GemmShape(m, n, k)
    desc = f"gemm m={m} n={n} k={k} flags={int(flags)}"
    a = RNG.standard_normal((k, m) if flags & GemmFlags.TRANS_A
                            else (m, k)).astype(np.float32)
    b = RNG.standard_normal((n, k) if flags & GemmFlags.TRANS_B
                            else (k, n)).astype(np.float32)
    am = a.T if flags & GemmFlags.TRANS_A else a
    bm = b.T if flags & GemmFlags.TRANS_B else b
    kern = xt.dispatch_gemm(shape, flags)
    if flags & GemmFlags.BETA_0:
        got = np.asarray(kern(a, b))
        want = am @ bm
    else:
        c = RNG.standard_normal((m, n)).astype(np.float32)
        got = np.asarray(kern(a, b, c))
        want = am @ bm + c
    check(want, got, margin=1e-4), desc


@pytest.mark.parametrize("case", range(24))
def test_random_unary(case):
    m = int(RNG.integers(1, 200))
    n = int(RNG.integers(1, 200))
    op = _UNARY_MATH_OPS[int(RNG.integers(0, len(_UNARY_MATH_OPS)))]
    desc = f"unary {op.name} m={m} n={n}"
    x = RNG.standard_normal((m, n)).astype(np.float32)
    if op in (UnaryType.SQRT,):
        x = np.abs(x) + 0.01
    if op == UnaryType.RECIPROCAL:
        x = x + np.sign(x) * 0.5
    kern = xt.dispatch_meltw_unary(op, m, n)
    got = np.asarray(kern(x))
    want = _ORACLE[op](x.astype(np.float64)).astype(np.float32)
    check(want, got, margin=2e-5), desc


@pytest.mark.parametrize("case", range(12))
def test_random_binary_bcast(case):
    from libxsmm_tpu.descriptor import BinaryFlags
    m = int(RNG.integers(2, 100))
    n = int(RNG.integers(2, 100))
    op, fn = [(BinaryType.ADD, np.add), (BinaryType.MUL, np.multiply),
              (BinaryType.SUB, np.subtract),
              (BinaryType.MAX, np.maximum)][int(RNG.integers(0, 4))]
    bcast = int(RNG.integers(0, 3))   # 0 none, 1 row-in-1, 2 scalar-in-1
    a = RNG.standard_normal((m, n)).astype(np.float32)
    if bcast == 1:
        b = RNG.standard_normal((m, 1)).astype(np.float32)
        flags = BinaryFlags.BCAST_ROW_IN_1
    elif bcast == 2:
        b = RNG.standard_normal((1, 1)).astype(np.float32)
        flags = BinaryFlags.BCAST_SCALAR_IN_1
    else:
        b = RNG.standard_normal((m, n)).astype(np.float32)
        flags = BinaryFlags.NONE
    kern = xt.dispatch_meltw_binary(op, m, n, flags=flags)
    got = np.asarray(kern(a, b))
    want = fn(a, np.broadcast_to(b, (m, n)))
    check(want, got, margin=1e-5), f"binary {op.name} bcast={bcast} {m}x{n}"


@pytest.mark.parametrize("case", range(8))
def test_random_batched_packed_smm(case):
    n = int([16, 32, 64][RNG.integers(0, 3)])
    p = 128 // n
    batch = int(RNG.integers(1, 9)) * p
    m = int(RNG.integers(1, 17)) * 8
    a = RNG.standard_normal((batch, m, n)).astype(np.float32)
    b = RNG.standard_normal((batch, n, n)).astype(np.float32)
    kern = xt.dispatch_gemm_batched_packed(GemmShape(m, n, n),
                                           GemmFlags.BETA_0)
    out = xt.unpack_batched(kern(xt.pack_batched(a, p),
                                 xt.pack_batched(b, p)), p)
    check(np.einsum("bmk,bkn->bmn", a, b), np.asarray(out), margin=1e-4)
