"""Exhaustive op-enum coverage: EVERY unary/binary/ternary TPP type must
dispatch and execute (the reference's contract that any legal descriptor
yields a kernel, include/libxsmm.h:127-133 + reference fallback §2.2).
Each op gets the operand setup its reference semantics require.
"""

import numpy as np
import pytest

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryFlags, BinaryType, TernaryType,
                                    UnaryFlags, UnaryType)
from libxsmm_tpu.dtypes import Datatype

RNG = np.random.default_rng(7)
M, N = 16, 32


def _x(m=M, n=N, dtype=np.float32):
    return (RNG.standard_normal((m, n)) + 1.5).astype(dtype)


@pytest.mark.parametrize("op", list(UnaryType), ids=lambda o: o.name)
def test_unary_enum_complete(op):
    if op == UnaryType.NONE:
        return
    kw = {}
    args = ()
    x = _x()
    if op in (UnaryType.STOCHASTIC_ROUND,):
        kw = dict(out_type=Datatype.BF16)
        kern = xt.dispatch_meltw_unary(op, M, N, **kw)
        out = kern(x, seed=3)
        assert np.asarray(out).shape == (M, N)
        return
    if op in (UnaryType.QUANT,):
        kern = xt.dispatch_meltw_unary(op, M, N, out_type=Datatype.I8)
        out = kern(x, 10.0)
        assert np.asarray(out).dtype == np.int8
        return
    if op == UnaryType.DEQUANT:
        kern = xt.dispatch_meltw_unary(op, M, N, in_type=Datatype.I8)
        out = kern(_x(dtype=np.float32).astype(np.int8), 10.0)
        assert np.asarray(out).shape == (M, N)
        return
    if op == UnaryType.DROPOUT:
        kern = xt.dispatch_meltw_unary(op, M, N)
        out = kern(x, p=0.5, seed=1)
        leaf = out[0] if isinstance(out, tuple) else out
        assert np.asarray(leaf).shape == (M, N)
        return
    if op == UnaryType.DROPOUT_INV:
        mask = (RNG.random((M, N)) < 0.5)
        pmask = np.asarray(xt.pack_bitmask(mask))
        kern = xt.dispatch_meltw_unary(op, M, N, UnaryFlags.BITMASK_2BYTEMULT)
        out = np.asarray(kern(x, pmask, p=0.5))
        np.testing.assert_allclose(out, np.where(mask, x / 0.5, 0.0),
                                   rtol=1e-6)
        return
    if op in (UnaryType.RELU_INV, UnaryType.LEAKY_RELU_INV):
        mask = (RNG.random((M, N)) < 0.5)
        pmask = np.asarray(xt.pack_bitmask(mask))
        kern = xt.dispatch_meltw_unary(op, M, N, UnaryFlags.BITMASK_2BYTEMULT)
        out = np.asarray(kern(x, pmask, alpha=0.25))
        want = np.where(mask, x, 0.0 if op == UnaryType.RELU_INV else 0.25 * x)
        np.testing.assert_allclose(out, want, rtol=1e-6)
        return
    if op == UnaryType.ELU_INV:
        out_fwd = _x() - 1.5          # mixed-sign saved forward output
        kern = xt.dispatch_meltw_unary(op, M, N)
        out = np.asarray(kern(x, out_fwd, alpha=1.0))
        want = np.where(out_fwd > 0, x, x * (out_fwd + 1.0))
        np.testing.assert_allclose(out, want, rtol=1e-5)
        return
    if op.name.startswith("DECOMPRESS_SPARSE"):
        mask = (RNG.random((M, N)) < 0.5).astype(np.uint8)
        nnz = int(mask.sum())
        kern = xt.dispatch_meltw_unary(op, M, N)
        out = kern(RNG.standard_normal(nnz).astype(np.float32), mask)
        assert np.asarray(out).shape == (M, N)
        return
    if op in (UnaryType.GATHER,):
        idx = RNG.integers(0, M, 4).astype(np.int32)
        kern = xt.dispatch_meltw_unary(op, M, N)
        assert np.asarray(kern(x, idx)).shape == (4, N)
        return
    if op == UnaryType.SCATTER:
        idx = np.asarray([1, 3], np.int32)
        kern = xt.dispatch_meltw_unary(op, 2, N)
        out0 = np.zeros((M, N), np.float32)
        assert np.asarray(kern(_x(2, N), idx, out0)).shape == (M, N)
        return
    if op.name.startswith("REDUCE_COLS_IDX"):
        idx = RNG.integers(0, M, 5).astype(np.int32)
        kern = xt.dispatch_meltw_unary(op, M, N)
        assert np.asarray(kern(x, idx)).shape == (1, N)
        return
    if op == UnaryType.REDUCE_X_OP_ADD_NCNC_FORMAT:
        kern = xt.dispatch_meltw_unary(op, m=4, n=4, extra=(16, 8))
        out = kern(RNG.standard_normal(16 * 8).astype(np.float32))
        assert np.asarray(out).size == 16
        return
    if op.name.startswith("REDUCE"):
        kw = dict(flags=UnaryFlags.REDUCE_ROWS)
    if op == UnaryType.REPLICATE_COL_VAR:
        kern = xt.dispatch_meltw_unary(op, M, N)
        assert np.asarray(kern(_x(M, 1))).shape == (M, N)
        return
    if "VNNI" in op.name or "PAD" in op.name:
        # layout transforms: exercised shape-specifically in test_eltwise;
        # here just confirm dispatch wiring on a legal shape
        src = _x(M, N)
        kern = xt.dispatch_meltw_unary(op, M, N)
        if op.name.startswith("TRANSFORM_VNNI"):
            k = int(op.name.replace("TRANSFORM_VNNI", "")[0])
            if "T_TO_NORM" in op.name:      # input is VNNI-T of (M, N)
                src = _x(N // k, M * k)
            else:
                src = _x(M // k, N * k)
        assert np.asarray(kern(src)).size > 0
        return
    kern = xt.dispatch_meltw_unary(op, M, N, **kw)
    out = kern(x, *args)
    leaf = out[0] if isinstance(out, tuple) else out
    assert np.asarray(leaf).size > 0


@pytest.mark.parametrize("op", list(BinaryType), ids=lambda o: o.name)
def test_binary_enum_complete(op):
    if op == BinaryType.NONE:
        return
    if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
        k = 8
        br = 3
        a_dt = Datatype.BF16
        f = 2  # vnni factor for bf16
        if op.name.startswith("BRGEMM"):
            a = RNG.standard_normal((br, M, k)).astype(np.float32)
            b = RNG.standard_normal((br, k, N)).astype(np.float32)
            want = np.einsum("bmk,bkn->mn", a, b)
        else:
            a = RNG.standard_normal((M, k)).astype(np.float32)
            b = RNG.standard_normal((k, N)).astype(np.float32)
            want = a @ b
        am, bm = a, b
        def vnni(x):
            *lead, mm, kk = x.shape
            return (x.reshape(*lead, mm // f, f, kk)
                    .swapaxes(-1, -2).reshape(*lead, mm // f, kk * f))
        if "A_VNNI_TRANS" in op.name:
            am = vnni(np.swapaxes(am, -1, -2))    # VNNI-T storage
        elif "A_VNNI" in op.name:
            am = vnni(am)
        elif "A_TRANS" in op.name:
            am = np.swapaxes(am, -1, -2).copy()
        if "B_TRANS" in op.name:
            bm = np.swapaxes(bm, -1, -2).copy()
        kern = xt.dispatch_meltw_binary(op, M, N, in_type=a_dt)
        got = np.asarray(kern(am, bm))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        return
    a, b = _x(), _x()
    kern = xt.dispatch_meltw_binary(op, M, N)
    if op == BinaryType.MULADD:
        out = kern(a, b, _x())
    elif op == BinaryType.ZIP:
        lo = RNG.integers(0, 65535, (M, N)).astype(np.uint16)
        hi = RNG.integers(0, 65535, (M, N)).astype(np.uint16)
        out = kern(lo, hi)
    else:
        out = kern(a, b)
    assert np.asarray(out).size > 0


@pytest.mark.parametrize("op", list(TernaryType), ids=lambda o: o.name)
def test_ternary_enum_complete(op):
    if op == TernaryType.NONE:
        return
    if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
        k, br, f = 8, 3, 2
        if op.name.startswith("BRGEMM"):
            a = RNG.standard_normal((br, M, k)).astype(np.float32)
            b = RNG.standard_normal((br, k, N)).astype(np.float32)
            base = np.einsum("bmk,bkn->mn", a, b)
        else:
            a = RNG.standard_normal((M, k)).astype(np.float32)
            b = RNG.standard_normal((k, N)).astype(np.float32)
            base = a @ b
        c = _x()
        am, bm = a, b
        def vnni(x):
            *lead, mm, kk = x.shape
            return (x.reshape(*lead, mm // f, f, kk)
                    .swapaxes(-1, -2).reshape(*lead, mm // f, kk * f))
        if "A_VNNI_TRANS" in op.name:
            am = vnni(np.swapaxes(am, -1, -2))    # VNNI-T storage
        elif "A_VNNI" in op.name:
            am = vnni(am)
        elif "A_TRANS" in op.name:
            am = np.swapaxes(am, -1, -2).copy()
        if "B_TRANS" in op.name:
            bm = np.swapaxes(bm, -1, -2).copy()
        kern = xt.dispatch_meltw_ternary(op, M, N, in_type=Datatype.BF16)
        got = np.asarray(kern(am, bm, c))
        np.testing.assert_allclose(got, base + c, rtol=2e-2, atol=2e-2)
        return
    kern = xt.dispatch_meltw_ternary(op, M, N)
    if op == TernaryType.SELECT:
        out = kern(_x(), _x(), (RNG.random((M, N)) < 0.5).astype(np.uint8))
    else:
        out = kern(_x(), _x(), _x())
    assert np.asarray(out).shape == (M, N)
