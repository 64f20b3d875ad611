"""Exhaustive op-enum coverage: EVERY unary/binary/ternary TPP type must
dispatch, execute AND match a NumPy value oracle (the reference's contract
that any legal descriptor yields a kernel, include/libxsmm.h:127-133, plus
its golden-compare discipline — oracle formulas from
generator_mateltwise_reference_impl.c). No shape-only assertions.
"""

import numpy as np
import pytest
import scipy.special

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryFlags, BinaryType, TernaryType,
                                    UnaryFlags, UnaryType)
from libxsmm_tpu.dtypes import Datatype

RNG = np.random.default_rng(7)
M, N = 16, 32


def _x(m=M, n=N, dtype=np.float32):
    return (RNG.standard_normal((m, n)) + 1.5).astype(dtype)


# NumPy value oracles for the plain math/reduce unary ops
# (libxsmm_fp32_unary_compute, impl.c:76-110, and the reduce kernel)
_UNARY_ORACLE = {
    UnaryType.IDENTITY: lambda x: x,
    UnaryType.XOR: np.zeros_like,
    UnaryType.X2: lambda x: x * x,
    UnaryType.SQRT: np.sqrt,
    UnaryType.RELU: lambda x: np.maximum(x, 0),
    UnaryType.TANH: np.tanh,
    UnaryType.TANH_INV: lambda x: 1 - np.tanh(x) ** 2,
    UnaryType.SIGMOID: lambda x: 1 / (1 + np.exp(-x)),
    UnaryType.SIGMOID_INV: lambda x: (1 / (1 + np.exp(-x)))
    * (1 - 1 / (1 + np.exp(-x))),
    UnaryType.GELU: lambda x: 0.5 * x * (1 + scipy.special.erf(
        x / np.sqrt(2))),
    UnaryType.GELU_INV: lambda x: 0.5 * (1 + scipy.special.erf(
        x / np.sqrt(2))) + x * np.exp(-0.5 * x * x) / np.sqrt(2 * np.pi),
    UnaryType.NEGATE: lambda x: -x,
    UnaryType.INC: lambda x: x + 1,
    UnaryType.RECIPROCAL: lambda x: 1 / x,
    UnaryType.RECIPROCAL_SQRT: lambda x: 1 / np.sqrt(x),
    UnaryType.EXP: np.exp,
    UnaryType.LEAKY_RELU: lambda x: np.where(x > 0, x, 0.01 * x),
    UnaryType.ELU: lambda x: np.where(x > 0, x, np.expm1(x)),
}

_REDUCE_ORACLE = {
    UnaryType.REDUCE_X_OP_ADD: lambda x: x.sum(1, keepdims=True),
    UnaryType.REDUCE_X2_OP_ADD: lambda x: (x * x).sum(1, keepdims=True),
    UnaryType.REDUCE_X_OP_MAX: lambda x: x.max(1, keepdims=True),
    UnaryType.REDUCE_X_OP_MIN: lambda x: x.min(1, keepdims=True),
    UnaryType.REDUCE_X_OP_MUL: lambda x: x.prod(1, keepdims=True),
    UnaryType.REDUCE_X_OP_ABSMAX: lambda x: np.abs(x).max(1, keepdims=True),
    UnaryType.REDUCE_TO_SCALAR_OP_ADD: lambda x: x.sum().reshape(1, 1),
}


def _np_vnni(x, f, pad=False):
    r, c = x.shape
    if r % f:
        x = np.pad(x, ((0, f - r % f), (0, 0)))
        r = x.shape[0]
    return (x.reshape(r // f, f, c).transpose(0, 2, 1)
            .reshape(r // f, c * f))


def _np_unvnni(x, f, rows, cols):
    rk = x.shape[0]
    return (x.reshape(rk, cols, f).transpose(0, 2, 1)
            .reshape(rk * f, cols))[:rows]


@pytest.mark.parametrize("op", list(UnaryType), ids=lambda o: o.name)
def test_unary_enum_complete(op):
    if op == UnaryType.NONE:
        return
    kw = {}
    args = ()
    x = _x()
    if op in (UnaryType.STOCHASTIC_ROUND,):
        kern = xt.dispatch_meltw_unary(op, M, N, out_type=Datatype.BF16)
        out = np.asarray(kern(x, seed=3), np.float32)
        # every element is one of the two neighboring bf16 values
        import ml_dtypes
        lo = x.astype(ml_dtypes.bfloat16).astype(np.float32)
        ulp = np.maximum(np.abs(x) * 2 ** -7, 2 ** -126)
        assert np.all(np.abs(out - x) <= ulp + 1e-12)
        assert np.all((out == lo) | (np.abs(out - x) <= np.abs(lo - x) + ulp))
        return
    if op in (UnaryType.QUANT,):
        kern = xt.dispatch_meltw_unary(op, M, N, out_type=Datatype.I8)
        out = np.asarray(kern(x, 10.0))
        np.testing.assert_array_equal(
            out, np.round(x * 10.0).astype(np.int32).astype(np.int8))
        return
    if op == UnaryType.DEQUANT:
        q = _x(dtype=np.float32).astype(np.int8)
        kern = xt.dispatch_meltw_unary(op, M, N, in_type=Datatype.I8)
        np.testing.assert_allclose(np.asarray(kern(q, 10.0)),
                                   q.astype(np.float32) * 10.0, rtol=1e-6)
        return
    if op == UnaryType.DROPOUT:
        kern = xt.dispatch_meltw_unary(op, M, N)
        out = np.asarray(kern(x, p=0.5, seed=1))
        kept = out != 0
        assert 0.25 < kept.mean() < 0.75
        np.testing.assert_allclose(out[kept], (x * 2.0)[kept], rtol=1e-6)
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
        vals = RNG.standard_normal(nnz).astype(np.float32)
        kern = xt.dispatch_meltw_unary(op, M, N)
        out = np.asarray(kern(vals, mask))
        want = np.zeros((M, N), np.float32)
        want.reshape(-1)[mask.reshape(-1) != 0] = vals
        np.testing.assert_array_equal(out, want)
        return
    if op in (UnaryType.GATHER,):
        idx = RNG.integers(0, M, 4).astype(np.int32)
        kern = xt.dispatch_meltw_unary(op, M, N)
        np.testing.assert_array_equal(np.asarray(kern(x, idx)), x[idx])
        return
    if op == UnaryType.SCATTER:
        idx = np.asarray([1, 3], np.int32)
        kern = xt.dispatch_meltw_unary(op, 2, N)
        out0 = np.zeros((M, N), np.float32)
        src = _x(2, N)
        out = np.asarray(kern(src, idx, out0))
        want = out0.copy()
        want[idx] = src
        np.testing.assert_array_equal(out, want)
        return
    if op.name.startswith("REDUCE_COLS_IDX"):
        idx = RNG.integers(0, M, 5).astype(np.int32)
        kern = xt.dispatch_meltw_unary(op, M, N)
        red = {"ADD": np.sum, "MAX": np.max,
               "MIN": np.min}[op.name.rsplit("_", 1)[1]]
        np.testing.assert_allclose(
            np.asarray(kern(x, idx)),
            red(x[idx], axis=0, keepdims=True), rtol=1e-6)
        return
    if op == UnaryType.REDUCE_X_OP_ADD_NCNC_FORMAT:
        bc, bn, C, Nfull = 4, 4, 16, 8
        src = RNG.standard_normal(C * Nfull).astype(np.float32)
        kern = xt.dispatch_meltw_unary(op, m=bc, n=bn, extra=(C, Nfull))
        out = np.asarray(kern(src))
        # oracle straight from impl.c:2118-2137 offset arithmetic
        want = np.zeros(C, np.float32)
        for iC in range(C // bc):
            for ic in range(bc):
                t = 0.0
                for iN in range(Nfull // bn):
                    for i_n in range(bn):
                        t += src[iN * C * bn + iC * bn * bc + i_n * bc + ic]
                want[iC * bc + ic] = t
        np.testing.assert_allclose(out.reshape(-1), want, rtol=1e-5)
        return
    if op == UnaryType.REDUCE_X_X2_OP_ADD:
        kern = xt.dispatch_meltw_unary(op, M, N,
                                       flags=UnaryFlags.REDUCE_ROWS)
        s, s2 = kern(x)
        np.testing.assert_allclose(np.asarray(s), x.sum(1, keepdims=True),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2),
                                   (x * x).sum(1, keepdims=True), rtol=1e-5)
        return
    if op == UnaryType.REPLICATE_COL_VAR:
        col = _x(M, 1)
        kern = xt.dispatch_meltw_unary(op, M, N)
        np.testing.assert_array_equal(np.asarray(kern(col)),
                                      np.broadcast_to(col, (M, N)))
        return
    if op == UnaryType.UNZIP:
        kern = xt.dispatch_meltw_unary(op, M, N)
        lo, hi = kern(x)
        bits = x.view(np.uint32)
        np.testing.assert_array_equal(np.asarray(lo),
                                      (bits & 0xFFFF).astype(np.uint16))
        np.testing.assert_array_equal(np.asarray(hi),
                                      (bits >> 16).astype(np.uint16))
        return
    if op in (UnaryType.DECOMP_FP32_TO_BF16X2,
              UnaryType.DECOMP_FP32_TO_BF16X3):
        kern = xt.dispatch_meltw_unary(op, M, N)
        parts = [np.asarray(p, np.float32) for p in kern(x)]
        # splitSGD decomposition: parts sum back to x within the final
        # part's bf16 precision of the residual
        np.testing.assert_allclose(sum(parts), x,
                                   atol=np.abs(x).max() * 2.0 ** (
                                       -8 * len(parts)))
        return
    if op.name == "TRANSFORM_NORM_TO_NORMT":
        kern = xt.dispatch_meltw_unary(op, M, N)
        np.testing.assert_array_equal(np.asarray(kern(x)), x.T)
        return
    if "VNNI" in op.name or "PAD" in op.name:
        kern = xt.dispatch_meltw_unary(op, M, N)
        if op.name.startswith("TRANSFORM_PAD"):
            mod = 2 if "MOD2" in op.name else 4
            src = _x(M, N)
            out = np.asarray(kern(src))
            pm = ((mod - M % mod) % mod
                  if ("PADM" in op.name or "PADNM" in op.name) else 0)
            pn = (mod - N % mod) % mod if "PADN" in op.name else 0
            want = np.pad(src, ((0, pm), (0, pn)))
            np.testing.assert_array_equal(out, want)
            return
        f = int(op.name.replace("TRANSFORM_VNNI", "")
                .replace("TRANSFORM_NORM_TO_VNNI", "")[0]) \
            if "VNNI" in op.name else 0
        norm = _x(M, N)
        if op.name.startswith("TRANSFORM_NORM_TO_VNNI"):
            out = np.asarray(kern(norm))
            want = _np_vnni(norm.T if op.name.endswith(f"VNNI{f}T")
                            else norm, f, pad=True)
            np.testing.assert_array_equal(out, want)
            return
        if op.name == "TRANSFORM_NORM_TO_NORMT":
            np.testing.assert_array_equal(np.asarray(kern(norm)), norm.T)
            return
        if "T_TO_NORM" in op.name:          # VNNIkT (of (M,N)) -> NORM
            src = _np_vnni(norm.T, f, pad=True)
            kern2 = xt.dispatch_meltw_unary(op, M, N)
            np.testing.assert_array_equal(np.asarray(kern2(src)), norm)
            return
        if op.name.endswith("_TO_NORM"):    # VNNIk -> NORM
            src = _np_vnni(norm, f)
            np.testing.assert_array_equal(np.asarray(kern(src)), norm)
            return
        if op.name == "TRANSFORM_VNNI4_TO_VNNI2":
            src = _np_vnni(norm, 4)
            np.testing.assert_array_equal(np.asarray(kern(src)),
                                          _np_vnni(norm, 2))
            return
        if "_TO_VNNI" in op.name and "T" in op.name.split("_TO_")[1]:
            # VNNIk -> VNNIkT
            src = _np_vnni(norm, f)
            np.testing.assert_array_equal(np.asarray(kern(src)),
                                          _np_vnni(norm.T, f, pad=True))
            return
        raise AssertionError(f"transform {op.name} missing an oracle")
    if op in _REDUCE_ORACLE:
        flags = (UnaryFlags.REDUCE_ROWS
                 if op != UnaryType.REDUCE_TO_SCALAR_OP_ADD
                 else UnaryFlags.NONE)
        kern = xt.dispatch_meltw_unary(op, M, N, flags=flags)
        np.testing.assert_allclose(np.asarray(kern(x)),
                                   _REDUCE_ORACLE[op](x), rtol=1e-5)
        return
    if op == UnaryType.DUMP:
        kern = xt.dispatch_meltw_unary(op, M, N)
        np.testing.assert_array_equal(np.asarray(kern(x)), x)
        return
    assert op in _UNARY_ORACLE, f"op {op.name} has no oracle"
    kern = xt.dispatch_meltw_unary(op, M, N)
    transcendental = op in (UnaryType.TANH, UnaryType.TANH_INV,
                            UnaryType.SIGMOID, UnaryType.SIGMOID_INV,
                            UnaryType.GELU, UnaryType.GELU_INV,
                            UnaryType.EXP, UnaryType.ELU)
    # TPU VPU transcendentals are approximations (~1e-4 abs), like the
    # reference's minimax/LUT implementations
    rtol, atol = (5e-4, 2e-4) if transcendental else (2e-5, 1e-6)
    np.testing.assert_allclose(np.asarray(kern(x)), _UNARY_ORACLE[op](x),
                               rtol=rtol, atol=atol)


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
        c0 = _x()
        np.testing.assert_allclose(np.asarray(kern(a, b, c0)), c0 + a * b,
                                   rtol=1e-5)
        return
    if op == BinaryType.ZIP:
        lo = RNG.integers(0, 65535, (M, N)).astype(np.uint16)
        hi = RNG.integers(0, 65535, (M, N)).astype(np.uint16)
        out = np.asarray(kern(lo, hi))
        want = ((hi.astype(np.uint32) << 16)
                | lo.astype(np.uint32)).view(np.float32)
        np.testing.assert_array_equal(out.view(np.uint32),
                                      want.view(np.uint32))
        return
    oracle = {
        BinaryType.ADD: lambda: a + b,
        BinaryType.MUL: lambda: a * b,
        BinaryType.SUB: lambda: a - b,
        BinaryType.DIV: lambda: a / b,
        BinaryType.MAX: lambda: np.maximum(a, b),
        BinaryType.MIN: lambda: np.minimum(a, b),
        BinaryType.MUL_AND_REDUCE_TO_SCALAR_OP_ADD:
            lambda: (a * b).sum().reshape(1, 1),
        BinaryType.PACK:
            lambda: np.stack([a, b], axis=-1).reshape(M, 2 * N),
        BinaryType.CMP_OP_GT: lambda: a > b,
        BinaryType.CMP_OP_GE: lambda: a >= b,
        BinaryType.CMP_OP_LT: lambda: a < b,
        BinaryType.CMP_OP_LE: lambda: a <= b,
        BinaryType.CMP_OP_EQ: lambda: a == b,
        BinaryType.CMP_OP_NE: lambda: a != b,
    }
    assert op in oracle, f"binary op {op.name} has no oracle"
    want = oracle[op]()
    out = np.asarray(kern(a, b))
    if want.dtype == bool:
        # CMP ops store a packed bitmask (reference layout)
        np.testing.assert_array_equal(
            np.asarray(xt.unpack_bitmask(out, M, N)), want)
    else:
        np.testing.assert_allclose(out, want, rtol=1e-5)


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
    a, b, c = _x(), _x(), _x()
    if op == TernaryType.SELECT:
        # packed-bitmask ABI: bit CLEAR -> in0, bit SET -> in1
        sel = RNG.random((M, N)) < 0.5
        np.testing.assert_allclose(
            np.asarray(kern(a, b, np.asarray(xt.pack_bitmask(sel)))),
            np.where(sel, b, a), rtol=1e-6)
        return
    oracle = {TernaryType.MULADD: a * b + c,
              TernaryType.NMULADD: -(a * b) + c}
    assert op in oracle, f"ternary op {op.name} has no oracle"
    np.testing.assert_allclose(np.asarray(kern(a, b, c)), oracle[op],
                               rtol=1e-5)
