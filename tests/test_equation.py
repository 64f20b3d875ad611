"""Matrix-equation tests — the reference's equation sample set
(samples/equation/: simple, relu, layernorm, softmax, gather_dot, matmul,
splitSGD) rebuilt through the tree-builder API, checked vs NumPy.
"""

import numpy as np
import pytest

from libxsmm_tpu.descriptor import (BinaryFlags, BinaryType, TernaryFlags,
                                    TernaryType, UnaryFlags, UnaryType)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import check
from libxsmm_tpu.ops.equation import (dispatch_meqn, meqn_create,
                                      meqn_destroy, meqn_push_back_arg,
                                      meqn_push_back_binary_op,
                                      meqn_push_back_ternary_op,
                                      meqn_push_back_unary_op,
                                      meqn_tree_print)

RNG = np.random.default_rng(17)


def _r(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_equation_simple():
    # out = (a + b) * c   — prefix: MUL( ADD(a, b), c )
    m, n = 8, 12
    a, b, c = _r(m, n), _r(m, n), _r(m, n)
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.MUL)
    meqn_push_back_binary_op(idx, BinaryType.ADD)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, n, in_pos=1)
    meqn_push_back_arg(idx, m, n, in_pos=2)
    kern = dispatch_meqn(idx, m, n)
    check((a + b) * c, np.asarray(kern(a, b, c)), margin=1e-6)


def test_equation_relu_of_matmul():
    # out = relu(A @ B + bias_col)  (equation_relu / matmul fusion)
    m, k, n = 16, 8, 24
    a, b = _r(m, k), _r(k, n)
    bias = _r(1, n)
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.RELU)
    meqn_push_back_binary_op(idx, BinaryType.ADD)
    meqn_push_back_binary_op(idx, BinaryType.MATMUL)
    meqn_push_back_arg(idx, m, k, in_pos=0)
    meqn_push_back_arg(idx, k, n, in_pos=1)
    meqn_push_back_arg(idx, 1, n, in_pos=2)
    kern = dispatch_meqn(idx, m, n)
    ref = np.maximum(a @ b + bias, 0)
    check(ref, np.asarray(kern(a, b, bias)), margin=1e-5)


def test_equation_layernorm():
    # out = (x - mean(x)) * rsqrt(var + eps) * gamma + beta, rowwise
    # built as: TERNARY_MULADD( MUL(xc, rstd), gamma, beta ) with
    # xc = SUB(x, mean) — means/vars fed as reduce-op sub-equations.
    m, n = 32, 64
    x = _r(m, n)
    gamma, beta = _r(1, n), _r(1, n)
    eps = 1e-5

    idx = meqn_create()
    meqn_push_back_ternary_op(idx, TernaryType.MULADD)
    #   in0 = (x - mean) * rstd
    meqn_push_back_binary_op(idx, BinaryType.MUL)
    meqn_push_back_binary_op(idx, BinaryType.SUB)
    meqn_push_back_arg(idx, m, n, in_pos=0)          # x
    meqn_push_back_arg(idx, m, 1, in_pos=1)          # mean (row)
    meqn_push_back_arg(idx, m, 1, in_pos=2)          # rstd (row)
    #   in1 = gamma, in2 = beta
    meqn_push_back_arg(idx, 1, n, in_pos=3)
    meqn_push_back_arg(idx, 1, n, in_pos=4)
    kern = dispatch_meqn(idx, m, n)

    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    rstd = 1.0 / np.sqrt(var + eps)
    ref = (x - mean) * rstd * gamma + beta
    check(ref, np.asarray(kern(x, mean, rstd, gamma, beta)), margin=1e-5)


def test_equation_softmax():
    # rowwise softmax: EXP(x - max) / sum
    m, n = 16, 32
    x = _r(m, n)
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.DIV)
    meqn_push_back_unary_op(idx, UnaryType.EXP)
    meqn_push_back_binary_op(idx, BinaryType.SUB)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, 1, in_pos=1)          # row max
    meqn_push_back_arg(idx, m, 1, in_pos=2)          # row expsum
    kern = dispatch_meqn(idx, m, n)
    mx = x.max(axis=1, keepdims=True)
    e = np.exp(x - mx)
    ref = e / e.sum(axis=1, keepdims=True)
    check(ref, np.asarray(kern(x, mx, e.sum(axis=1, keepdims=True))),
          margin=1e-5)


def test_equation_gather_dot():
    # reduce_add(cols) of elementwise product (equation_gather_dot shape)
    m, n = 12, 20
    a, b = _r(m, n), _r(m, n)
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.REDUCE_X_OP_ADD,
                            flags=UnaryFlags.REDUCE_ROWS)
    meqn_push_back_binary_op(idx, BinaryType.MUL)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, n, in_pos=1)
    kern = dispatch_meqn(idx, m, 1)
    ref = (a * b).sum(axis=1, keepdims=True)
    check(ref, np.asarray(kern(a, b)), margin=1e-5)


def test_equation_split_sgd_bf16():
    # splitSGD flavor: w' = w - lr * g, computed in f32, emitted bf16
    m, n = 16, 16
    w, g = _r(m, n), _r(m, n)
    lr = np.asarray([[0.01]], np.float32)
    idx = meqn_create()
    meqn_push_back_ternary_op(idx, TernaryType.NMULADD)
    meqn_push_back_arg(idx, 1, 1, in_pos=0)          # lr (scalar bcast)
    meqn_push_back_arg(idx, m, n, in_pos=1)          # g
    meqn_push_back_arg(idx, m, n, in_pos=2)          # w
    kern = dispatch_meqn(idx, m, n, out_type=Datatype.BF16)
    ref = w - 0.01 * g
    out = np.asarray(kern(lr, g, w), np.float32)
    check(ref, out, dtype_name="bf16")


def test_equation_brgemm_node():
    br, m, k, n = 4, 8, 6, 10
    a, b = _r(br, m, k), _r(br, k, n)
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.BRGEMM)
    meqn_push_back_arg(idx, m, k, in_pos=0)
    meqn_push_back_arg(idx, k, n, in_pos=1)
    kern = dispatch_meqn(idx, m, n)
    ref = np.einsum("bmk,bkn->mn", a, b)
    check(ref, np.asarray(kern(a, b)), margin=1e-5)


def test_equation_incomplete_raises():
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.ADD)
    meqn_push_back_arg(idx, 4, 4, in_pos=0)
    with pytest.raises(ValueError):
        dispatch_meqn(idx, 4, 4)


def test_equation_overcomplete_raises():
    idx = meqn_create()
    meqn_push_back_arg(idx, 4, 4, in_pos=0)   # complete: a bare arg
    with pytest.raises(ValueError):
        meqn_push_back_arg(idx, 4, 4, in_pos=1)


def test_equation_cache_and_print():
    m, n = 4, 4
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.ADD)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, n, in_pos=1)
    s = meqn_tree_print(idx)
    assert "BINARY ADD" in s and "ARG[0]" in s
    k1 = dispatch_meqn(idx, m, n)
    # identical tree in a NEW equation -> same cached kernel
    idx2 = meqn_create()
    meqn_push_back_binary_op(idx2, BinaryType.ADD)
    meqn_push_back_arg(idx2, m, n, in_pos=0)
    meqn_push_back_arg(idx2, m, n, in_pos=1)
    k2 = dispatch_meqn(idx2, m, n)
    assert k1 is k2
    meqn_destroy(idx)
    meqn_destroy(idx2)


def test_equation_matmul_trans_variants():
    # reference enum include/libxsmm_typedefs.h:391-393 — MATMUL_{B,A,AB}_TRANS
    m, k, n = 12, 8, 16
    a, b = _r(m, k), _r(k, n)
    for op, lhs, rhs in [
        (BinaryType.MATMUL_B_TRANS, a, np.ascontiguousarray(b.T)),
        (BinaryType.MATMUL_A_TRANS, np.ascontiguousarray(a.T), b),
        (BinaryType.MATMUL_A_TRANS_B_TRANS, np.ascontiguousarray(a.T),
         np.ascontiguousarray(b.T)),
    ]:
        idx = meqn_create()
        meqn_push_back_binary_op(idx, op)
        meqn_push_back_arg(idx, *lhs.shape, in_pos=0)
        meqn_push_back_arg(idx, *rhs.shape, in_pos=1)
        kern = dispatch_meqn(idx, m, n)
        check(a @ b, np.asarray(kern(lhs, rhs)), margin=1e-5)
        meqn_destroy(idx)


def test_equation_brgemm_trans_variants():
    # reference enum :383-386 — BRGEMM_{B,A,AB}_TRANS; trans must hit the
    # trailing 2 dims only (batch dim preserved)
    br, m, k, n = 3, 8, 6, 10
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    want = np.einsum("bmk,bkn->mn", a, b)
    for op, lhs, rhs in [
        (BinaryType.BRGEMM_B_TRANS, a, np.ascontiguousarray(
            b.transpose(0, 2, 1))),
        (BinaryType.BRGEMM_A_TRANS, np.ascontiguousarray(
            a.transpose(0, 2, 1)), b),
        (BinaryType.BRGEMM_A_TRANS_B_TRANS,
         np.ascontiguousarray(a.transpose(0, 2, 1)),
         np.ascontiguousarray(b.transpose(0, 2, 1))),
    ]:
        idx = meqn_create()
        meqn_push_back_binary_op(idx, op)
        meqn_push_back_arg(idx, lhs.shape[1], lhs.shape[2], in_pos=0)
        meqn_push_back_arg(idx, rhs.shape[1], rhs.shape[2], in_pos=1)
        kern = dispatch_meqn(idx, m, n)
        check(want, np.asarray(kern(lhs, rhs)), margin=1e-5)
        meqn_destroy(idx)


def test_equation_matmul_a_vnni():
    # A stored in VNNI2 (bf16) layout; node un-interleaves before the dot
    # (reference enum :394 MATMUL_A_VNNI)
    from libxsmm_tpu.ops.eltwise import _norm_to_vnni
    import jax.numpy as jnp
    m, k, n = 8, 6, 16
    a = _r(m, k).astype(np.float32)
    b = _r(k, n)
    a_bf16 = np.asarray(jnp.asarray(a, dtype=jnp.bfloat16))
    a_vnni = np.asarray(_norm_to_vnni(jnp.asarray(a_bf16), 2, pad=False))
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.MATMUL_A_VNNI)
    meqn_push_back_arg(idx, m // 2, k * 2, in_pos=0, dtype=Datatype.BF16)
    meqn_push_back_arg(idx, k, n, in_pos=1)
    kern = dispatch_meqn(idx, m, n)
    want = a_bf16.astype(np.float32) @ b
    check(want, np.asarray(kern(a_vnni, b)), margin=1e-2)
    meqn_destroy(idx)


def test_equation_ternary_matmul_a_trans():
    # ternary MATMUL_A_TRANS: out = A^T-stored matmul + C (enum :438)
    m, k, n = 10, 4, 12
    a_t, b, c = _r(k, m), _r(k, n), _r(m, n)
    idx = meqn_create()
    meqn_push_back_ternary_op(idx, TernaryType.MATMUL_A_TRANS)
    meqn_push_back_arg(idx, k, m, in_pos=0)
    meqn_push_back_arg(idx, k, n, in_pos=1)
    meqn_push_back_arg(idx, m, n, in_pos=2)
    kern = dispatch_meqn(idx, m, n)
    check(a_t.T @ b + c, np.asarray(kern(a_t, b, c)), margin=1e-5)
    meqn_destroy(idx)


def test_equation_f64_tree_runs_f64():
    # VERDICT r2 #5: per-node dtypes honored — an F64 layernorm-style tree
    # must hit f64 tolerance (it fails at f32 noise if comp is hardcoded).
    m, n = 24, 48
    rng = np.random.default_rng(7)
    # large dynamic range so f32 compute visibly breaks 1e-12 tolerance
    x = (rng.standard_normal((m, n)) * 1e6).astype(np.float64)
    mean = x.mean(axis=1, keepdims=True)
    rstd = 1.0 / np.sqrt(x.var(axis=1, keepdims=True) + 1e-12)
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.MUL, dtype=Datatype.F64)
    meqn_push_back_binary_op(idx, BinaryType.SUB, dtype=Datatype.F64)
    meqn_push_back_arg(idx, m, n, in_pos=0, dtype=Datatype.F64)
    meqn_push_back_arg(idx, m, 1, in_pos=1, dtype=Datatype.F64)
    meqn_push_back_arg(idx, m, 1, in_pos=2, dtype=Datatype.F64)
    kern = dispatch_meqn(idx, m, n, out_type=Datatype.F64)
    got = np.asarray(kern(x, mean, rstd))
    assert got.dtype == np.float64
    ref = (x - mean) * rstd
    assert np.abs(got - ref).max() <= 1e-12 * np.abs(ref).max()
    meqn_destroy(idx)


def test_equation_mixed_bf16_f32_tree():
    # bf16 node computes at bf16 storage precision, f32 node at f32:
    # out = f32_ADD( bf16_MUL(a, b), c ) — the bf16 product must match a
    # bf16-rounded oracle, not the f32 product.
    import jax.numpy as jnp
    m, n = 16, 32
    rng = np.random.default_rng(8)
    a = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal((m, n)).astype(np.float32)
    c = rng.standard_normal((m, n)).astype(np.float32)
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.ADD, dtype=Datatype.F32)
    meqn_push_back_binary_op(idx, BinaryType.MUL, dtype=Datatype.BF16)
    meqn_push_back_arg(idx, m, n, in_pos=0, dtype=Datatype.BF16)
    meqn_push_back_arg(idx, m, n, in_pos=1, dtype=Datatype.BF16)
    meqn_push_back_arg(idx, m, n, in_pos=2, dtype=Datatype.F32)
    kern = dispatch_meqn(idx, m, n)
    got = np.asarray(kern(a, b, c))
    # bf16 node contract: inputs are read at bf16 STORAGE precision. (The
    # product itself may legally be computed at higher precision — XLA
    # fuses bf16-mul-into-f32-convert to an f32 multiply; the jaxpr carries
    # the bf16 mul.) Oracle: f32 product of bf16-rounded inputs; allow one
    # bf16 rounding of the product either way.
    abf = np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
    bbf = np.asarray(jnp.asarray(b, jnp.bfloat16), np.float32)
    ref = abf * bbf + c
    assert np.abs(got - ref).max() <= 2.0 ** -8 * np.abs(ref).max()
    # The bf16 storage rounding must be IN THE TRACE. (Asserting the runtime
    # result differs from the all-f32 evaluation is backend-dependent: TPU
    # compiles with --xla_allow_excess_precision, which may legally elide
    # the f32->bf16->f32 round trip. The jaxpr contract is what we own.)
    import jax
    from libxsmm_tpu.ops.equation import _eval, _eqn
    jaxpr = jax.make_jaxpr(
        lambda aa, bb, cc: _eval(_eqn(idx).root, (aa, bb, cc), memo={},
                                 sig_cache={}))(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    bf16_converts = [
        e for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "convert_element_type"
        and e.params.get("new_dtype") == jnp.bfloat16
    ]
    assert len(bf16_converts) >= 2, jaxpr  # both bf16 args rounded at read
    meqn_destroy(idx)


def test_equation_shared_subtree_memoized():
    # structurally identical subtrees evaluate once per call (the tmp-reuse
    # contract): count traced multiplies via jaxpr
    import jax
    import jax.numpy as jnp
    m, n = 8, 8
    idx = meqn_create()
    # ADD( MUL(x, x), MUL(x, x) ) pushed twice -> one traced MUL
    meqn_push_back_binary_op(idx, BinaryType.ADD)
    meqn_push_back_binary_op(idx, BinaryType.MUL)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_binary_op(idx, BinaryType.MUL)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    kern = dispatch_meqn(idx, m, n)
    x = np.random.default_rng(9).standard_normal((m, n)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(kern(x)), x * x + x * x,
                               rtol=1e-6)
    from libxsmm_tpu.ops.equation import _eval, _eqn
    jaxpr = jax.make_jaxpr(
        lambda a: _eval(_eqn(idx).root, (a,), memo={}, sig_cache={}))(
            jnp.asarray(x))
    muls = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "mul"]
    assert len(muls) == 1, f"shared subtree evaluated twice: {jaxpr}"
    meqn_destroy(idx)


def test_equation_nflops_accounting():
    # matmul node contributes 2*m*n*k; eltwise nodes m*n each
    m, k, n = 8, 6, 16
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.RELU)
    meqn_push_back_binary_op(idx, BinaryType.MATMUL)
    meqn_push_back_arg(idx, m, k, in_pos=0)
    meqn_push_back_arg(idx, k, n, in_pos=1)
    kern = dispatch_meqn(idx, m, n)
    from libxsmm_tpu import get_kernel_info
    nf = get_kernel_info(kern).nflops
    assert nf == 2 * m * n * k + m * n, nf
    meqn_destroy(idx)


def test_equation_nflops_nested_matmul():
    # each matmul node is costed at its OWN dims (bottom-up shape
    # inference), not the root output's: A(8,6) @ (B(6,12) @ C(12,16))
    m, k1, k2, n = 8, 6, 12, 16
    idx = meqn_create()
    meqn_push_back_binary_op(idx, BinaryType.MATMUL)
    meqn_push_back_arg(idx, m, k1, in_pos=0)
    meqn_push_back_binary_op(idx, BinaryType.MATMUL)
    meqn_push_back_arg(idx, k1, k2, in_pos=1)
    meqn_push_back_arg(idx, k2, n, in_pos=2)
    kern = dispatch_meqn(idx, m, n)
    from libxsmm_tpu import get_kernel_info
    nf = get_kernel_info(kern).nflops
    want = 2 * k1 * n * k2 + 2 * m * n * k1   # inner + outer
    assert nf == want, (nf, want)
    a = np.random.default_rng(3).standard_normal((m, k1)).astype(np.float32)
    b = np.random.default_rng(4).standard_normal((k1, k2)).astype(np.float32)
    c = np.random.default_rng(5).standard_normal((k2, n)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(kern(a, b, c)), a @ (b @ c),
                               rtol=1e-4)
    meqn_destroy(idx)


def test_equation_gather_node():
    # in-tree UNARY_GATHER with op_arg_pos index binding
    # (equation_gather_reduce.c:150-152: indices ride arg.secondary)
    m, n, ncols = 16, 64, 10
    x = _r(m, n)
    cols = np.random.default_rng(3).choice(n, ncols,
                                           replace=False).astype(np.int32)
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.REDUCE_X_OP_ADD,
                            flags=UnaryFlags.REDUCE_COLS)
    meqn_push_back_unary_op(idx, UnaryType.GATHER,
                            flags=UnaryFlags.GS_COLS, op_arg_pos=1)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    kern = dispatch_meqn(idx, 1, ncols)
    out = np.asarray(kern(x, cols))
    check(x[:, cols].sum(axis=0, keepdims=True), out)
    # rows flavor
    idx2 = meqn_create()
    meqn_push_back_unary_op(idx2, UnaryType.GATHER,
                            flags=UnaryFlags.GS_ROWS, op_arg_pos=1)
    meqn_push_back_arg(idx2, m, n, in_pos=0)
    rows = np.asarray([3, 1, 7], np.int32)
    k2 = dispatch_meqn(idx2, 3, n)
    check(x[rows], np.asarray(k2(x, rows)))
    # missing op_arg_pos is a build-time error
    idx3 = meqn_create()
    with pytest.raises(ValueError):
        meqn_push_back_unary_op(idx3, UnaryType.GATHER)


def test_equation_reduce_cols_idx_node():
    m, n = 16, 32
    x = _r(m, n)
    rows = np.asarray([0, 5, 9, 2], np.int32)
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.REDUCE_COLS_IDX_OP_ADD,
                            op_arg_pos=1)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    kern = dispatch_meqn(idx, 1, n)
    check(x[rows].sum(axis=0, keepdims=True), np.asarray(kern(x, rows)))


def test_equation_zip_unzip_split_sgd():
    # raw-bit splitSGD: UNZIP(NMULADD(lr, g, ZIP(lo, hi)))
    # (equation_splitSGD.c:180-193)
    m, n = 16, 32
    w, g = _r(m, n), _r(m, n)
    lr = np.asarray([[0.01]], np.float32)
    bits = w.view(np.uint32)
    lo = (bits & 0xFFFF).astype(np.uint16)
    hi = (bits >> 16).astype(np.uint16)
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.UNZIP)
    meqn_push_back_ternary_op(idx, TernaryType.NMULADD,
                              flags=TernaryFlags.BCAST_SCALAR_IN_0)
    meqn_push_back_arg(idx, 1, 1, in_pos=0)
    meqn_push_back_arg(idx, m, n, in_pos=1)
    meqn_push_back_binary_op(idx, BinaryType.ZIP)
    meqn_push_back_arg(idx, m, n, in_pos=2, dtype=Datatype.U16)
    meqn_push_back_arg(idx, m, n, in_pos=3, dtype=Datatype.U16)
    kern = dispatch_meqn(idx, m, n, out_type=Datatype.U16)
    lo2, hi2 = kern(lr, g, lo, hi)
    wnew = ((np.asarray(hi2).astype(np.uint32) << 16)
            | np.asarray(lo2).astype(np.uint32)).view(np.float32)
    check(w - 0.01 * g, wnew)


def test_equation_unzip_root_only():
    m, n = 8, 16
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.X2)      # consumes the UNZIP pair
    meqn_push_back_unary_op(idx, UnaryType.UNZIP)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    kern = dispatch_meqn(idx, m, n)
    with pytest.raises(ValueError, match="root-only"):
        kern(_r(m, n))


def test_meltw_shape_form_flags_honored():
    # regression: flags passed third with the v2 shape form were silently
    # dropped (overwritten by the n-slot unpack)
    from libxsmm_tpu.descriptor import (create_meltw_binary_shape,
                                        create_meltw_unary_shape)
    import libxsmm_tpu as xt
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    cols = np.asarray([2, 0], np.int32)
    k = xt.dispatch_meltw_unary(UnaryType.GATHER,
                                create_meltw_unary_shape(3, 4),
                                UnaryFlags.GS_COLS)
    out = np.asarray(k(x, cols))
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out, x[:, [2, 0]])
    kb = xt.dispatch_meltw_binary(BinaryType.MUL,
                                  create_meltw_binary_shape(3, 4),
                                  BinaryFlags.BCAST_COL_IN_1)
    outb = np.asarray(kb(x, np.asarray([[1., 2., 3., 4.]], np.float32)))
    np.testing.assert_allclose(outb, x * np.asarray([1, 2, 3, 4.]))


def test_equation_set_args_brgemm():
    # MATRIX_ARG_TYPE_SET tensor-set args feeding an in-tree BRGEMM
    # (typedefs.h:641-646; all reference set addressing modes collapse to
    # the stacked (count, m, n) array contract here)
    from libxsmm_tpu.ops.equation import (create_matrix_arg_attributes,
                                          create_meqn_arg_metadata,
                                          create_meqn_arg_shape)
    br, m, k, n = 4, 8, 6, 10
    a, b = _r(br, m, k), _r(br, k, n)
    idx = meqn_create()
    set_attr = create_matrix_arg_attributes(
        arg_type=1, set_type=3, set_cardinality_hint=br)
    meqn_push_back_binary_op(idx, BinaryType.BRGEMM)
    meqn_push_back_arg(create_meqn_arg_metadata(idx, 0),
                       create_meqn_arg_shape(m, k, 0), set_attr)
    meqn_push_back_arg(create_meqn_arg_metadata(idx, 1),
                       create_meqn_arg_shape(k, n, 0), set_attr)
    kern = dispatch_meqn(idx, m, n)
    check(np.einsum("bmk,bkn->mn", a, b), np.asarray(kern(a, b)),
          margin=1e-5)
    # cardinality mismatch is a call-time error
    with pytest.raises(ValueError, match="cardinality"):
        kern(a[:2], b)
    # unknown set_type is a build-time error
    with pytest.raises(ValueError):
        meqn_push_back_arg(
            create_meqn_arg_metadata(meqn_create(), 0),
            create_meqn_arg_shape(m, k, 0),
            create_matrix_arg_attributes(arg_type=1, set_type=9))


def test_equation_nflops_gather_refined():
    """Index-consuming nodes are costed at POST-gather dims: the static
    estimate can't know the index length, so the kernel refines nflops on
    its first call from the real index vector (gather_dot shape: ops above
    the GATHER cost m*ncols, not m*n)."""
    m, n, ncols = 16, 64, 8
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.REDUCE_X_OP_ADD,
                            flags=UnaryFlags.REDUCE_COLS)
    meqn_push_back_binary_op(idx, BinaryType.MUL)
    meqn_push_back_unary_op(idx, UnaryType.GATHER,
                            flags=UnaryFlags.GS_COLS, op_arg_pos=2)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    meqn_push_back_arg(idx, m, ncols, in_pos=1)
    kern = dispatch_meqn(idx, 1, ncols)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((m, n)).astype(np.float32)
    y = rng.standard_normal((m, ncols)).astype(np.float32)
    cols = rng.choice(n, ncols, replace=False).astype(np.int32)
    out = np.asarray(kern(x, y, cols))
    np.testing.assert_allclose(out, (x[:, cols] * y).sum(axis=0,
                                                         keepdims=True),
                               rtol=1e-4)
    from libxsmm_tpu import get_kernel_info
    nf = get_kernel_info(kern).nflops
    # gather m*ncols + mul m*ncols + reduce input m*ncols — the naive
    # pre-gather costing would put the gather and everything above at m*n
    want = 3 * m * ncols
    assert nf == want, (nf, want)
    meqn_destroy(idx)


def test_equation_in_pos_validation():
    """A negative (or omitted) in_pos must be a build-time error: at eval
    time args[-1] would silently alias the LAST argument (no reference
    kernel can be generated from a negative position either)."""
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.X2)
    with pytest.raises(ValueError, match="in_pos"):
        meqn_push_back_arg(idx, 8, 8, in_pos=-1)
    with pytest.raises(ValueError, match="in_pos"):
        meqn_push_back_arg(idx, 8, 8)  # flattened form without in_pos
    meqn_push_back_arg(idx, 8, 8, in_pos=0)  # tree stays completable
    dispatch_meqn(idx, 8, 8)
    meqn_destroy(idx)


def test_equation_unzip_out_type_validated():
    """UNZIP roots emit raw uint16 bit halves; any float out_type would
    VALUE-cast the bit patterns (0x3F80 -> 16256.0) and silently destroy
    the split contract, so dispatch must reject it."""
    m, n = 8, 16
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.UNZIP)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    with pytest.raises(ValueError, match="16-bit"):
        dispatch_meqn(idx, m, n)  # default out_type=F32
    kern = dispatch_meqn(idx, m, n, out_type=Datatype.U16)
    x = _r(m, n)
    lo, hi = kern(x)
    bits = x.view(np.uint32)
    np.testing.assert_array_equal(np.asarray(lo),
                                  (bits & 0xFFFF).astype(np.uint16))
    np.testing.assert_array_equal(np.asarray(hi),
                                  (bits >> 16).astype(np.uint16))
    meqn_destroy(idx)


def test_equation_set_args_nflops_cardinality():
    """BRGEMM nodes over tensor-set args cost 2*m*n*k*cardinality: the
    kernel reduces `card` matmuls, and GFLOP/s introspection built on
    get_kernel_info would under-report card-fold otherwise."""
    from libxsmm_tpu import get_kernel_info
    from libxsmm_tpu.ops.equation import (create_matrix_arg_attributes,
                                          create_meqn_arg_metadata,
                                          create_meqn_arg_shape)
    br, m, k, n = 4, 8, 6, 10
    idx = meqn_create()
    set_attr = create_matrix_arg_attributes(
        arg_type=1, set_type=3, set_cardinality_hint=br)
    meqn_push_back_binary_op(idx, BinaryType.BRGEMM)
    meqn_push_back_arg(create_meqn_arg_metadata(idx, 0),
                       create_meqn_arg_shape(m, k, 0), set_attr)
    meqn_push_back_arg(create_meqn_arg_metadata(idx, 1),
                       create_meqn_arg_shape(k, n, 0), set_attr)
    kern = dispatch_meqn(idx, m, n)
    assert get_kernel_info(kern).nflops == 2 * m * n * k * br
    meqn_destroy(idx)


def test_equation_nflops_gather_rechecked_per_call():
    """The registry caches the meqn Kernel for the tree's lifetime; a later
    call with a DIFFERENT index-vector length must re-refine nflops (a
    one-shot refinement froze the first call's cost into all later
    introspection). Idx-reduce outputs are (1, n) regardless of the index
    length, so the SAME kernel legitimately sees varying lengths."""
    from libxsmm_tpu import get_kernel_info
    m, n = 16, 64
    idx = meqn_create()
    meqn_push_back_unary_op(idx, UnaryType.REDUCE_COLS_IDX_OP_ADD,
                            op_arg_pos=1)
    meqn_push_back_arg(idx, m, n, in_pos=0)
    kern = dispatch_meqn(idx, 1, n)
    x = _r(m, n)
    for rows in (4, 12):
        ridx = np.arange(rows, dtype=np.int32)
        out = np.asarray(kern(x, ridx))
        np.testing.assert_allclose(out, x[:rows].sum(0, keepdims=True),
                                   rtol=1e-5)
        assert get_kernel_info(kern).nflops == rows * n, rows
    meqn_destroy(idx)
