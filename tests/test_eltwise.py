"""Element-wise TPP tests — per-op golden compare vs NumPy.

Models samples/eltwise drivers (unary simple/relu/dropout/reduce/transform/
gather-scatter/quant, binary, ternary) with randomized shapes, SURVEY.md §2.7.
"""

import numpy as np
import pytest
import scipy.special

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryFlags, BinaryType, TernaryFlags,
                                    TernaryType, UnaryFlags, UnaryType)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import check

RNG = np.random.default_rng(7)


def _rand(shape, dtype=np.float32):
    return RNG.standard_normal(shape).astype(dtype)


SHAPES = [(16, 16), (13, 5), (1, 64), (33, 7)]

UNARY_CASES = {
    UnaryType.IDENTITY: lambda x: x,
    UnaryType.XOR: np.zeros_like,
    UnaryType.X2: lambda x: x * x,
    UnaryType.SQRT: lambda x: np.sqrt(np.abs(x)),
    UnaryType.RELU: lambda x: np.maximum(x, 0),
    UnaryType.TANH: np.tanh,
    UnaryType.SIGMOID: lambda x: 1 / (1 + np.exp(-x)),
    UnaryType.GELU: lambda x: 0.5 * x * (1 + scipy.special.erf(x / np.sqrt(2))),
    UnaryType.NEGATE: lambda x: -x,
    UnaryType.INC: lambda x: x + 1,
    UnaryType.RECIPROCAL: lambda x: 1.0 / x,
    UnaryType.RECIPROCAL_SQRT: lambda x: 1.0 / np.sqrt(np.abs(x)),
    UnaryType.EXP: np.exp,
}


@pytest.mark.parametrize("op", list(UNARY_CASES))
@pytest.mark.parametrize("m,n", [(16, 16), (13, 5)])
def test_unary_math(op, m, n):
    x = _rand((m, n))
    if op in (UnaryType.SQRT, UnaryType.RECIPROCAL_SQRT):
        x = np.abs(x) + 0.1
    if op == UnaryType.RECIPROCAL:
        x = x + np.sign(x) * 0.5
    kern = xt.dispatch_meltw_unary(op, m, n)
    # transcendentals: XLA's vectorized approximations differ from libm by
    # a few ulp beyond f32 round-off
    margin = 1e-4 if op in (UnaryType.TANH, UnaryType.SIGMOID, UnaryType.GELU,
                            UnaryType.EXP) else 1e-5
    check(UNARY_CASES[op](x), np.asarray(kern(x)), margin=margin)


def test_unary_bcast_row_col_scalar():
    m, n = 8, 12
    row = _rand((m, 1))
    kern = xt.dispatch_meltw_unary(UnaryType.IDENTITY, m, n,
                                   UnaryFlags.BCAST_ROW)
    check(np.broadcast_to(row, (m, n)), np.asarray(kern(row)))
    col = _rand((1, n))
    kern = xt.dispatch_meltw_unary(UnaryType.IDENTITY, m, n,
                                   UnaryFlags.BCAST_COL)
    check(np.broadcast_to(col, (m, n)), np.asarray(kern(col)))
    s = _rand((1, 1))
    kern = xt.dispatch_meltw_unary(UnaryType.IDENTITY, m, n,
                                   UnaryFlags.BCAST_SCALAR)
    check(np.broadcast_to(s, (m, n)), np.asarray(kern(s)))


@pytest.mark.parametrize("op,npop", [
    (UnaryType.REDUCE_X_OP_ADD, np.sum),
    (UnaryType.REDUCE_X_OP_MAX, np.max),
    (UnaryType.REDUCE_X_OP_MIN, np.min),
    (UnaryType.REDUCE_X_OP_MUL, np.prod),
])
@pytest.mark.parametrize("rows", [True, False])
def test_unary_reduce(op, npop, rows):
    m, n = 9, 6
    x = _rand((m, n)) * 0.5
    flags = UnaryFlags.REDUCE_ROWS if rows else UnaryFlags.REDUCE_COLS
    kern = xt.dispatch_meltw_unary(op, m, n, flags)
    ref = npop(x, axis=1 if rows else 0, keepdims=True)
    check(ref, np.asarray(kern(x)), margin=1e-5)


def test_unary_reduce_x2_and_scalar():
    m, n = 7, 5
    x = _rand((m, n))
    kern = xt.dispatch_meltw_unary(UnaryType.REDUCE_X2_OP_ADD, m, n,
                                   UnaryFlags.REDUCE_COLS)
    check((x * x).sum(axis=0, keepdims=True), np.asarray(kern(x)), margin=1e-5)
    kern = xt.dispatch_meltw_unary(UnaryType.REDUCE_TO_SCALAR_OP_ADD, m, n)
    check(np.asarray([[x.sum()]]), np.asarray(kern(x)), margin=1e-5)
    kern = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_OP_ABSMAX, m, n,
                                   UnaryFlags.REDUCE_COLS)
    check(np.abs(x).max(axis=0, keepdims=True), np.asarray(kern(x)))


def test_transpose():
    m, n = 13, 6
    x = _rand((m, n))
    kern = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_NORMT, m, n)
    check(x.T, np.asarray(kern(x)))


@pytest.mark.parametrize("k", [4, 8])
def test_vnni_roundtrip(k):
    m, n = 16, 8
    x = _rand((m, n))
    to_op = getattr(UnaryType, f"TRANSFORM_NORM_TO_VNNI{k}")
    from_op = getattr(UnaryType, f"TRANSFORM_VNNI{k}_TO_NORM")
    to_k = xt.dispatch_meltw_unary(to_op, m, n)
    v = np.asarray(to_k(x))
    assert v.shape == (m // k, n * k)
    from_k = xt.dispatch_meltw_unary(from_op, m, n)
    check(x, np.asarray(from_k(v)))


def test_vnni2_layout():
    # VNNI2 element (i, j) of NORM lives at v[i//2, j*2 + i%2]
    m, n = 8, 4
    x = _rand((m, n))
    kern = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_VNNI2, m, n)
    v = np.asarray(kern(x))
    assert v.shape == (m // 2, n * 2)
    ref = x.reshape(m // 2, 2, n).transpose(0, 2, 1).reshape(m // 2, 2 * n)
    check(ref, v)
    # and VNNI2T -> NORM inverts NORM_TO_VNNI2T
    tk = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_VNNI2T, m, n)
    vt = np.asarray(tk(x))
    back = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_VNNI2T_TO_NORM, m, n)
    check(x, np.asarray(back(vt)))


def test_vnni_pad():
    m, n = 13, 6   # m not divisible by 4
    x = _rand((m, n))
    kern = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_VNNI4_PAD, m, n)
    v = np.asarray(kern(x))
    assert v.shape == (4, n * 4)
    # unpad roundtrip
    back = v.reshape(4, n, 4).transpose(0, 2, 1).reshape(16, n)[:m]
    check(x, back)


def test_pad_mod():
    m, n = 13, 6
    x = _rand((m, n))
    kern = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_PADNM_MOD4, m, n)
    y = np.asarray(kern(x))
    assert y.shape == (16, 8)
    check(x, y[:m, :n])
    assert np.all(y[m:, :] == 0) and np.all(y[:, n:] == 0)


def test_gather_scatter_rows():
    m, n = 10, 6
    x = _rand((m, n))
    idx = np.asarray([0, 3, 7], np.int32)
    kern = xt.dispatch_meltw_unary(UnaryType.GATHER, m, n)
    check(x[idx], np.asarray(kern(x, idx)))
    out0 = np.zeros((m, n), np.float32)
    scat = xt.dispatch_meltw_unary(UnaryType.SCATTER, 3, n)
    res = np.asarray(scat(x[idx], idx, out0))
    ref = out0.copy()
    ref[idx] = x[idx]
    check(ref, res)


def test_reduce_cols_idx():
    m, n = 12, 5
    x = _rand((m, n))
    idx = np.asarray([1, 4, 4, 9], np.int32)
    kern = xt.dispatch_meltw_unary(UnaryType.REDUCE_COLS_IDX_OP_ADD, m, n)
    check(x[idx].sum(axis=0, keepdims=True), np.asarray(kern(x, idx)),
          margin=1e-5)


def test_unzip_zip_roundtrip():
    m, n = 8, 8
    x = _rand((m, n))
    unzip = xt.dispatch_meltw_unary(UnaryType.UNZIP, m, n)
    lo, hi = unzip(x)
    z = xt.dispatch_meltw_binary(BinaryType.ZIP, m, n,
                                 in_type=Datatype.U16, out_type=Datatype.F32)
    check(x, np.asarray(z(lo, hi)))


def _np_pack_bitmask(mask, two_byte_mult=True):
    """Independent NumPy oracle of the reference bit layout
    (generator_mateltwise_reference_impl.c:151-175 set/extract_bit with
    mask_ld = UPDIV(ld,16)*16): bit (i,j) -> byte[j//8 + i*ld/8], 1<<(j%8)."""
    m, n = mask.shape
    ld = ((n + 15) // 16) * 16 if two_byte_mult else n
    out = np.zeros((m, ld // 8), np.uint8)
    for i in range(m):
        for j in range(n):
            if mask[i, j]:
                out[i, j // 8] |= np.uint8(1 << (j % 8))
    return out


def test_dropout_and_inv():
    m, n = 64, 64
    x = np.abs(_rand((m, n))) + 1.0
    p = 0.3
    kern = xt.dispatch_meltw_unary(UnaryType.DROPOUT, m, n,
                                   UnaryFlags.BITMASK_2BYTEMULT, extra=(p,))
    out, pmask = kern(x, seed=3)
    out, pmask = np.asarray(out), np.asarray(pmask)
    # side output is the PACKED reference bit layout
    assert pmask.shape == (m, ((n + 15) // 16) * 16 // 8)
    mask = np.asarray(xt.unpack_bitmask(pmask, m, n))
    np.testing.assert_array_equal(_np_pack_bitmask(mask), pmask)
    frac = mask.mean()
    assert 0.6 < frac < 0.8          # keep-rate ~ 1-p
    np.testing.assert_allclose(out[mask], x[mask] / (1 - p), rtol=1e-6)
    assert np.all(out[~mask] == 0)
    inv = xt.dispatch_meltw_unary(UnaryType.DROPOUT_INV, m, n,
                                  UnaryFlags.BITMASK_2BYTEMULT, extra=(p,))
    g = _rand((m, n))
    giv = np.asarray(inv(g, pmask))
    np.testing.assert_allclose(giv[mask], g[mask] / (1 - p), rtol=1e-6)
    assert np.all(giv[~mask] == 0)


def test_relu_bitmask_roundtrip():
    """RELU fwd emits the packed mask; RELU_INV consumes it
    (generator_mateltwise_reference_impl.c:2140-2195)."""
    m, n = 24, 40                     # n not a multiple of 16: pad to 48 bits
    x = _rand((m, n))
    fwd = xt.dispatch_meltw_unary(UnaryType.RELU, m, n,
                                  UnaryFlags.BITMASK_2BYTEMULT)
    out, pmask = fwd(x)
    out, pmask = np.asarray(out), np.asarray(pmask)
    np.testing.assert_allclose(out, np.maximum(x, 0), rtol=1e-6)
    np.testing.assert_array_equal(_np_pack_bitmask(x > 0), pmask)
    g = _rand((m, n))
    inv = xt.dispatch_meltw_unary(UnaryType.RELU_INV, m, n,
                                  UnaryFlags.BITMASK_2BYTEMULT)
    giv = np.asarray(inv(g, pmask))
    np.testing.assert_allclose(giv, np.where(x > 0, g, 0.0), rtol=1e-6)


def test_leaky_relu_runtime_alpha():
    m, n = 16, 32
    x = _rand((m, n))
    for alpha in (0.01, 0.2, 0.7):
        fwd = xt.dispatch_meltw_unary(UnaryType.LEAKY_RELU, m, n,
                                      UnaryFlags.BITMASK_2BYTEMULT)
        out, pmask = fwd(x, alpha=alpha)
        np.testing.assert_allclose(np.asarray(out),
                                   np.where(x > 0, x, alpha * x), rtol=1e-5)
        inv = xt.dispatch_meltw_unary(UnaryType.LEAKY_RELU_INV, m, n,
                                      UnaryFlags.BITMASK_2BYTEMULT)
        g = _rand((m, n))
        giv = np.asarray(inv(g, np.asarray(pmask), alpha=alpha))
        np.testing.assert_allclose(giv, np.where(x > 0, g, alpha * g),
                                   rtol=1e-5)


def test_elu_inv_reference_semantics():
    """ELU_INV takes (grad, saved forward OUTPUT, alpha): out = out_fwd > 0
    ? grad : grad * (out_fwd + alpha) (impl.c:2186-2189)."""
    m, n = 16, 32
    x = _rand((m, n))
    alpha = 1.3
    fwd = xt.dispatch_meltw_unary(UnaryType.ELU, m, n)
    out_fwd = np.asarray(fwd(x, alpha=alpha))
    # atol absorbs the TPU VPU's expm1 accuracy (~1e-4 rel near -1)
    np.testing.assert_allclose(out_fwd,
                               np.where(x > 0, x, alpha * np.expm1(x)),
                               rtol=1e-5, atol=1e-5)
    inv = xt.dispatch_meltw_unary(UnaryType.ELU_INV, m, n)
    g = _rand((m, n))
    giv = np.asarray(inv(g, out_fwd, alpha=alpha))
    want = np.where(out_fwd > 0, g, g * (out_fwd + alpha))
    np.testing.assert_allclose(giv, want, rtol=1e-5, atol=1e-5)
    # and the identity that makes it the elu gradient: out_fwd + alpha
    # == alpha*exp(x) for x <= 0
    np.testing.assert_allclose(giv[x <= 0], (g * alpha * np.exp(x))[x <= 0],
                               rtol=1e-4, atol=1e-4)


def test_quant_flag_parity():
    """NO_SCF_QUANT / SIGN_SAT_QUANT / wraparound semantics
    (impl.c:2197-2258)."""
    m, n = 8, 16
    x = (_rand((m, n)) * 300.0).astype(np.float32)   # overflows i8
    scale = 1.0
    rint = np.round(x * scale)
    # default: wraparound low byte, (char)(0xff & (int)rint)
    q = xt.dispatch_meltw_unary(UnaryType.QUANT, m, n, out_type=Datatype.I8)
    np.testing.assert_array_equal(np.asarray(q(x, scale)),
                                  rint.astype(np.int32).astype(np.int8))
    # SIGN_SAT: clamp [-128, 127]
    qs = xt.dispatch_meltw_unary(UnaryType.QUANT, m, n,
                                 UnaryFlags.SIGN_SAT_QUANT,
                                 out_type=Datatype.I8)
    np.testing.assert_array_equal(
        np.asarray(qs(x, scale)),
        np.clip(rint, -128, 127).astype(np.int8))
    # NO_SCF: the scale operand is ignored (scf = 1)
    qn = xt.dispatch_meltw_unary(UnaryType.QUANT, m, n,
                                 UnaryFlags.NO_SCF_QUANT
                                 | UnaryFlags.SIGN_SAT_QUANT,
                                 out_type=Datatype.I8)
    np.testing.assert_array_equal(np.asarray(qn(x, 1000.0)),
                                  np.clip(np.round(x), -128, 127)
                                  .astype(np.int8))


def _np_encode_e2m1(a):
    """NumPy port of libxsmm_ref_encode_e2m1_abs (impl.c:1870-1882)."""
    code = ((a > 0.25).astype(np.int32) + (a >= 0.75) + (a > 1.25)
            + (a >= 1.75) + (a > 2.5) + (a >= 3.5) + (a > 5.0))
    return np.where(np.isnan(a), 7, code)


def _np_e8m0_scale(amax, elem_emax):
    shared = ((amax.astype(np.float32).view(np.uint32) >> 23) & 0xFF
              ).astype(np.int32) - elem_emax
    shared = np.clip(shared, 0, 254)
    scale = np.where(shared == 0, np.float32(2.0) ** -127,
                     np.exp2((shared - 127).astype(np.float64))
                     ).astype(np.float32)
    return scale, shared.astype(np.uint8)


def _np_mxfp4_blocks(x):
    """Independent port of libxsmm_ref_fp32_to_mxfp4_block."""
    m, n = x.shape
    xb = x.reshape(m, n // 32, 32)
    scale, scode = _np_e8m0_scale(np.abs(xb).max(-1, keepdims=True), 2)
    sign = ((xb.view(np.uint32) >> 31) << 3).astype(np.int32)
    code = sign | _np_encode_e2m1(np.abs(xb / scale))
    code = code.reshape(m, n)
    return ((code[:, 1::2] << 4) | code[:, 0::2]).astype(np.uint8), \
        scode.reshape(m, n // 32)


def _np_mxbf8_blocks(x):
    import ml_dtypes
    m, n = x.shape
    xb = x.reshape(m, n // 32, 32)
    scale, scode = _np_e8m0_scale(np.abs(xb).max(-1, keepdims=True), 15)
    q = (xb / scale).astype(np.float16).astype(ml_dtypes.float8_e5m2)
    return q.reshape(m, n).view(np.uint8), scode.reshape(m, n // 32)


def _np_nvfp4_blocks(x):
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    m, n = x.shape
    xb = x.reshape(m, n // 16, 16)
    amax = np.abs(xb).max(-1, keepdims=True)
    rcp6 = np.uint32(0x3E2A0000).view(np.float32)        # bf16(1/6)
    raw = ((amax.astype(bf16).astype(np.float32) * rcp6)
           .astype(bf16).astype(np.float32))
    scale_hf8 = raw.astype(ml_dtypes.float8_e4m3fn)
    scale_f = scale_hf8.astype(np.float32)
    scode = np.where(amax == 0.0, np.uint8(0), scale_hf8.view(np.uint8))
    rcp = (1.0 / np.where(scale_f == 0.0, 1.0,
                          scale_f.astype(bf16).astype(np.float32)))
    rcp = rcp.astype(bf16).astype(np.float32)
    v = (xb * rcp).astype(bf16).astype(np.float32)
    sign = ((xb.view(np.uint32) >> 31) << 3).astype(np.int32)
    code = sign | _np_encode_e2m1(np.abs(v))
    code = np.where(scale_f == 0.0, 0, code).reshape(m, n)
    return ((code[:, 1::2] << 4) | code[:, 0::2]).astype(np.uint8), \
        scode.reshape(m, n // 16)


def test_quant_mx_outputs():
    """UNARY_QUANT with MX output dtypes emits (payload, scales) pairs
    byte-exact with the reference block converters (impl.c:1896-2076,
    dispatch :2260-2322), verified against independent NumPy ports."""
    from libxsmm_tpu import quant as q_
    m, n = 4, 64
    x = (_rand((m, n)) * 5.0).astype(np.float32)
    oracles = {Datatype.MXFP4X2: (_np_mxfp4_blocks,
                                  q_.mxfp4_dequantize_blocks, 32),
               Datatype.NVFP4X2: (_np_nvfp4_blocks,
                                  q_.nvfp4_dequantize_blocks, 16),
               Datatype.MXBF8: (_np_mxbf8_blocks,
                                q_.mxbf8_dequantize_blocks, 32)}
    for dt, (oracle, deq, sblk) in oracles.items():
        kern = xt.dispatch_meltw_unary(UnaryType.QUANT, m, n, out_type=dt)
        payload, scales = kern(x)
        payload, scales = np.asarray(payload), np.asarray(scales)
        want_payload, want_scales = oracle(x)
        from libxsmm_tpu import device
        if dt == Datatype.NVFP4X2 and device.on_tpu():
            # NVFP4's scale/element path chains f32->bf16->f8e4m3 casts;
            # TPU hardware converts round ties differently from ml_dtypes,
            # shifting the occasional block by one code step. The CPU run
            # keeps this byte-exact vs the reference algorithm; on TPU
            # allow one-step deviations on a small fraction of codes.
            pv, wv = payload.view(np.uint8), want_payload
            lo_d = np.abs((pv & 0xF).astype(int) - (wv & 0xF).astype(int))
            hi_d = np.abs((pv >> 4).astype(int) - (wv >> 4).astype(int))
            assert (np.maximum(lo_d, hi_d) <= 1).all(), "code step > 1"
            assert (lo_d + hi_d > 0).mean() < 0.25, "too many deviations"
            assert (np.abs(scales.astype(int)
                           - want_scales.astype(int)) <= 1).all()
        else:
            np.testing.assert_array_equal(payload.view(np.uint8),
                                          want_payload,
                                          err_msg=f"payload {dt}")
            np.testing.assert_array_equal(scales, want_scales,
                                          err_msg=f"scales {dt}")
        # round-trip sanity on finite entries (bf8 payloads can be inf
        # exactly where the reference overflows e5m2 near block amax)
        back = np.asarray(deq(payload, scales))
        finite = np.isfinite(back)
        amax = np.repeat(np.abs(x).reshape(m, n // sblk, sblk).max(-1),
                         sblk).reshape(m, n)
        tol = 0.6 if dt != Datatype.MXBF8 else 0.25
        assert np.all(np.abs(back - x)[finite] <= (tol * amax + 1e-6)[finite])
        # DEQUANT through the dispatcher agrees with the quant-module decode
        dq = xt.dispatch_meltw_unary(UnaryType.DEQUANT, m, n, in_type=dt)
        np.testing.assert_array_equal(np.asarray(dq(payload, scales)), back)


def test_stochastic_round_bf16():
    import jax.numpy as jnp
    m, n = 32, 32
    # value exactly between two bf16 neighbors: 1.0 and 1.0078125
    x = np.full((m, n), 1.00390625, np.float32)
    kern = xt.dispatch_meltw_unary(UnaryType.STOCHASTIC_ROUND, m, n,
                                   out_type=Datatype.BF16)
    y = np.asarray(kern(x, seed=11), np.float32)
    ups = (y > 1.0).mean()
    assert 0.3 < ups < 0.7           # unbiased-ish rounding
    assert set(np.unique(y)) <= {1.0, 1.0078125}


def test_quant_dequant():
    m, n = 16, 16
    x = _rand((m, n))
    scale = 127.0 / np.abs(x).max()
    q = xt.dispatch_meltw_unary(UnaryType.QUANT, m, n, out_type=Datatype.I8)
    qv = np.asarray(q(x, scale))
    assert qv.dtype == np.int8
    dq = xt.dispatch_meltw_unary(UnaryType.DEQUANT, m, n,
                                 in_type=Datatype.I8, out_type=Datatype.F32)
    back = np.asarray(dq(qv, 1.0 / scale))
    check(x, back, margin=1.0 / scale)


def test_decompress_sparse():
    m, n = 8, 8
    dense = _rand((m, n))
    mask = (RNG.random((m, n)) < 0.4)
    dense = dense * mask
    values = dense.reshape(-1)[mask.reshape(-1)]
    # pad compressed stream to full size (kernel reads linearly)
    comp = np.zeros(m * n, np.float32)
    comp[:values.size] = values
    kern = xt.dispatch_meltw_unary(UnaryType.DECOMPRESS_SPARSE_FACTOR_2, m, n)
    out = np.asarray(kern(comp.reshape(m, n), mask.astype(np.uint8)))
    check(dense, out)


# ---------------------------------------------------------------------------
# binary
# ---------------------------------------------------------------------------

BINARY_CASES = {
    BinaryType.ADD: np.add,
    BinaryType.MUL: np.multiply,
    BinaryType.SUB: np.subtract,
    BinaryType.DIV: np.divide,
    BinaryType.MAX: np.maximum,
    BinaryType.MIN: np.minimum,
}


@pytest.mark.parametrize("op", list(BINARY_CASES))
def test_binary_math(op):
    m, n = 11, 9
    a, b = _rand((m, n)), _rand((m, n))
    if op == BinaryType.DIV:
        b = b + np.sign(b) * 0.5
    kern = xt.dispatch_meltw_binary(op, m, n)
    check(BINARY_CASES[op](a, b), np.asarray(kern(a, b)), margin=1e-6)


def test_binary_muladd_reads_out():
    m, n = 8, 8
    a, b, c = _rand((m, n)), _rand((m, n)), _rand((m, n))
    kern = xt.dispatch_meltw_binary(BinaryType.MULADD, m, n)
    check(c + a * b, np.asarray(kern(a, b, c)), margin=1e-6)


def test_binary_bcast():
    m, n = 6, 10
    a = _rand((m, n))
    col = _rand((1, n))
    kern = xt.dispatch_meltw_binary(BinaryType.ADD, m, n,
                                    BinaryFlags.BCAST_COL_IN_1)
    check(a + col, np.asarray(kern(a, col)), margin=1e-6)
    row = _rand((m, 1))
    kern = xt.dispatch_meltw_binary(BinaryType.MUL, m, n,
                                    BinaryFlags.BCAST_ROW_IN_1)
    check(a * row, np.asarray(kern(a, row)), margin=1e-6)
    s = _rand((1, 1))
    kern = xt.dispatch_meltw_binary(BinaryType.SUB, m, n,
                                    BinaryFlags.BCAST_SCALAR_IN_0)
    check(s - a, np.asarray(kern(s, a)), margin=1e-6)


def test_binary_cmp():
    m, n = 8, 8
    a, b = _rand((m, n)), _rand((m, n))
    kern = xt.dispatch_meltw_binary(BinaryType.CMP_OP_GT, m, n)
    # the reference stores CMP results as a PACKED bitmask
    # (ld=UPDIV(ldo,16)*16, reference_impl.c:2575-2581)
    packed = np.asarray(kern(a, b))
    assert packed.shape == (m, 2)            # UPDIV(8,16)*16 bits = 2 bytes
    np.testing.assert_array_equal(
        a > b, np.asarray(xt.unpack_bitmask(packed, m, n)))


def test_binary_matmul_and_dotred():
    m, n, k = 8, 6, 5
    a, b = _rand((m, k)), _rand((k, n))
    kern = xt.dispatch_meltw_binary(BinaryType.MATMUL, m, n)
    check(a @ b, np.asarray(kern(a, b)), margin=1e-5)
    x, y = _rand((m, n)), _rand((m, n))
    kern = xt.dispatch_meltw_binary(
        BinaryType.MUL_AND_REDUCE_TO_SCALAR_OP_ADD, m, n)
    check(np.asarray([[np.sum(x * y)]]), np.asarray(kern(x, y)), margin=1e-4)


# ---------------------------------------------------------------------------
# ternary
# ---------------------------------------------------------------------------

def test_ternary_muladd_select_nmuladd():
    m, n = 9, 7
    a, b, c = _rand((m, n)), _rand((m, n)), _rand((m, n))
    kern = xt.dispatch_meltw_ternary(TernaryType.MULADD, m, n)
    check(a * b + c, np.asarray(kern(a, b, c)), margin=1e-6)
    kern = xt.dispatch_meltw_ternary(TernaryType.NMULADD, m, n)
    check(-(a * b) + c, np.asarray(kern(a, b, c)), margin=1e-6)
    # reference SELECT ABI: in2 is a PACKED bitmask; bit CLEAR selects
    # in0, bit SET selects in1 (reference_impl.c:2623-2637)
    mask = RNG.random((m, n)) < 0.5
    packed = np.asarray(xt.pack_bitmask(mask))
    kern = xt.dispatch_meltw_ternary(TernaryType.SELECT, m, n)
    check(np.where(mask, b, a), np.asarray(kern(a, b, packed)))


def test_ternary_bcast():
    m, n = 6, 8
    a = _rand((m, n))
    col = _rand((1, n))
    c = _rand((m, n))
    kern = xt.dispatch_meltw_ternary(TernaryType.MULADD, m, n,
                                     TernaryFlags.BCAST_COL_IN_1)
    check(a * col + c, np.asarray(kern(a, col, c)), margin=1e-6)


def test_decomp_fp32_bf16x2_x3():
    m, n = 8, 8
    x = _rand((m, n)) * 10
    k2 = xt.dispatch_meltw_unary(UnaryType.DECOMP_FP32_TO_BF16X2, m, n)
    hi, lo = k2(x)
    recon = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    assert np.abs(recon - x).max() <= np.abs(x).max() * 2 ** -15
    k3 = xt.dispatch_meltw_unary(UnaryType.DECOMP_FP32_TO_BF16X3, m, n)
    h1, h2, h3 = k3(x)
    recon = (np.asarray(h1, np.float32) + np.asarray(h2, np.float32)
             + np.asarray(h3, np.float32))
    np.testing.assert_allclose(recon, x, rtol=1e-6)


def test_reduce_record_argop():
    m, n = 9, 6
    x = _rand((m, n))
    kern = xt.dispatch_meltw_unary(
        UnaryType.REDUCE_X_OP_MAX, m, n,
        UnaryFlags.REDUCE_COLS | UnaryFlags.REDUCE_RECORD_ARGOP)
    red, arg = kern(x)
    np.testing.assert_allclose(np.asarray(red)[0], x.max(axis=0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(arg)[0], x.argmax(axis=0))


def test_reduce_record_argop_bf16_indices_stay_integer():
    # argop indices ride u32/u64 buffers in the reference — casting them
    # through a bf16 out dtype would round positions > 256 (review finding)
    m, n = 4, 1000
    rng_ = np.random.default_rng(5)
    x = np.zeros((m, n), np.float32)
    x[:, 999] = 7.0                       # argmax index NOT bf16-exact
    x += 0.001 * rng_.random((m, n)).astype(np.float32)
    import jax.numpy as jnp
    kern = xt.dispatch_meltw_unary(
        UnaryType.REDUCE_X_OP_MAX, m, n,
        UnaryFlags.REDUCE_ROWS | UnaryFlags.REDUCE_RECORD_ARGOP,
        in_type=Datatype.BF16, out_type=Datatype.BF16)
    red, arg = kern(jnp.asarray(x, jnp.bfloat16))
    arg = np.asarray(arg)
    assert arg.dtype.kind in "iu"
    np.testing.assert_array_equal(arg[:, 0], [999] * m)


def test_reduce_init_acc_contracts():
    # INIT_ACC is defined for the ADD reduces only (reference_impl.c
    # reduce_op==0 branch); X_X2 takes one accumulator per output
    m, n = 8, 16
    x = _rand((m, n))
    acc = _rand((1, n))
    acc2 = _rand((1, n))
    k2 = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_X2_OP_ADD, m, n,
                                 UnaryFlags.REDUCE_COLS
                                 | UnaryFlags.REDUCE_INIT_ACC)
    s, s2 = k2(x, acc, acc2)
    np.testing.assert_allclose(np.asarray(s)[0],
                               x.sum(axis=0) + np.asarray(acc)[0],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2)[0],
                               (x * x).sum(axis=0) + np.asarray(acc2)[0],
                               rtol=1e-5)
    kmax = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_OP_MAX, m, n,
                                   UnaryFlags.REDUCE_COLS
                                   | UnaryFlags.REDUCE_INIT_ACC)
    with pytest.raises(ValueError, match="ADD reduces"):
        kmax(x, acc)


def test_rng_and_timer_utils():
    from libxsmm_tpu import rng as xrng
    from libxsmm_tpu.utils import timer
    st = xrng.set_seed(7)
    a = np.asarray(xrng.f32_seq((128, 128)))
    assert 0.0 <= a.min() and a.max() < 1.0
    assert 0.4 < a.mean() < 0.6
    st2 = xrng.RngState(7)
    b = np.asarray(xrng.f32_seq((16,), st2))
    c = np.asarray(xrng.f32_seq((16,), xrng.RngState(7)))
    np.testing.assert_array_equal(b, c)   # reproducible from equal seeds
    import jax.numpy as jnp
    dt = timer.bench(lambda v: v + 1, (jnp.ones((8, 8)),), reps=3, warmup=1)
    assert dt > 0
    assert timer.gflops(1e9, 1.0) == 1.0


def test_reduce_ncnc_format():
    # REDUCE_X_OP_ADD_NCNC_FORMAT (reference impl
    # generator_mateltwise_reference_impl.c:2118-2137): input in blocked
    # NCNC layout, output = per-column sums over N.
    import numpy as np
    from libxsmm_tpu.descriptor import UnaryType
    from libxsmm_tpu.ops.eltwise import dispatch_meltw_unary
    rng = np.random.default_rng(5)
    C, N, bc, bn = 16, 12, 4, 3
    dense = rng.standard_normal((N, C)).astype(np.float32)
    # pack into NCNC: blocks [iN][iC][in][ic]
    blk = (dense.reshape(N // bn, bn, C // bc, bc)
           .transpose(0, 2, 1, 3).copy())
    kern = dispatch_meltw_unary(UnaryType.REDUCE_X_OP_ADD_NCNC_FORMAT,
                                m=bc, n=bn, extra=(C, N))
    got = np.asarray(kern(blk.reshape(-1))).reshape(C)
    np.testing.assert_allclose(got, dense.sum(axis=0), rtol=1e-5, atol=1e-5)
