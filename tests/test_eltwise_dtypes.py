"""Eltwise dtype-combination sweep (VERDICT r2 #7).

Mirrors the reference's kernel_test precision axes
(/root/reference/samples/eltwise/kernel_test/generate_*_test_scripts.sh:
PREC = IN_OUT_COMP over f32/bf16/f16/bf8/hf8 mixes, F64_F64_F64 for
non-approximation ops, dropout/relu/reduce/transform templates) — each op
family runs over the in/out dtype matrix with per-dtype tolerances, and
oracles are computed on the STORAGE-ROUNDED inputs (the value the kernel
actually reads), so margins stay at the output dtype's epsilon.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BinaryType, TernaryType, UnaryFlags,
                                    UnaryType)
from libxsmm_tpu.dtypes import Datatype, to_jnp
from libxsmm_tpu.matdiff import DEFAULT_MARGINS, check

RNG = np.random.default_rng(42)

# the reference's IN_OUT_COMP axes with f32 compute (the *_X_X low-precision
# compute combos apply to copy TPPs only, generate_unary_simple:30-32)
COMBOS = [
    (Datatype.F32, Datatype.F32),
    (Datatype.BF16, Datatype.BF16), (Datatype.F32, Datatype.BF16),
    (Datatype.BF16, Datatype.F32),
    (Datatype.F16, Datatype.F16), (Datatype.F32, Datatype.F16),
    (Datatype.F16, Datatype.F32),
    (Datatype.BF8, Datatype.BF8), (Datatype.F32, Datatype.BF8),
    (Datatype.BF8, Datatype.F32),
    (Datatype.HF8, Datatype.HF8), (Datatype.F32, Datatype.HF8),
    (Datatype.HF8, Datatype.F32),
]
_IDS = [f"{i.value}_{o.value}" for i, o in COMBOS]


def _margin(in_dt: Datatype, out_dt: Datatype) -> float:
    return max(DEFAULT_MARGINS[in_dt.value], DEFAULT_MARGINS[out_dt.value])


def _rounded_input(shape, in_dt: Datatype, positive: bool = False):
    """(device array in in_dt, f32 numpy view of the SAME rounded values)."""
    x = RNG.standard_normal(shape).astype(np.float32)
    if positive:
        x = np.abs(x) + 0.5
    xd = jnp.asarray(x, to_jnp(in_dt))
    return xd, np.asarray(xd.astype(jnp.float32))


_UNARY_ORACLES = {
    UnaryType.X2: lambda x: x * x,
    UnaryType.NEGATE: lambda x: -x,
    UnaryType.INC: lambda x: x + 1.0,
    UnaryType.RELU: lambda x: np.maximum(x, 0.0),
    UnaryType.EXP: np.exp,
    UnaryType.TANH: np.tanh,
    UnaryType.SIGMOID: lambda x: 1.0 / (1.0 + np.exp(-x)),
    UnaryType.SQRT: np.sqrt,
    UnaryType.RECIPROCAL: lambda x: 1.0 / x,
}
_POSITIVE_ONLY = (UnaryType.SQRT, UnaryType.RECIPROCAL)
# TPU transcendental units are polynomial approximations — a few e-5
# relative off glibc (r3 TPU sweep: tanh linf 3.6e-5); not a rounding bug
_TRANSCENDENTAL = (UnaryType.EXP, UnaryType.TANH, UnaryType.SIGMOID)


@pytest.mark.parametrize("in_dt,out_dt", COMBOS, ids=_IDS)
def test_unary_dtype_matrix(in_dt, out_dt):
    m, n = 16, 24
    for op, oracle in _UNARY_ORACLES.items():
        xd, xf = _rounded_input((m, n), in_dt,
                                positive=op in _POSITIVE_ONLY)
        kern = xt.dispatch_meltw_unary(op, m, n, in_type=in_dt,
                                       out_type=out_dt)
        got = np.asarray(jnp.asarray(kern(xd)).astype(jnp.float32))
        want = np.asarray(
            jnp.asarray(oracle(xf), to_jnp(out_dt)).astype(jnp.float32))
        margin = _margin(in_dt, out_dt)
        if op in _TRANSCENDENTAL:
            margin = max(margin, 1e-4)
        check(want, got, margin=margin)


_REDUCE_IN = [Datatype.F32, Datatype.BF16, Datatype.F16, Datatype.BF8,
              Datatype.HF8]


@pytest.mark.parametrize("in_dt", _REDUCE_IN, ids=[d.value for d in _REDUCE_IN])
def test_reduce_dtype_matrix(in_dt):
    m, n = 16, 32
    xd, xf = _rounded_input((m, n), in_dt)
    for flags, axis in ((UnaryFlags.REDUCE_ROWS, 1),
                        (UnaryFlags.REDUCE_COLS, 0)):
        kern = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_OP_ADD, m, n,
                                       flags, in_type=in_dt,
                                       out_type=Datatype.F32)
        got = np.asarray(kern(xd))
        want = xf.sum(axis=axis, keepdims=True)
        # summation amplifies storage rounding by ~sqrt(count)
        check(want, got,
              margin=DEFAULT_MARGINS[in_dt.value] * np.sqrt(max(m, n)))
        kmax = xt.dispatch_meltw_unary(UnaryType.REDUCE_X_OP_MAX, m, n,
                                       flags, in_type=in_dt,
                                       out_type=Datatype.F32)
        np.testing.assert_allclose(np.asarray(kmax(xd)),
                                   xf.max(axis=axis, keepdims=True),
                                   rtol=1e-6)


_BINARY_ORACLES = {
    BinaryType.ADD: lambda a, b: a + b,
    BinaryType.MUL: lambda a, b: a * b,
    BinaryType.SUB: lambda a, b: a - b,
}


@pytest.mark.parametrize("in_dt,out_dt", COMBOS, ids=_IDS)
def test_binary_dtype_matrix(in_dt, out_dt):
    m, n = 16, 24
    ad, af = _rounded_input((m, n), in_dt)
    bd, bf = _rounded_input((m, n), in_dt)
    for op, oracle in _BINARY_ORACLES.items():
        kern = xt.dispatch_meltw_binary(op, m, n, in_type=in_dt,
                                        out_type=out_dt)
        got = np.asarray(jnp.asarray(kern(ad, bd)).astype(jnp.float32))
        want = np.asarray(
            jnp.asarray(oracle(af, bf), to_jnp(out_dt)).astype(jnp.float32))
        check(want, got, margin=_margin(in_dt, out_dt))


@pytest.mark.parametrize("in_dt,out_dt",
                         [(Datatype.BF16, Datatype.BF16),
                          (Datatype.F16, Datatype.F32),
                          (Datatype.BF8, Datatype.F32),
                          (Datatype.F32, Datatype.HF8)],
                         ids=["bf16_bf16", "f16_f32", "bf8_f32", "f32_hf8"])
def test_ternary_muladd_dtype_matrix(in_dt, out_dt):
    m, n = 16, 24
    ad, af = _rounded_input((m, n), in_dt)
    bd, bf = _rounded_input((m, n), in_dt)
    cd, cf = _rounded_input((m, n), in_dt)
    kern = xt.dispatch_meltw_ternary(TernaryType.MULADD, m, n,
                                     in_type=in_dt, out_type=out_dt)
    got = np.asarray(jnp.asarray(kern(ad, bd, cd)).astype(jnp.float32))
    want = np.asarray(
        jnp.asarray(af * bf + cf, to_jnp(out_dt)).astype(jnp.float32))
    check(want, got, margin=_margin(in_dt, out_dt))


_XFORM_DTS = [Datatype.F32, Datatype.BF16, Datatype.F16, Datatype.BF8,
              Datatype.HF8, Datatype.I8]


@pytest.mark.parametrize("dt", _XFORM_DTS, ids=[d.value for d in _XFORM_DTS])
def test_transform_normt_dtype_matrix(dt):
    # pure storage movement: bit-exact in every dtype (unary_transform.tpl)
    m, n = 24, 16
    if dt == Datatype.I8:
        x = RNG.integers(-100, 100, (m, n)).astype(np.int8)
        xd = jnp.asarray(x)
        xf = x.astype(np.float32)
    else:
        xd, xf = _rounded_input((m, n), dt)
    kern = xt.dispatch_meltw_unary(UnaryType.TRANSFORM_NORM_TO_NORMT, m, n,
                                   in_type=dt, out_type=dt)
    got = np.asarray(jnp.asarray(kern(xd)).astype(jnp.float32))
    np.testing.assert_array_equal(got, xf.T)


_MASK_DTS = [Datatype.BF16, Datatype.F16, Datatype.BF8]


@pytest.mark.parametrize("dt", _MASK_DTS, ids=[d.value for d in _MASK_DTS])
def test_relu_bitmask_dtype_matrix(dt):
    # fwd mask emit + INV consume at low precision (unary_relu.tpl axes;
    # the r2 VERDICT flagged the *_INV low-precision paths as unexercised)
    m, n = 16, 32
    xd, xf = _rounded_input((m, n), dt)
    fwd = xt.dispatch_meltw_unary(UnaryType.RELU, m, n,
                                  UnaryFlags.BITMASK_2BYTEMULT,
                                  in_type=dt, out_type=dt)
    out, pmask = fwd(xd)
    got = np.asarray(jnp.asarray(out).astype(jnp.float32))
    np.testing.assert_allclose(got, np.maximum(xf, 0.0), rtol=1e-6)
    bits = np.asarray(xt.unpack_bitmask(np.asarray(pmask), m, n))
    np.testing.assert_array_equal(bits, xf > 0)
    gd, gf = _rounded_input((m, n), dt)
    inv = xt.dispatch_meltw_unary(UnaryType.RELU_INV, m, n,
                                  UnaryFlags.BITMASK_2BYTEMULT,
                                  in_type=dt, out_type=dt)
    giv = np.asarray(jnp.asarray(inv(gd, np.asarray(pmask)))
                     .astype(jnp.float32))
    np.testing.assert_allclose(giv, np.where(xf > 0, gf, 0.0), rtol=1e-6)


@pytest.mark.parametrize("dt", [Datatype.BF16, Datatype.F16],
                         ids=["bf16", "f16"])
def test_dropout_dtype_matrix(dt):
    # unary_dropout.tpl axes: low-precision in/out with the packed mask
    m, n = 32, 32
    p = 0.25
    xd, xf = _rounded_input((m, n), dt, positive=True)
    kern = xt.dispatch_meltw_unary(UnaryType.DROPOUT, m, n,
                                   UnaryFlags.BITMASK_2BYTEMULT,
                                   in_type=dt, out_type=dt, extra=(p,))
    out, pmask = kern(xd, seed=7)
    out = np.asarray(jnp.asarray(out).astype(jnp.float32))
    mask = np.asarray(xt.unpack_bitmask(np.asarray(pmask), m, n))
    want_kept = np.asarray(
        jnp.asarray(xf / (1 - p), to_jnp(dt)).astype(jnp.float32))
    check(want_kept[mask], out[mask], margin=DEFAULT_MARGINS[dt.value])
    assert np.all(out[~mask] == 0)


def test_f64_simple_ops():
    # F64_F64_F64 combo (non-approximation ops only, generate_unary:25-27)
    import jax
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    m, n = 16, 16
    x = np.abs(RNG.standard_normal((m, n))) + 0.5
    for op, oracle in ((UnaryType.X2, lambda v: v * v),
                       (UnaryType.SQRT, np.sqrt),
                       (UnaryType.RECIPROCAL, lambda v: 1.0 / v),
                       (UnaryType.INC, lambda v: v + 1.0)):
        kern = xt.dispatch_meltw_unary(op, m, n, in_type=Datatype.F64,
                                       out_type=Datatype.F64,
                                       comp_type=Datatype.F64)
        got = np.asarray(kern(jnp.asarray(x, jnp.float64)))
        assert got.dtype == np.float64
        # 1e-13, not 1e-14: TPU f64 is emulated and reciprocal/sqrt land
        # within ~1.2e-14 of glibc (r3 TPU sweep) — still true f64
        np.testing.assert_allclose(got, oracle(x), rtol=1e-13)
