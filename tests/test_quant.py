"""Low-precision conversion / quantization tests (lpflt_quant parity)."""

import numpy as np
import pytest

from libxsmm_tpu import quant
from libxsmm_tpu.matdiff import check

RNG = np.random.default_rng(31)


def test_bf16_rne_vs_truncate():
    x = np.float32(1.00390625)   # between bf16 neighbors 1.0 and 1.0078125
    assert float(quant.rne_convert_fp32_bf16(x)) == 1.00390625 or \
        float(quant.rne_convert_fp32_bf16(x)) in (1.0, 1.0078125)
    # truncation always goes toward zero
    assert float(quant.truncate_convert_fp32_bf16(x)) == 1.0
    xs = RNG.standard_normal(256).astype(np.float32)
    rne = np.asarray(quant.rne_convert_fp32_bf16(xs), np.float32)
    assert np.abs(rne - xs).max() <= np.abs(xs).max() * 2 ** -8


def test_bf8_hf8_roundtrip():
    xs = RNG.standard_normal(128).astype(np.float32)
    bf8 = quant.rne_convert_fp32_bf8(xs)
    back = np.asarray(quant.convert_bf8_fp32(bf8))
    assert np.abs(back - xs).max() <= np.abs(xs).max() * 0.25  # 2 mant bits
    hf8 = quant.rne_convert_fp32_hf8(xs)
    back = np.asarray(quant.convert_hf8_fp32(hf8))
    assert np.abs(back - xs).max() <= np.abs(xs).max() * 0.125


def test_quantize_i16_scale_search():
    xs = (RNG.standard_normal(512) * 100).astype(np.float32)
    q, scf = quant.quantize_i16(xs)
    assert q.dtype == np.int16
    back = np.asarray(quant.dequantize_i16(q, scf))
    # error bounded by half a quantum
    assert np.abs(back - xs).max() <= 2.0 ** -scf
    # scale uses the available range (absmax maps above half range)
    assert np.abs(np.asarray(q, np.int32)).max() > 16383


def test_quantize_i8():
    xs = RNG.standard_normal(256).astype(np.float32)
    q, scf = quant.quantize_i8(xs)
    back = np.asarray(q, np.float32) * 2.0 ** -scf
    assert np.abs(back - xs).max() <= 2.0 ** -scf


def test_quantize_zero():
    q, scf = quant.quantize_i16(np.zeros(8, np.float32))
    assert scf == 0 and not np.asarray(q).any()


@pytest.mark.parametrize("fmt,rel", [("mxfp4", 0.25), ("mxfp6_e2m3", 0.0625),
                                     ("mxfp6_e3m2", 0.125),
                                     ("mxfp8_e4m3", 0.0625),
                                     ("mxfp8_e5m2", 0.125)])
def test_mx_roundtrip(fmt, rel):
    x = RNG.standard_normal((4, 64)).astype(np.float32)
    q, e = quant.mx_quantize(x, fmt)
    assert e.shape == (4, 2)
    back = np.asarray(quant.mx_dequantize(q, e))
    # block-relative error bound: rel * block absmax
    xb = x.reshape(4, 2, 32)
    bb = back.reshape(4, 2, 32)
    bound = rel * np.abs(xb).max(axis=-1, keepdims=True) + 1e-7
    assert (np.abs(bb - xb) <= bound).all()


def test_mx_grid_mxfp4():
    # E2M1 grid is the documented {0, .5, 1, 1.5, 2, 3, 4, 6}
    g = quant._format_grid("mxfp4")
    np.testing.assert_allclose(g, [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])


def test_mx_bad_inputs():
    with pytest.raises(ValueError):
        quant.mx_quantize(np.zeros((2, 30), np.float32), "mxfp4")
    with pytest.raises(ValueError):
        quant.mx_quantize(np.zeros((2, 32), np.float32), "nope")


def test_i4x2_pack_roundtrip():
    lo = RNG.integers(-8, 8, 64).astype(np.int8)
    hi = RNG.integers(-8, 8, 64).astype(np.int8)
    packed = quant.pack_i4x2(lo, hi)
    assert np.asarray(packed).dtype == np.uint8
    lo2, hi2 = quant.unpack_i4x2(packed)
    np.testing.assert_array_equal(np.asarray(lo2), lo)
    np.testing.assert_array_equal(np.asarray(hi2), hi)


def test_fp4_pack_roundtrip():
    x = RNG.standard_normal((2, 64)).astype(np.float32)
    q, e = quant.mx_quantize(x, "mxfp4")
    packed = quant.pack_fp4(q)
    assert packed.shape == (2, 32)
    unpacked = np.asarray(quant.unpack_fp4(packed))
    np.testing.assert_allclose(unpacked, np.asarray(q), rtol=0, atol=0)


def test_nvfp4_large_amax_saturates_not_nan():
    # ADVICE r2: blocks with amax > ~2800 used to quantize to all-NaN via
    # the unclamped f32->e4m3 scale cast. The reference's scale encoder
    # (libxsmm_ref_float_to_hf8) clamps EVERY exponent-15 encoding to the
    # code 0x78 — decoded 256, not the 448 its comment claims; it never
    # emits 0x79..0x7E (byte-verified against the reference binary,
    # test_refimpl_parity). Verify finite decode + the reference code.
    x = np.zeros((1, 16), np.float32)
    x[0, 0] = 5000.0
    payload, scales = quant.nvfp4_quantize_blocks(x)
    dec = np.asarray(quant.nvfp4_dequantize_blocks(payload, scales))
    assert np.isfinite(dec).all()
    assert int(np.asarray(scales)[0, 0]) == 0x78      # reference clamp code
    # NaN amax still propagates a NaN scale (0x7F payload-NaN code path)
    x[0, 0] = np.nan
    _, s2 = quant.nvfp4_quantize_blocks(x)
    assert int(np.asarray(s2)[0, 0]) == 0x7F


def test_e8m0_nonfinite_amax_reference_bytes():
    # Inf/NaN block amax: scale code 0xFF, payload max-normal codes
    # (reference generator_mateltwise_reference_impl.c E8M0 paths).
    x = np.ones((1, 32), np.float32)
    x[0, 3] = np.inf
    p4, s4 = quant.mxfp4_quantize_blocks(x)
    assert int(np.asarray(s4)[0, 0]) == 0xFF
    assert (np.asarray(p4)[0] == 0x77).all()
    p8, s8 = quant.mxbf8_quantize_blocks(x)
    assert int(np.asarray(s8)[0, 0]) == 0xFF
    import jax
    codes8 = np.asarray(jax.lax.bitcast_convert_type(p8, np.uint8))
    assert (codes8 == 0x7B).all()
    p6, s6 = quant.mxfp6_quantize_blocks(x, "e3m2")
    assert int(np.asarray(s6)[0, 0]) == 0xFF
    assert (np.asarray(p6) == 0x1F).all()
    # finite blocks are unaffected
    y = np.ones((1, 32), np.float32)
    _, sy = quant.mxfp4_quantize_blocks(y)
    assert int(np.asarray(sy)[0, 0]) != 0xFF


def test_fp6_encode_rne_ties_to_even():
    # e3m2 codes: subnormals 0-3, then normals; 1.0 = code 12, 1.25 = 13,
    # 1.5 = 14. Midpoint 1.125 lies between 12 (even) and 13 (odd) -> RNE
    # keeps 12; midpoint 1.375 between 13 (odd) and 14 (even) -> takes 14.
    c = np.asarray(quant.fp6_encode(np.float32([1.125, 1.375]), "e3m2"))
    assert int(c[0]) == 12 and int(c[1]) == 14
    # non-tie values still round nearest
    c2 = np.asarray(quant.fp6_encode(np.float32([1.126, 1.374]), "e3m2"))
    assert int(c2[0]) == 13 and int(c2[1]) == 13


def test_bf16_rnaz_truncate_nonfinite_edges():
    """Inf/NaN are never rounded and denormals flush to signed zero
    (libxsmm_convert_f32_to_bf16_{rnaz,truncate}, src/libxsmm_math.c:646-682):
    a NaN whose payload lives only in the low mantissa bits must stay NaN
    under rnaz (naive +0x8000 would overflow it to Inf)."""
    low_nan = np.uint32(0x7F800001).view(np.float32)      # sNaN, low payload
    for conv in (quant.rnaz_convert_fp32_bf16,
                 quant.truncate_convert_fp32_bf16):
        assert np.isnan(float(conv(low_nan))), conv.__name__
        assert float(conv(np.float32(np.inf))) == np.inf
        assert float(conv(np.float32(-np.inf))) == -np.inf
        # DAZ: denormal input -> signed zero
        den = np.uint32(0x00008000).view(np.float32)
        assert float(conv(den)) == 0.0
        neg = np.uint32(0x80008000).view(np.float32)
        out = float(conv(neg))
        assert out == 0.0 and np.signbit(np.float32(out))
    # rnaz still rounds ties away from zero on finite values
    x = np.float32(1.00390625)  # exact tie between 1.0 and 1.0078125
    assert float(quant.rnaz_convert_fp32_bf16(x)) == 1.0078125
