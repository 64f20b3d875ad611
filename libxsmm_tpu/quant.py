"""Low-precision float conversion and quantization.

Semantics port of /root/reference/src/libxsmm_lpflt_quant.c (365 LoC):
f32 <-> bf16/f16/bf8/hf8 under RNE / truncation / stochastic rounding,
i16/i8 quantization with automatic scale-factor search, and the MX
(microscaling, OCP MX v1.0 public spec) block formats that the reference
exposes as LIBXSMM_DATATYPE_MX* storage (typedefs.h:232-241): a shared
power-of-two E8M0 scale per block of 32 elements with FP4(E2M1)/FP6/FP8
element payloads.

TPU-native: bf16/f16/fp8 conversions are native jnp casts (plus the Pallas
stochastic-round kernel); MX and sub-byte formats have no TPU storage, so
they are (packed uint8 payload, scales) pairs — quantize/dequantize here,
compute in bf16/f32. Grids are derived from the format definition, not
copied tables.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import Datatype


# ---------------------------------------------------------------------------
# scalar-format conversions (libxsmm_rne_convert_* / truncate_*)
# ---------------------------------------------------------------------------

def rne_convert_fp32_bf16(x):
    """Round-to-nearest-even f32 -> bf16 (libxsmm_rne_convert_fp32_bf16).

    Bit-exact with the reference INCLUDING its DAZ prologue
    (libxsmm_math.c:684-703 flushes subnormal inputs to signed zero
    before rounding — a plain astype would produce subnormal bf16 codes
    the reference never emits; found by test_refimpl_parity against the
    reference binary)."""
    bits, nonfinite = _bf16_round_bits_prep(x)
    fixup = (bits >> jnp.uint32(16)) & jnp.uint32(1)
    rounded = bits + jnp.uint32(0x00007FFF) + fixup
    bits = jnp.where(nonfinite, bits, rounded)
    return jax.lax.bitcast_convert_type(
        (bits >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16)


def _bf16_round_bits_prep(x):
    """Shared edge handling of the reference bf16 converters
    (libxsmm_convert_f32_to_bf16_{truncate,rnaz}, src/libxsmm_math.c:646-682):
    DAZ (denormals flush to signed zero) and a non-finite mask so Inf/NaN
    are never rounded (NaN payloads get the quiet bit 0x00400000 instead).
    Returns (bits, nonfinite_mask)."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                        jnp.uint32)
    denorm = (bits & jnp.uint32(0x7F800000)) == 0
    bits = jnp.where(denorm, bits & jnp.uint32(0x80000000), bits)
    nonfinite = (bits & jnp.uint32(0x7F800000)) == jnp.uint32(0x7F800000)
    is_nan = nonfinite & ((bits & jnp.uint32(0x007FFFFF)) != 0)
    bits = jnp.where(is_nan, bits | jnp.uint32(0x00400000), bits)
    return bits, nonfinite


def truncate_convert_fp32_bf16(x):
    """Truncation mode: drop the low 16 bits (DAZ; Inf/NaN pass through
    unrounded with NaN quieted, libxsmm_convert_f32_to_bf16_truncate)."""
    bits, _ = _bf16_round_bits_prep(x)
    bits = bits & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def stochastic_convert_fp32_bf16(x, seed: int = 0):
    from .kernels.eltwise_pallas import stochastic_round
    return stochastic_round(jnp.asarray(x, jnp.float32), seed, Datatype.BF16)


def rne_convert_fp32_bf8(x):
    """f32 -> e5m2 via double rounding through f16, matching the
    reference's convert path (f32->f16->bf8). NaN carries the reference's
    payload: the f16 quiet pattern 0x7E00 >> 8 = 0x7E|sign (ml_dtypes'
    canonical 0x7F differs in the payload bits only — byte parity found
    by test_refimpl_parity against the reference binary)."""
    xf = jnp.asarray(x, jnp.float32)
    out = xf.astype(jnp.float16).astype(jnp.float8_e5m2)
    u = jax.lax.bitcast_convert_type(out, jnp.uint8)
    sign = ((jax.lax.bitcast_convert_type(xf, jnp.uint32)
             >> jnp.uint32(31)).astype(jnp.uint8) << 7)
    u = jnp.where(jnp.isnan(xf), jnp.uint8(0x7E) | sign, u)
    return jax.lax.bitcast_convert_type(u, jnp.float8_e5m2)


def rne_convert_fp32_hf8(x):
    """f32 -> e4m3 via the reference's f16 intermediate (double rounding,
    libxsmm_convert_f32_to_hf8_rne = f32->f16->hf8).

    Known TPU representation limit: e4m3fn's only non-finite encoding is
    +/-NaN (S1111111) and the TPU backend CANONICALIZES NaN bytes to 0x7F
    in every f8-typed op — even a uint8->f8 bitcast of 0xFF comes back
    0x7F (r4 probe) — so the reference's sign-preserving NaN byte for
    -inf/-NaN inputs (libxsmm_convert_f32_to_hf8_rne) is unrepresentable
    in a device-resident e4m3fn array. NaN-ness itself is preserved; only
    the (semantically inert) NaN sign bit differs. The parity test
    compares NaN bytes modulo sign on TPU."""
    return jnp.asarray(x, jnp.float32).astype(jnp.float16).astype(
        jnp.float8_e4m3fn)


def convert_bf8_fp32(x):
    return jnp.asarray(x).astype(jnp.float32)


def convert_hf8_fp32(x):
    return jnp.asarray(x).astype(jnp.float32)


def rnaz_convert_fp32_bf16(x):
    """Round-nearest-away-from-zero f32 -> bf16
    (libxsmm_rnaz_convert_fp32_bf16, src/libxsmm_lpflt_quant.c:236 /
    libxsmm_convert_f32_to_bf16_rnaz, src/libxsmm_math.c:665): DAZ, then
    add 0x8000 to the magnitude bits and truncate — except Inf/NaN, which
    are never rounded (NaN quieted). Differs from RNE only at exact ties."""
    bits, nonfinite = _bf16_round_bits_prep(x)
    rounded = bits + jnp.uint32(0x8000)
    bits = jnp.where(nonfinite, bits, rounded) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def stochastic_convert_fp32_bf8(x, seed: int = 0):
    """libxsmm_stochastic_convert_fp32_bf8: stochastic rounding onto e5m2."""
    from .kernels.eltwise_pallas import stochastic_round
    return stochastic_round(jnp.asarray(x, jnp.float32), seed, Datatype.BF8)


def convert_fp32_f16(x):
    """libxsmm_convert_f32_to_f16 (RNE, the only f16 mode)."""
    return jnp.asarray(x, jnp.float32).astype(jnp.float16)


def convert_f16_fp32(x):
    """libxsmm_convert_f16_to_f32."""
    return jnp.asarray(x).astype(jnp.float32)


def convert_bf16_fp32(x):
    """libxsmm_convert_bf16_to_f32 (exact widening)."""
    return jnp.asarray(x).astype(jnp.float32)


def rne_convert_f16_hf8(x):
    """libxsmm_convert_f16_to_hf8_rne: f16 -> e4m3 through f32 (widening is
    exact, so the only rounding is the final RNE onto e4m3). NaN sign on
    TPU: see rne_convert_fp32_hf8."""
    return jnp.asarray(x, jnp.float16).astype(jnp.float32).astype(
        jnp.float8_e4m3fn)


# ---------------------------------------------------------------------------
# integer quantization with scale search (libxsmm_quantize_i16 semantics:
# find the exponent that maps the absmax into range, round via rint)
# ---------------------------------------------------------------------------

def quantize_i16(x) -> Tuple[jnp.ndarray, int]:
    """Returns (q_i16, scf) with x ~= q * 2^-scf."""
    x = jnp.asarray(x, jnp.float32)
    absmax = float(jnp.max(jnp.abs(x)))
    if absmax == 0.0:
        return jnp.zeros(x.shape, jnp.int16), 0
    if not np.isfinite(absmax):
        # graceful ValueError contract (SURVEY §5.3): NaN absmax would
        # raise an opaque int(NaN) conversion error, Inf an OverflowError
        raise ValueError("quantize_i16: input contains NaN/Inf")
    # largest scf with absmax * 2^scf <= 32767
    scf = int(np.floor(np.log2(32767.0 / absmax)))
    q = jnp.round(x * (2.0 ** scf))
    return jnp.clip(q, -32768, 32767).astype(jnp.int16), scf


def dequantize_i16(q, scf: int):
    return jnp.asarray(q, jnp.float32) * (2.0 ** -scf)


def quantize_i8(x) -> Tuple[jnp.ndarray, int]:
    x = jnp.asarray(x, jnp.float32)
    absmax = float(jnp.max(jnp.abs(x)))
    if absmax == 0.0:
        return jnp.zeros(x.shape, jnp.int8), 0
    if not np.isfinite(absmax):
        raise ValueError("quantize_i8: input contains NaN/Inf")
    scf = int(np.floor(np.log2(127.0 / absmax)))
    q = jnp.round(x * (2.0 ** scf))
    return jnp.clip(q, -128, 127).astype(jnp.int8), scf


# ---------------------------------------------------------------------------
# MX microscaling block formats (OCP MX v1.0): block=32, E8M0 shared scale
# ---------------------------------------------------------------------------

MX_BLOCK = 32

# element grids derived from format parameters (positive halves);
# (exp_bits, mant_bits, has_inf_nan) per OCP MX spec
_MX_FORMATS = {
    "mxfp4": (2, 1),    # E2M1
    "mxfp6_e2m3": (2, 3),
    "mxfp6_e3m2": (3, 2),
    "mxfp8_e4m3": (4, 3),
    "mxfp8_e5m2": (5, 2),
}


@functools.lru_cache(maxsize=None)
def _format_grid(fmt: str) -> np.ndarray:
    """All non-negative representable values of the element format."""
    e_bits, m_bits = _MX_FORMATS[fmt]
    bias = 2 ** (e_bits - 1) - 1
    vals = [0.0]
    for e in range(2 ** e_bits):
        for m in range(2 ** m_bits):
            if e == 0:   # subnormals
                v = (m / 2 ** m_bits) * 2.0 ** (1 - bias)
            else:
                v = (1 + m / 2 ** m_bits) * 2.0 ** (e - bias)
            vals.append(v)
    return np.unique(np.asarray(vals, np.float64))


def _round_to_grid(x, grid):
    """Round |x| to nearest grid point (ties toward the smaller index,
    adequate for test parity), keep sign."""
    g = jnp.asarray(grid, jnp.float32)
    ax = jnp.abs(x)
    idx = jnp.searchsorted(g, ax)
    idx = jnp.clip(idx, 1, len(grid) - 1)
    lo = g[idx - 1]
    hi = g[idx]
    pick_hi = (ax - lo) > (hi - ax)
    mag = jnp.where(pick_hi, hi, lo)
    return jnp.sign(x) * mag


def mx_quantize(x, fmt: str = "mxfp8_e4m3",
                block: int = MX_BLOCK) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize along the LAST axis in blocks: returns (elements_f32,
    scales_e8m0_exponents_i32). Elements are grid values pre-division by
    the block scale; storage packing is a separate concern (pack_fp4)."""
    if fmt not in _MX_FORMATS:
        raise ValueError(f"unknown MX format {fmt}; "
                         f"one of {sorted(_MX_FORMATS)}")
    x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] % block:
        raise ValueError(f"last dim {x.shape[-1]} not divisible by "
                         f"block {block}")
    xb = x.reshape(*x.shape[:-1], x.shape[-1] // block, block)
    absmax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
    grid = _format_grid(fmt)
    gmax = float(grid[-1])
    # shared exponent: smallest power of two with absmax/scale <= grid max
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-38) / gmax))
    e = jnp.clip(e, -127, 127)
    scale = jnp.exp2(e)
    q = _round_to_grid(xb / scale, grid)
    return (q.reshape(x.shape),
            e.squeeze(-1).astype(jnp.int32))


def mx_dequantize(q, scales_e, block: int = MX_BLOCK):
    q = jnp.asarray(q, jnp.float32)
    qb = q.reshape(*q.shape[:-1], q.shape[-1] // block, block)
    out = qb * jnp.exp2(scales_e.astype(jnp.float32))[..., None]
    return out.reshape(q.shape)


# ---------------------------------------------------------------------------
# reference-exact MX block quantizers (UNARY_QUANT MX output dtypes):
# bit-faithful ports of libxsmm_ref_fp32_to_{mxfp4,nvfp4,mxfp8}_block
# (/root/reference/src/generator_mateltwise_reference_impl.c:1896-2076),
# blocked along the LAST axis. Payload/scale layouts match the reference's
# storage contract (MXFP4X2/NVFP4X2: two 4-bit codes per byte; E8M0 or HF8
# scale byte per block).
# ---------------------------------------------------------------------------

# E2M1 magnitude grid (code 0..7)
_E2M1_GRID = np.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)


def encode_e2m1(absval):
    """libxsmm_ref_encode_e2m1_abs: RNE onto the E2M1 grid with the
    reference's exact tie directions (impl.c:1870-1882); NaN -> 0x7."""
    a = jnp.asarray(absval, jnp.float32)
    code = ((a > 0.25).astype(jnp.int32) + (a >= 0.75) + (a > 1.25)
            + (a >= 1.75) + (a > 2.5) + (a >= 3.5) + (a > 5.0))
    return jnp.where(jnp.isnan(a), 7, code).astype(jnp.int32)


def _pack_codes_pairwise(code):
    """4-bit codes -> bytes, even element in the LOW nibble (:1941)."""
    lo = code[..., 0::2]
    hi = code[..., 1::2]
    return ((hi << 4) | lo).astype(jnp.uint8)


def _unpack_nibble_codes(packed):
    """bytes -> 4-bit codes along the last axis, LOW nibble first (the
    inverse of _pack_codes_pairwise)."""
    p = jnp.asarray(packed, jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    return jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1],
                                                p.shape[-1] * 2)


def _e8m0_decode(scales):
    """E8M0 shared-scale decode: code 0 -> 2^-127, else 2^(e-127). ONE
    definition shared by every MX dequantizer so a contract change (e.g.
    the 0xFF Inf-block handling) cannot silently diverge per format."""
    e = jnp.asarray(scales).astype(jnp.int32)
    return jnp.where(e == 0, jnp.float32(2.0) ** -127,
                     jnp.exp2((e - 127).astype(jnp.float32)))


def _e8m0_shared_scale(x_blocks, elem_emax: int):
    """Shared E8M0 exponent per block: biased exponent of amax minus the
    element format's emax, clamped to [0, 254] (:1906-1925). Returns
    (scale_f32, scale_code_u8, nonfinite_mask). On Inf/NaN amax (biased
    exponent 0xFF) the reference emits scale code 0xFF and fills the block
    payload with max-normal element codes; the mask lets callers apply the
    payload half of that contract."""
    amax = jnp.max(jnp.abs(x_blocks), axis=-1, keepdims=True)
    bits = jax.lax.bitcast_convert_type(amax, jnp.uint32)
    bexp = ((bits >> 23) & 0xFF).astype(jnp.int32)
    nonfinite = bexp == 0xFF
    shared = jnp.clip(bexp - elem_emax, 0, 254)
    mant = jnp.where(shared == 0, jnp.uint32(1 << 22), jnp.uint32(0))
    scale = jax.lax.bitcast_convert_type(
        (shared.astype(jnp.uint32) << 23) | mant, jnp.float32)
    scode = jnp.where(nonfinite, 255, shared).astype(jnp.uint8)
    return scale, scode, nonfinite


def mxfp4_quantize_blocks(x):
    """f32 -> MXFP4X2: (payload u8 (..., n/2), scales_e8m0 u8 (..., n/32)).

    Port of libxsmm_ref_fp32_to_mxfp4_block (impl.c:1898-1946): E2M1
    elements, blocksize 32, E8M0 scale offset by elem_emax=2; the sign
    nibble bit comes from the INPUT's sign bit (preserves -0)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    if n % MX_BLOCK:
        raise ValueError(f"last dim {n} not divisible by {MX_BLOCK}")
    xb = x.reshape(*x.shape[:-1], n // MX_BLOCK, MX_BLOCK)
    scale, scode, nonfinite = _e8m0_shared_scale(xb, elem_emax=2)
    sign = ((jax.lax.bitcast_convert_type(xb, jnp.uint32) >> 31)
            .astype(jnp.int32) << 3)
    code = sign | encode_e2m1(jnp.abs(xb / scale))
    # Inf/NaN amax: scale code 0xFF + payload all max-normal (0x77 bytes).
    code = jnp.where(nonfinite, 7, code)
    packed = _pack_codes_pairwise(code).reshape(*x.shape[:-1], n // 2)
    return packed, scode.squeeze(-1).reshape(*x.shape[:-1], n // MX_BLOCK)


def mxfp4_dequantize_blocks(packed, scales):
    """Inverse storage transform of mxfp4_quantize_blocks -> f32."""
    code = _unpack_nibble_codes(packed)
    mag = jnp.asarray(_E2M1_GRID)[code & 0x7]
    val = jnp.where((code >> 3) & 1 == 1, -mag, mag)
    n = val.shape[-1]
    vb = val.reshape(*val.shape[:-1], n // MX_BLOCK, MX_BLOCK)
    scale = _e8m0_decode(scales)
    return (vb * scale[..., None]).reshape(val.shape)


NVFP4_BLOCK = 16


def nvfp4_quantize_blocks(x):
    """f32 -> NVFP4X2: (payload u8 (..., n/2), scales_hf8 u8 (..., n/16)).

    Port of libxsmm_ref_fp32_to_nvfp4_block (impl.c:1951-2012): E2M1
    elements, blocksize 16, E4M3 (HF8) scale = hf8(bf16(bf16(amax)/6));
    elements scaled by the BF16 reciprocal of the decoded scale."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    if n % NVFP4_BLOCK:
        raise ValueError(f"last dim {n} not divisible by {NVFP4_BLOCK}")
    xb = x.reshape(*x.shape[:-1], n // NVFP4_BLOCK, NVFP4_BLOCK)
    amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
    rcp6 = jax.lax.bitcast_convert_type(jnp.uint32(0x3E2A0000),
                                        jnp.float32)  # bf16(1/6)
    raw = (amax.astype(jnp.bfloat16).astype(jnp.float32)
           * rcp6).astype(jnp.bfloat16).astype(jnp.float32)
    # The reference's SCALE encoder (libxsmm_ref_float_to_hf8,
    # impl.c:1813-1894) clamps ANY value needing e4m3 exponent 15 — i.e.
    # everything that rounds to >= 256 — to the code 0x78, which its own
    # hf8 decode reads as 256 (the "448" in its comment is not what the
    # code emits). It never produces codes 0x79..0x7E. Reproduce exactly:
    # clamp the cast input (so >464 cannot hit the e4m3fn NaN), then fold
    # every exponent-15 encoding to 0x78. NaN propagates to 0x7F.
    raw = jnp.minimum(raw, 448.0)                 # NaN passes through
    scale_hf8 = raw.astype(jnp.float8_e4m3fn)
    code_u = jax.lax.bitcast_convert_type(scale_hf8, jnp.uint8)
    exp15 = ((code_u & jnp.uint8(0x7F)) >= jnp.uint8(0x78)) \
        & ((code_u & jnp.uint8(0x7F)) < jnp.uint8(0x7F))
    code_u = jnp.where(exp15, (code_u & jnp.uint8(0x80))
                       | jnp.uint8(0x78), code_u)
    scale_hf8 = jax.lax.bitcast_convert_type(code_u, jnp.float8_e4m3fn)
    scale_f = scale_hf8.astype(jnp.float32)
    scale_code = code_u
    scale_code = jnp.where(amax == 0.0, jnp.uint8(0), scale_code)
    rcp = (1.0 / jnp.where(scale_f == 0.0, 1.0,
                           scale_f.astype(jnp.bfloat16).astype(jnp.float32)))
    rcp = rcp.astype(jnp.bfloat16).astype(jnp.float32)
    v = (xb * rcp).astype(jnp.bfloat16).astype(jnp.float32)
    sign = ((jax.lax.bitcast_convert_type(xb, jnp.uint32) >> 31)
            .astype(jnp.int32) << 3)
    code = sign | encode_e2m1(jnp.abs(v))
    code = jnp.where(scale_f == 0.0, 0, code)
    packed = _pack_codes_pairwise(code).reshape(*x.shape[:-1], n // 2)
    return packed, scale_code.squeeze(-1).reshape(*x.shape[:-1],
                                                  n // NVFP4_BLOCK)


def nvfp4_dequantize_blocks(packed, scales):
    code = _unpack_nibble_codes(packed)
    mag = jnp.asarray(_E2M1_GRID)[code & 0x7]
    val = jnp.where((code >> 3) & 1 == 1, -mag, mag)
    n = val.shape[-1]
    vb = val.reshape(*val.shape[:-1], n // NVFP4_BLOCK, NVFP4_BLOCK)
    scale = jax.lax.bitcast_convert_type(
        scales.astype(jnp.uint8), jnp.float8_e4m3fn).astype(jnp.float32)
    return (vb * scale[..., None]).reshape(val.shape)


def mxbf8_quantize_blocks(x):
    """f32 -> MXBF8: (payload bf8 (..., n), scales_e8m0 u8 (..., n/32)).

    Port of libxsmm_ref_fp32_to_mxfp8_block (impl.c:2017-2076): E5M2 (BF8)
    elements via the reference's RNE f32->bf8, blocksize 32, E8M0 scale
    offset by elem_emax=15."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    if n % MX_BLOCK:
        raise ValueError(f"last dim {n} not divisible by {MX_BLOCK}")
    xb = x.reshape(*x.shape[:-1], n // MX_BLOCK, MX_BLOCK)
    scale, scode, nonfinite = _e8m0_shared_scale(xb, elem_emax=15)
    q = rne_convert_fp32_bf8(xb / scale)
    # Inf/NaN amax: scale code 0xFF + payload all max-normal BF8 (0x7B).
    maxn = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(jnp.uint8(0x7B), q.shape), q.dtype)
    q = jnp.where(nonfinite, maxn, q).reshape(x.shape)
    return q, scode.squeeze(-1).reshape(*x.shape[:-1], n // MX_BLOCK)


_FP6_PARAMS = {
    # (exp_bits, mant_bits); bias = 2^(e-1)-1. Naming follows the
    # reference's BF (exponent-heavy) / HF (mantissa-heavy) convention:
    # BF6 = E3M2, HF6 = E2M3 (LUT converters
    # generator_gemm_reference_impl.c:73-97 fp6_e2m3/e3m2 -> hf8).
    "e2m3": (2, 3),
    "e3m2": (3, 2),
}


def fp6_decode(codes, fmt: str = "e3m2"):
    """6-bit code (sign<<5 | exp<<m | mant, one code per byte) -> f32."""
    e_bits, m_bits = _FP6_PARAMS[fmt]
    bias = 2 ** (e_bits - 1) - 1
    c = jnp.asarray(codes, jnp.int32)
    e = (c >> m_bits) & (2 ** e_bits - 1)
    m = c & (2 ** m_bits - 1)
    frac = m.astype(jnp.float32) / (2 ** m_bits)
    mag = jnp.where(e == 0,
                    frac * 2.0 ** (1 - bias),
                    (1.0 + frac) * jnp.exp2((e - bias).astype(jnp.float32)))
    return jnp.where((c >> (e_bits + m_bits)) & 1 == 1, -mag, mag)


def fp6_encode(x, fmt: str = "e3m2"):
    """f32 -> nearest 6-bit code (RNE onto the format grid, one per byte).

    True round-to-nearest-even: at an exact grid midpoint the EVEN code of
    the two neighbours wins (argmin alone ties toward zero)."""
    e_bits, m_bits = _FP6_PARAMS[fmt]
    grid = _format_grid("mxfp6_" + fmt)
    g = jnp.asarray(grid, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    mag = jnp.clip(jnp.abs(x), 0.0, float(grid[-1]))
    idx = jnp.argmin(jnp.abs(mag[..., None] - g[None]), axis=-1)
    # argmin ties to the FIRST (lower-magnitude) grid point; detect an exact
    # midpoint between g[idx] and g[idx+1] (grid values and midpoints are
    # exactly representable in f32 for 6-bit formats) and take the higher
    # neighbour iff the lower code is odd — of two consecutive codes exactly
    # one is even.
    idx_hi = jnp.minimum(idx + 1, len(grid) - 1)
    tie = (mag - g[idx] == g[idx_hi] - mag) & (mag > g[idx])
    idx = jnp.where(tie & (idx % 2 == 1), idx_hi, idx)
    # grid index -> (e, m) code: index i of the sorted unique grid equals
    # the natural code order for these formats (subnormals then normals)
    code = idx.astype(jnp.int32)
    sign = (jax.lax.bitcast_convert_type(x, jnp.uint32) >> 31).astype(
        jnp.int32) << (e_bits + m_bits)
    return (sign | code).astype(jnp.uint8)


_FP6_EMAX = {"e2m3": 2, "e3m2": 4}   # floor(log2(grid max)): 7.5 / 28


def mxfp6_quantize_blocks(x, fmt: str = "e3m2"):
    """f32 -> MXBF6/MXHF6: (codes u8 (..., n), scales_e8m0 u8 (..., n/32)).

    E8M0 shared scale per 32-block in the mxfp4/mxfp8 pattern
    (generator_mateltwise_reference_impl.c:1906-1925) with the format's
    elem_emax; elements stored one 6-bit code per byte (the reference's
    3-bytes-per-4-values bit packing is an ISA storage detail that does
    not port — XLA owns layout; documented in docs/PARITY.md)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    if n % MX_BLOCK:
        raise ValueError(f"last dim {n} not divisible by {MX_BLOCK}")
    xb = x.reshape(*x.shape[:-1], n // MX_BLOCK, MX_BLOCK)
    scale, scode, nonfinite = _e8m0_shared_scale(xb, elem_emax=_FP6_EMAX[fmt])
    codes = fp6_encode(xb / scale, fmt)
    # Inf/NaN amax: scale code 0xFF + payload all max-normal (5-bit 0x1F).
    codes = jnp.where(nonfinite, jnp.uint8(0x1F), codes).reshape(x.shape)
    return codes, scode.squeeze(-1).reshape(*x.shape[:-1], n // MX_BLOCK)


def mxfp6_dequantize_blocks(codes, scales, fmt: str = "e3m2"):
    v = fp6_decode(codes, fmt)
    n = v.shape[-1]
    vb = v.reshape(*v.shape[:-1], n // MX_BLOCK, MX_BLOCK)
    scale = _e8m0_decode(scales)
    return (vb * scale[..., None]).reshape(v.shape)


def unpack_subbyte_gemm(dt, packed):
    """Decode a packed sub-byte integer GEMM operand along the LAST axis.

    Value semantics follow the reference GEMM impl exactly:
      * I4X2: two sign-extended nibbles per byte, low nibble first
        (generator_gemm_reference_impl.c Ai4 paths);
      * U4X2: unsigned nibbles;
      * I2X4: four 2-bit TERNARY codes {0:0, 1:+1, 2:-1, 3:-1}
        (unpack2bit, impl.c:19-56);
      * I1X8: eight 1-bit BINARY codes {0:+1, 1:-1} (impl.c:1199-1223).
    Returns int8 with last dim expanded by the pack factor."""
    from .dtypes import Datatype
    p = jnp.asarray(packed, jnp.int32) & 0xFF
    if dt in (Datatype.I4X2, Datatype.U4X2):
        lo = p & 0xF
        hi = (p >> 4) & 0xF
        if dt == Datatype.I4X2:
            lo = jnp.where(lo >= 8, lo - 16, lo)
            hi = jnp.where(hi >= 8, hi - 16, hi)
        out = jnp.stack([lo, hi], axis=-1)
    elif dt == Datatype.I2X4:
        codes = jnp.stack([(p >> (2 * i)) & 0x3 for i in range(4)], axis=-1)
        lut = jnp.asarray([0, 1, -1, -1], jnp.int32)
        out = lut[codes]
    elif dt == Datatype.I1X8:
        bits = jnp.stack([(p >> i) & 1 for i in range(8)], axis=-1)
        out = jnp.where(bits == 0, 1, -1)
    else:
        raise ValueError(f"not a packed sub-byte integer type: {dt}")
    return out.reshape(*p.shape[:-1], -1).astype(jnp.int8)


def pack_subbyte_gemm(dt, values):
    """Inverse of unpack_subbyte_gemm for building operands (I4X2/U4X2
    exact; I2X4/I1X8 encode by value match: 0/±1 for I2X4, ±1 for I1X8)."""
    from .dtypes import Datatype
    v = jnp.asarray(values, jnp.int32)
    if dt in (Datatype.I4X2, Datatype.U4X2):
        pairs = v.reshape(*v.shape[:-1], v.shape[-1] // 2, 2) & 0xF
        return ((pairs[..., 1] << 4) | pairs[..., 0]).astype(jnp.uint8)
    if dt == Datatype.I2X4:
        code = jnp.where(v == 0, 0, jnp.where(v > 0, 1, 2))
        quads = code.reshape(*v.shape[:-1], v.shape[-1] // 4, 4)
        out = (quads[..., 0] | (quads[..., 1] << 2) | (quads[..., 2] << 4)
               | (quads[..., 3] << 6))
        return out.astype(jnp.uint8)
    if dt == Datatype.I1X8:
        bit = jnp.where(v > 0, 0, 1)
        octs = bit.reshape(*v.shape[:-1], v.shape[-1] // 8, 8)
        out = sum((octs[..., i] << i) for i in range(8))
        return out.astype(jnp.uint8)
    raise ValueError(f"not a packed sub-byte integer type: {dt}")


def mxbf8_dequantize_blocks(payload, scales):
    v = jnp.asarray(payload).astype(jnp.float32)
    n = v.shape[-1]
    vb = v.reshape(*v.shape[:-1], n // MX_BLOCK, MX_BLOCK)
    scale = _e8m0_decode(scales)
    return (vb * scale[..., None]).reshape(v.shape)


# ---------------------------------------------------------------------------
# sub-byte packing (I4X2 / MXFP4X2 storage parity, typedefs.h:236-241)
# ---------------------------------------------------------------------------

def pack_i4x2(lo, hi):
    """Pack two int4 arrays (values in [-8,7]) into one uint8 array."""
    lo = jnp.asarray(lo, jnp.int32) & 0xF
    hi = jnp.asarray(hi, jnp.int32) & 0xF
    return ((hi << 4) | lo).astype(jnp.uint8)


def unpack_i4x2(packed):
    p = jnp.asarray(packed, jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    # sign-extend 4-bit
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def pack_fp4(q, fmt: str = "mxfp4"):
    """Encode grid values (from mx_quantize) to 4-bit codes, two per byte
    along the last axis (MXFP4X2 storage layout)."""
    grid = _format_grid(fmt)
    g = jnp.asarray(grid, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    mag_code = jnp.argmin(jnp.abs(jnp.abs(q)[..., None] - g[None]), axis=-1)
    sign = (q < 0).astype(jnp.int32)
    code = (sign << 3) | mag_code.astype(jnp.int32)
    if q.shape[-1] % 2:
        raise ValueError("need even last dim to pack pairs")
    return _pack_codes_pairwise(code)


def unpack_fp4(packed, fmt: str = "mxfp4"):
    grid = _format_grid(fmt)
    g = jnp.asarray(grid, jnp.float32)
    code = _unpack_nibble_codes(packed)
    mag = g[code & 0x7]
    sign = jnp.where((code >> 3) & 1 == 1, -1.0, 1.0)
    return sign * mag


# ---------------------------------------------------------------------------
# Reference-spelling aliases. The reference exposes the convert family under
# TWO public names each (libxsmm.h `*_to_*` style and the short
# include/utils/libxsmm_lpflt_quant.h style); keep both resolvable so ports
# from either header work unchanged.
# ---------------------------------------------------------------------------
convert_bf16_f32 = convert_bf16_to_f32 = convert_bf16_fp32
convert_bf8_f32 = convert_bf8_to_f32 = convert_bf8_fp32
convert_f16_f32 = convert_f16_to_f32 = convert_f16_fp32
convert_hf8_f32 = convert_hf8_to_f32 = convert_hf8_fp32
convert_f32_to_f16 = rne_convert_fp32_f16 = convert_fp32_f16
convert_f32_to_bf16_rne = rne_convert_fp32_bf16
convert_f32_to_bf16_rnaz = rnaz_convert_fp32_bf16
convert_f32_to_bf16_truncate = truncate_convert_f32_bf16 = (
    truncate_convert_fp32_bf16)
convert_f32_to_bf8_rne = rne_convert_fp32_bf8
convert_f32_to_bf8_stochastic = stochastic_convert_fp32_bf8
convert_f32_to_hf8_rne = rne_convert_fp32_hf8
convert_f16_to_hf8_rne = rne_convert_f16_hf8
