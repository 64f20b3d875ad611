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

from .dtypes import Datatype, to_jnp


# ---------------------------------------------------------------------------
# scalar-format conversions (libxsmm_rne_convert_* / truncate_*)
# ---------------------------------------------------------------------------

def rne_convert_fp32_bf16(x):
    """Round-to-nearest-even f32 -> bf16 (libxsmm_rne_convert_fp32_bf16)."""
    return jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)


def truncate_convert_fp32_bf16(x):
    """Truncation mode: drop the low 16 bits."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                        jnp.uint32)
    bits = bits & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def stochastic_convert_fp32_bf16(x, seed: int = 0):
    from .kernels.eltwise_pallas import stochastic_round
    return stochastic_round(jnp.asarray(x, jnp.float32), seed, Datatype.BF16)


def rne_convert_fp32_bf8(x):
    """f32 -> e5m2 via double rounding through f16, matching the
    reference's convert path (f32->f16->bf8)."""
    return jnp.asarray(x, jnp.float32).astype(jnp.float16).astype(
        jnp.float8_e5m2)


def rne_convert_fp32_hf8(x):
    return jnp.asarray(x, jnp.float32).astype(jnp.float8_e4m3fn)


def convert_bf8_fp32(x):
    return jnp.asarray(x).astype(jnp.float32)


def convert_hf8_fp32(x):
    return jnp.asarray(x).astype(jnp.float32)


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
    lo = code[..., 0::2]
    hi = code[..., 1::2]
    return ((hi << 4) | lo).astype(jnp.uint8)


def unpack_fp4(packed, fmt: str = "mxfp4"):
    grid = _format_grid(fmt)
    g = jnp.asarray(grid, jnp.float32)
    p = jnp.asarray(packed, jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    code = jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1],
                                                p.shape[-1] * 2)
    mag = g[code & 0x7]
    sign = jnp.where((code >> 3) & 1 == 1, -1.0, 1.0)
    return sign * mag
