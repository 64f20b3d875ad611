"""Datatype model.

Mirrors the reference's `libxsmm_datatype` enumeration
(/root/reference/include/libxsmm_typedefs.h:218-246) onto JAX dtypes.

TPU mapping policy:
  * F64/F32/BF16/F16/I64/U64/I32/U32/I16/U16/I8/U8 are native jnp dtypes.
    (F64 compute runs through XLA's f64 path — on TPU this is emulated and
    slow but correct; the FP64 spectral-element configs accept this, see
    SURVEY.md §7.3.)
  * BF8 == float8_e5m2, HF8 == float8_e4m3fn (same bit layouts as the
    reference's BF8/HF8, src/libxsmm_lpflt_quant.c).
  * BF32 (aka tf32-like 19-bit) is a *compute* precision: represented as
    float32 storage with bf16-input MXU compute (jax.lax Precision).
  * MX* microscaling and sub-byte packed types (I4X2, MXFP4X2, ...) have no
    native TPU storage; they are handled by the quant module as
    (packed-uint8 payload, scale) pairs. Dispatchers accept them only where
    the quant/dequant ops implement them (quant.py); elsewhere they raise.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class Datatype(enum.Enum):
    """Element types; order and names follow the reference enum."""

    F64 = "f64"
    F32 = "f32"
    BF16 = "bf16"
    F16 = "f16"
    BF8 = "bf8"
    HF8 = "hf8"
    I64 = "i64"
    U64 = "u64"
    I32 = "i32"
    U32 = "u32"
    I16 = "i16"
    U16 = "u16"
    I8 = "i8"
    U8 = "u8"
    MXBF8 = "mxbf8"
    MXHF8 = "mxhf8"
    MXBF6 = "mxbf6"
    MXHF6 = "mxhf6"
    I4X2 = "i4x2"
    U4X2 = "u4x2"
    MXFP4X2 = "mxfp4x2"
    NVFP4X2 = "nvfp4x2"
    I2X4 = "i2x4"
    I1X8 = "i1x8"
    BF32 = "bf32"
    IMPLICIT = "implicit"

    def __repr__(self) -> str:  # terse keys in kernel names
        return self.value


_JNP = {
    Datatype.F64: jnp.float64,
    Datatype.F32: jnp.float32,
    Datatype.BF16: jnp.bfloat16,
    Datatype.F16: jnp.float16,
    Datatype.BF8: jnp.float8_e5m2,
    Datatype.HF8: jnp.float8_e4m3fn,
    Datatype.I64: jnp.int64,
    Datatype.U64: jnp.uint64,
    Datatype.I32: jnp.int32,
    Datatype.U32: jnp.uint32,
    Datatype.I16: jnp.int16,
    Datatype.U16: jnp.uint16,
    Datatype.I8: jnp.int8,
    Datatype.U8: jnp.uint8,
    Datatype.BF32: jnp.float32,  # storage f32; compute via MXU bf16x3 path
}

# Bits per element (sub-byte packed types report their true element width).
_BITS = {
    Datatype.F64: 64, Datatype.I64: 64, Datatype.U64: 64,
    Datatype.F32: 32, Datatype.I32: 32, Datatype.U32: 32, Datatype.BF32: 32,
    Datatype.BF16: 16, Datatype.F16: 16, Datatype.I16: 16, Datatype.U16: 16,
    Datatype.BF8: 8, Datatype.HF8: 8, Datatype.I8: 8, Datatype.U8: 8,
    Datatype.MXBF8: 8, Datatype.MXHF8: 8,
    Datatype.MXBF6: 6, Datatype.MXHF6: 6,
    Datatype.I4X2: 4, Datatype.U4X2: 4, Datatype.MXFP4X2: 4,
    Datatype.NVFP4X2: 4, Datatype.I2X4: 2, Datatype.I1X8: 1,
}

_FROM_JNP = {np.dtype(v): k for k, v in _JNP.items()
             if k not in (Datatype.BF32,)}


def to_jnp(dt: "Datatype"):
    """JAX dtype for a natively-representable Datatype; raises otherwise."""
    try:
        return _JNP[dt]
    except KeyError:
        raise ValueError(
            f"Datatype {dt} has no native TPU storage; use the quant module "
            f"(packed payload + scales) for microscaling/sub-byte types."
        ) from None


def from_jnp(dtype) -> "Datatype":
    return _FROM_JNP[np.dtype(dtype)]


def is_native(dt: "Datatype") -> bool:
    return dt in _JNP


def bits(dt: "Datatype") -> int:
    return _BITS[dt]


def itemsize(dt: "Datatype") -> int:
    return max(1, _BITS[dt] // 8)


def typesize(dt: "Datatype") -> int:
    """Alias mirroring LIBXSMM_TYPESIZE."""
    return itemsize(dt)


def get_typename(dt: "Datatype") -> str:
    """libxsmm_get_typename analogue (include/libxsmm.h:77)."""
    return Datatype(dt).value
