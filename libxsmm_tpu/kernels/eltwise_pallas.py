"""Stateful element-wise kernels: dropout, stochastic rounding, quant.

These are the meltw ops whose semantics XLA does not express as pure math:
they need a PRNG stream (dropout/stochastic-round) or saturating integer
conversion (quant). The reference implements them with its xoshiro RNG state
plumbed through kernel args (/root/reference/src/libxsmm_rng.c:123-239,
generator_mateltwise_unary_binary_avx_avx512.c dropout/stoch-round paths).

TPU-native: on TPU hardware they are Pallas kernels using the per-core PRNG
(pltpu.prng_seed / prng_random_bits / stochastic_round); on CPU backends
(test harness) a jax.random-based path with identical *statistical*
semantics serves as the reference oracle. Bit-exactness across backends is
not promised (the reference makes the same choice: its AVX-512 vectorized
RNG stream differs from the scalar one, src/libxsmm_rng.c:149-170).

Dropout semantics match the reference: keep with probability (1-p), scale
kept values by 1/(1-p), optionally emit the keep-mask; DROPOUT_INV applies a
saved mask to gradients.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .. import device
from ..descriptor import MeltwDescriptor, UnaryFlags, UnaryType
from ..dtypes import Datatype, to_jnp


def _pallas_available() -> bool:
    return device.on_tpu() and not device.use_interpret()


# ---------------------------------------------------------------------------
# stochastic rounding
# ---------------------------------------------------------------------------


def _sr_bf16_bits(x, rand_u32):
    """Exact stochastic round f32->bf16 via the add-random-truncate trick
    (bf16 is a truncation of f32, so this is exact SR)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    bits = bits + (rand_u32 & jnp.uint32(0xFFFF))
    bits = bits & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def _sr_tpu(x, seed, target_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic has no f16 type: an f16 INPUT ref can be avoided by feeding
    # the f32 view; an f16 TARGET cannot (the output ref itself would be
    # f16) — callers route that to the portable path.
    if x.dtype == jnp.float16:
        x = x.astype(jnp.float32)

    def kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        rbits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        o_ref[:] = pltpu.stochastic_round(
            x_ref[:].astype(jnp.float32), rbits, target_dtype=target_dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, target_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([seed], jnp.int32), x)


def stochastic_round(x, seed, target: Datatype):
    """UNARY_STOCHASTIC_ROUND (typedefs.h:316 op 38)."""
    tdt = to_jnp(target)
    # f16 target refs are unrepresentable in Mosaic (deferred backend
    # failure the except below cannot catch under jit) -> portable path
    if _pallas_available() and tdt != jnp.float16:
        try:
            return _sr_tpu(x, seed, tdt)
        except Exception:
            pass  # fall through to the portable path
    key = jax.random.PRNGKey(seed)
    if tdt == jnp.bfloat16:
        rand = jax.random.bits(key, x.shape, jnp.uint32)
        return _sr_bf16_bits(x, rand)
    # portable approximation for non-truncation targets (f16/f8): dither by
    # one target-ulp of uniform noise then round-to-nearest-even cast.
    mant = {jnp.float16: 10, jnp.float8_e5m2: 2, jnp.float8_e4m3fn: 3}.get(tdt, 10)
    u = jax.random.uniform(key, x.shape, jnp.float32) - 0.5
    xf = x.astype(jnp.float32)
    scale = jnp.exp2(jnp.floor(jnp.log2(jnp.maximum(jnp.abs(xf), 1e-30))) - mant)
    return (xf + u * scale).astype(tdt)


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------


def _dropout_tpu(x, seed, p):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic has no f16 type ("Unsupported type in mosaic dialect: 'f16'",
    # found by the r3 TPU dtype sweep — interpret mode hides it): run the
    # kernel on an f32 view and round back at the boundary. The error is
    # a DEFERRED backend-compile failure, so the caller's try/except
    # around tracing would not catch it.
    if x.dtype == jnp.float16:
        out, mask = _dropout_tpu(x.astype(jnp.float32), seed, p)
        return out.astype(jnp.float16), mask

    def kernel(seed_ref, p_ref, x_ref, o_ref, m_ref):
        pltpu.prng_seed(seed_ref[0])
        rbits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        # uniform in [0,1): mantissa-fill trick (Mosaic has no u32->f32 cast):
        # set exponent to 127 -> value in [1,2), subtract 1
        fbits = (rbits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
        u = pltpu.bitcast(fbits, jnp.float32) - 1.0
        # p rides in SMEM so the runtime-alpha ABI (traced p under the
        # caller's jit) reaches the Pallas kernel instead of silently
        # rerouting to the portable path
        pv = p_ref[0]
        keep = u >= pv
        scale = 1.0 / (1.0 - pv)
        o_ref[:] = jnp.where(keep, x_ref[:].astype(jnp.float32) * scale,
                             0.0).astype(o_ref.dtype)
        m_ref[:] = keep.astype(jnp.uint8)

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, jnp.uint8)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(jnp.asarray([seed], jnp.int32),
      jnp.asarray([p], jnp.float32).reshape(1), x)


def dropout(x, seed, p: float):
    """UNARY_DROPOUT: returns (out, keep_mask:uint8)."""
    if isinstance(p, (int, float)) and not 0.0 <= p < 1.0:
        # the 1/(1-p) rescale is undefined at p=1 (a bare ZeroDivisionError
        # otherwise surfaces from deep inside the kernel); traced p (the
        # runtime-alpha ABI) skips the check — division is traced there
        raise ValueError(f"dropout probability must be in [0, 1), got {p}")
    if _pallas_available():
        try:
            # p is a runtime operand (SMEM), so both static and traced p
            # (the runtime-alpha ABI) take the Pallas per-core-PRNG path
            return _dropout_tpu(x, seed, p)
        except Exception as e:
            # deferred Mosaic failures (shape/layout corner) degrade to
            # the portable path — VISIBLY, not silently (review finding)
            import warnings
            warnings.warn(f"Pallas dropout fell back to jax.random: {e}")
    key = jax.random.PRNGKey(seed)
    keep = jax.random.uniform(key, x.shape) >= p
    scale = 1.0 / (1.0 - p)
    out = jnp.where(keep, x.astype(jnp.float32) * scale, 0.0).astype(x.dtype)
    return out, keep.astype(jnp.uint8)


def dropout_inv(g, mask, p: float):
    """UNARY_DROPOUT_INV: apply the saved keep-mask to the gradient,
    rescaled by 1/(1-p) (generator_mateltwise_reference_impl.c:2408-2424).

    `mask` is the PACKED bitmask the forward emitted (reference
    param->in.secondary bit layout); a same-shaped per-element mask is also
    accepted for convenience."""
    from ..ops.eltwise import unpack_bitmask
    if isinstance(p, (int, float)) and not 0.0 <= p < 1.0:
        raise ValueError(f"dropout probability must be in [0, 1), got {p}")
    m, n = g.shape
    if mask.shape == g.shape:
        bits = mask != 0
    else:
        bits = unpack_bitmask(mask, m, n)
    scale = 1.0 / (1.0 - p)
    return jnp.where(bits, g.astype(jnp.float32) * scale, 0.0).astype(g.dtype)


# ---------------------------------------------------------------------------
# quant / dequant
# ---------------------------------------------------------------------------

_INT_RANGE = {
    "int8": (-128, 127),
    "int16": (-32768, 32767),
    "int32": (-(2 ** 31), 2 ** 31 - 1),
    "uint8": (0, 255),
    "uint16": (0, 65535),
}


def quant(x, scale, out_dtype, *, stochastic: bool = False, seed: int = 0,
          sign_sat: bool = False, skip_scf: bool = False):
    """UNARY_QUANT (typedefs.h op 42): q = round(x * scale), stored per the
    reference's flag semantics (generator_mateltwise_reference_impl.c:
    2197-2258):

      * skip_scf (NO_SCF_QUANT): ignore the scale operand, scf = 1.0;
      * sign_sat (SIGN_SAT_QUANT): saturate to the target's signed range;
      * default: C-truncation wraparound — `(char)(0xff & (int)rintf(...))`
        keeps the LOW BYTES of the rounded integer, it does not clamp.

    `scale` may be a scalar or a per-column/row vector (the reference's
    USE_COL_VEC_SCF pattern). Rounding is rint (round-half-even).
    """
    xs = x.astype(jnp.float32) * (1.0 if skip_scf else scale)
    if stochastic:
        key = jax.random.PRNGKey(seed)
        xs = xs + jax.random.uniform(key, xs.shape, jnp.float32) - 0.5
        q = jnp.floor(xs + 0.5)
    else:
        q = jnp.round(xs)  # round-half-even, matching rint()
    import numpy as _np
    name = _np.dtype(out_dtype).name
    if sign_sat or name in ("int32", "uint8", "uint16"):
        # i32 has no narrower intermediate to wrap through; unsigned
        # targets keep the legacy clip behavior (no reference path exists)
        lo, hi = _INT_RANGE[name]
        return jnp.clip(q, lo, hi).astype(out_dtype)
    # wraparound: rounded f32 -> i32 -> low bytes (modular astype)
    return q.astype(jnp.int32).astype(out_dtype)


def dequant(q, scale, out_dtype=jnp.float32):
    """UNARY_DEQUANT (typedefs.h op 43)."""
    return (q.astype(jnp.float32) * scale).astype(out_dtype)


# ---------------------------------------------------------------------------
# dispatcher hook used by ops/eltwise.py
# ---------------------------------------------------------------------------


def run_stateful_unary(desc: MeltwDescriptor, x, *args, **state):
    op = desc.op_type
    if op == UnaryType.STOCHASTIC_ROUND:
        seed = state.get("seed", args[0] if args else 0)
        target = desc.out_type if desc.out_type != Datatype.IMPLICIT else Datatype.BF16
        return stochastic_round(x, seed, target)
    if op == UnaryType.DROPOUT:
        p = state.get("p", desc.extra[0] if desc.extra else 0.5)
        # positional seed accepted like STOCHASTIC_ROUND — silently
        # ignoring it would reuse one fixed mask across training steps
        seed = state.get("seed", args[0] if args else 0)
        out, mask = dropout(x, seed, p)
        if desc.flags & UnaryFlags.BITMASK_2BYTEMULT:
            # reference contract: the side output is a PACKED bit matrix
            # with UPDIV(ldo,16)*16-bit row stride (:2363, :2383-2387)
            from ..ops.eltwise import pack_bitmask
            return out, pack_bitmask(mask != 0, two_byte_mult=True)
        return out
    if op == UnaryType.DROPOUT_INV:
        p = state.get("p", desc.extra[0] if desc.extra else 0.5)
        (mask,) = args
        return dropout_inv(x, mask, p)
    if op == UnaryType.QUANT:
        # MX output dtypes: block-quantized (payload, scales) pairs via the
        # reference-exact block converters (impl.c:2260-2322 routing)
        if desc.out_type in (Datatype.MXFP4X2, Datatype.NVFP4X2,
                             Datatype.MXBF8):
            from .. import quant as q_
            f = {Datatype.MXFP4X2: q_.mxfp4_quantize_blocks,
                 Datatype.NVFP4X2: q_.nvfp4_quantize_blocks,
                 Datatype.MXBF8: q_.mxbf8_quantize_blocks}[desc.out_type]
            return f(x.astype(jnp.float32))
        scale = args[0] if args else state.get("scale", 1.0)
        odt = to_jnp(desc.out_type if desc.out_type != Datatype.IMPLICIT
                     else Datatype.I8)
        return quant(x, scale, odt,
                     stochastic=bool(desc.flags & UnaryFlags.STOCHASTIC_ROUND),
                     seed=state.get("seed", 0),
                     sign_sat=bool(desc.flags & UnaryFlags.SIGN_SAT_QUANT),
                     skip_scf=bool(desc.flags & UnaryFlags.NO_SCF_QUANT))
    if op == UnaryType.DEQUANT:
        if desc.in_type in (Datatype.MXFP4X2, Datatype.NVFP4X2,
                            Datatype.MXBF8):
            from .. import quant as q_
            f = {Datatype.MXFP4X2: q_.mxfp4_dequantize_blocks,
                 Datatype.NVFP4X2: q_.nvfp4_dequantize_blocks,
                 Datatype.MXBF8: q_.mxbf8_dequantize_blocks}[desc.in_type]
            (scales,) = args
            return f(x, scales)
        scale = args[0] if args else state.get("scale", 1.0)
        if desc.flags & UnaryFlags.NO_SCF_QUANT:
            scale = 1.0
        odt = to_jnp(desc.out_type if desc.out_type != Datatype.IMPLICIT
                     else Datatype.F32)
        return dequant(x, scale, odt)
    raise NotImplementedError(f"stateful unary {op}")
