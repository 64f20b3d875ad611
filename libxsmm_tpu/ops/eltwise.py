"""Element-wise TPPs: unary / binary / ternary kernels.

Covers the reference's meltw generator family
(/root/reference/src/generator_mateltwise*.c, op enums
include/libxsmm_typedefs.h:278-453): activations (+their gradients),
reductions, layout transforms (transpose / VNNI pack-unpack / pad),
gather/scatter, dropout, quant/dequant, zip/unzip, decompress.

TPU-native policy (SURVEY.md §7.1):
  * Memory-bound element-wise math is jnp under jit — XLA fuses it; writing
    Pallas for a relu would only hide fusion opportunities.
  * Ops with semantics XLA doesn't express directly (stochastic rounding,
    dropout with LIBXSMM-style bitmask output) use Pallas primitives via
    kernels/eltwise_pallas.py.
  * VNNI2/4/8 transforms are real data transforms here (row-interleaved
    layout), bit-exact with the reference's definition, so data prepared for
    CPU kernels round-trips. The GEMM path honors GemmFlags.VNNI_* as
    functional layout contracts (ops/gemm._gemm_core un-interleaves the
    operands); the MXU itself consumes NORM layout either way.

Dispatch mirrors libxsmm_dispatch_meltw_{unary,binary,ternary}
(src/libxsmm_main.c:3449-3533). Invoke is functional: out = kernel(in_...).
Ops needing state (dropout seed, quant scale) take them as explicit
arguments, replacing the reference's op.secondary pointer fields
(include/libxsmm_typedefs.h:658-676).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..descriptor import (BinaryFlags, BinaryType, MeltwDescriptor,
                          TernaryFlags, TernaryType, UnaryFlags, UnaryType)
from ..dtypes import Datatype, to_jnp
from ..registry import Kernel, KernelInfo, get_registry

# ---------------------------------------------------------------------------
# scalar/elementwise math kernels (VPU work; XLA fuses)
# ---------------------------------------------------------------------------


def _gelu(x):
    # erf-based gelu, matching the reference's gelu definition
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2 ** -0.5)))


def _gelu_inv(x):
    # d/dx gelu(x)
    inv_sqrt2 = 2 ** -0.5
    cdf = 0.5 * (1.0 + jax.lax.erf(x * inv_sqrt2))
    pdf = jnp.exp(-0.5 * x * x) * (1.0 / np.sqrt(2.0 * np.pi))
    return cdf + x * pdf


_UNARY_MATH = {
    UnaryType.IDENTITY: lambda x: x,
    UnaryType.XOR: lambda x: jnp.zeros_like(x),
    UnaryType.X2: lambda x: x * x,
    UnaryType.SQRT: jnp.sqrt,
    UnaryType.RELU: lambda x: jnp.maximum(x, 0),
    UnaryType.TANH: jnp.tanh,
    # the *_INV entries here are pure input-derivative functions, exactly
    # like the reference's libxsmm_fp32_unary_compute
    # (generator_mateltwise_reference_impl.c:92-97: tanh_inv(x)=1-tanh^2(x));
    # RELU_INV/LEAKY_RELU_INV/ELU_INV are NOT of this kind — they are
    # gradient kernels taking (grad, saved state) and live in _build_unary
    UnaryType.TANH_INV: lambda x: 1.0 - jnp.tanh(x) ** 2,
    UnaryType.SIGMOID: jax.nn.sigmoid,
    UnaryType.SIGMOID_INV: lambda x: jax.nn.sigmoid(x) * (1 - jax.nn.sigmoid(x)),
    UnaryType.GELU: _gelu,
    UnaryType.GELU_INV: _gelu_inv,
    UnaryType.NEGATE: lambda x: -x,
    UnaryType.INC: lambda x: x + 1,
    UnaryType.RECIPROCAL: lambda x: 1.0 / x,
    UnaryType.RECIPROCAL_SQRT: jax.lax.rsqrt,
    UnaryType.EXP: jnp.exp,
    UnaryType.LEAKY_RELU: lambda x, alpha=0.01: jnp.where(x > 0, x, alpha * x),
    UnaryType.ELU: lambda x, alpha=1.0: jnp.where(x > 0, x, alpha * jnp.expm1(x)),
}

# ---------------------------------------------------------------------------
# packed bitmask layout (reference BITMASK_2BYTEMULT data contract)
# ---------------------------------------------------------------------------

# Reference relu/dropout masks are packed BIT arrays: bit for element (i,j)
# lives at byte[j//8 + i*(ld_bits//8)], bit position j%8, where the row
# stride ld_bits = UPDIV(n,16)*16 under LIBXSMM_MELTW_FLAG_UNARY_BITMASK_
# 2BYTEMULT, else n (generator_mateltwise_reference_impl.c:151-175 set/
# extract_bit, :2140-2166 mask_ld; reference is column-major M×N with the
# bits along contiguous M — this row-major library packs along contiguous n,
# which is the identical memory layout). CPU-prepared mask buffers
# round-trip bit-exactly.


def bitmask_ld(n: int, two_byte_mult: bool = True) -> int:
    """Mask row stride in BITS (reference mask_ld,
    generator_mateltwise_reference_impl.c:2142,2173)."""
    if two_byte_mult:
        return ((n + 15) // 16) * 16
    if n % 8:
        raise ValueError(f"bitmask without BITMASK_2BYTEMULT needs the row "
                         f"width to be a byte multiple (n={n}); the "
                         f"reference's byte addressing assumes ld%8==0")
    return n


def pack_bitmask(mask, two_byte_mult: bool = True):
    """(m, n) boolean -> (m, bitmask_ld(n)//8) uint8, reference bit layout."""
    m, n = mask.shape
    ld = bitmask_ld(n, two_byte_mult)
    mb = jnp.pad(mask.astype(jnp.uint8), ((0, 0), (0, ld - n)))
    w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint32)
    packed = (mb.reshape(m, ld // 8, 8).astype(jnp.uint32) * w).sum(axis=-1)
    return packed.astype(jnp.uint8)


def unpack_bitmask(packed, m: int, n: int):
    """(m, nbytes) uint8 -> (m, n) bool; stride inferred from the packed
    width (accepts both the 2BYTEMULT-padded and tight layouts)."""
    nbytes = packed.shape[-1]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed.reshape(m, nbytes, 1) >> shifts) & jnp.uint8(1)
    return bits.reshape(m, nbytes * 8)[:, :n] != 0

def _trunc_f32_to_bf16_f32(x):
    """f32 value truncated to a bf16-representable value, kept in f32 —
    computed via integer bit ops so XLA cannot demote dependent f32
    arithmetic to bf16."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


_REDUCE_OPS = {
    UnaryType.REDUCE_X_OP_ADD: ("add", False),
    UnaryType.REDUCE_X2_OP_ADD: ("add", True),
    UnaryType.REDUCE_X_X2_OP_ADD: ("add_both", None),
    UnaryType.REDUCE_X_OP_MAX: ("max", False),
    UnaryType.REDUCE_X_OP_MIN: ("min", False),
    UnaryType.REDUCE_X_OP_MUL: ("mul", False),
    UnaryType.REDUCE_X_OP_ABSMAX: ("absmax", False),
}


def _apply_reduce(op: str, x, axis: int, keepdims=True):
    if op == "add":
        return jnp.sum(x, axis=axis, keepdims=keepdims)
    if op == "max":
        return jnp.max(x, axis=axis, keepdims=keepdims)
    if op == "min":
        return jnp.min(x, axis=axis, keepdims=keepdims)
    if op == "mul":
        return jnp.prod(x, axis=axis, keepdims=keepdims)
    if op == "absmax":
        return jnp.max(jnp.abs(x), axis=axis, keepdims=keepdims)
    raise ValueError(op)


# ---------------------------------------------------------------------------
# VNNI layout transforms — row-major reading of the reference layouts:
# NORM (m,n) row-major here; VNNIk interleaves k consecutive rows so that
# element (i, j) of NORM lives at vnni[i//k, j, i%k] — the layout AMX/SVE
# consume (generator_mateltwise_transform_*.c). We keep them bit-exact as
# data transforms for round-trip compatibility.
# ---------------------------------------------------------------------------


def _norm_to_vnni(x, k: int, pad: bool):
    m, n = x.shape
    if m % k:
        if not pad:
            raise ValueError(f"NORM_TO_VNNI{k} needs m % {k} == 0 (m={m})")
        x = jnp.pad(x, ((0, k - m % k), (0, 0)))
        m = x.shape[0]
    return x.reshape(m // k, k, n).transpose(0, 2, 1).reshape(m // k, n * k)


def _vnni_to_norm(x, k: int, m: int, n: int):
    mk = x.shape[0]
    return (x.reshape(mk, n, k).transpose(0, 2, 1).reshape(mk * k, n))[:m]


def _pad_mod(x, mod: int, pad_m: bool, pad_n: bool):
    m, n = x.shape
    pm = (mod - m % mod) % mod if pad_m else 0
    pn = (mod - n % mod) % mod if pad_n else 0
    return jnp.pad(x, ((0, pm), (0, pn)))


# ---------------------------------------------------------------------------
# generic broadcast handling (reference BCAST_* flags)
# ---------------------------------------------------------------------------


def _bcast_unary(x, flags: UnaryFlags, m: int, n: int):
    if flags & UnaryFlags.BCAST_SCALAR:
        return jnp.broadcast_to(jnp.reshape(x, (1, 1)), (m, n))
    if flags & UnaryFlags.BCAST_ROW:
        return jnp.broadcast_to(jnp.reshape(x, (m, 1)), (m, n))
    if flags & UnaryFlags.BCAST_COL:
        return jnp.broadcast_to(jnp.reshape(x, (1, n)), (m, n))
    return x


def _bcast_in(x, m, n, row, col, scalar):
    if scalar:
        return jnp.broadcast_to(jnp.reshape(x, (1, 1)), (m, n))
    if row:
        return jnp.broadcast_to(jnp.reshape(x, (m, 1)), (m, n))
    if col:
        return jnp.broadcast_to(jnp.reshape(x, (1, n)), (m, n))
    return x


# ---------------------------------------------------------------------------
# op application helpers (also used by BRGEMM-ext epilogues and meqn)
# ---------------------------------------------------------------------------


def apply_unary_op(op: UnaryType, flags: UnaryFlags, x, **state):
    """Apply a unary TPP to an array (traced context OK). `alpha` in state
    feeds LEAKY_RELU/ELU (the reference's runtime op.primary param)."""
    if op in _UNARY_MATH:
        f32 = x.astype(jnp.float32) if x.dtype in (jnp.bfloat16, jnp.float16) else x
        if op in (UnaryType.LEAKY_RELU, UnaryType.ELU) and "alpha" in state:
            y = _UNARY_MATH[op](f32, state["alpha"])
        else:
            y = _UNARY_MATH[op](f32)
        return y.astype(x.dtype)
    if op in _REDUCE_OPS:
        kind, squared = _REDUCE_OPS[op]
        axis = 1 if flags & UnaryFlags.REDUCE_ROWS else 0
        if kind == "add_both":
            return (jnp.sum(x, axis=axis, keepdims=True),
                    jnp.sum(x * x, axis=axis, keepdims=True))
        src = x * x if squared else x
        red = _apply_reduce(kind, src, axis)
        if flags & UnaryFlags.REDUCE_RECORD_ARGOP and kind in ("max", "min"):
            arg = (jnp.argmax if kind == "max" else jnp.argmin)(
                src, axis=axis, keepdims=True)
            return red, arg.astype(jnp.int32)
        return red
    if op == UnaryType.REDUCE_TO_SCALAR_OP_ADD:
        return jnp.sum(x).reshape(1, 1)
    if op == UnaryType.TRANSFORM_NORM_TO_NORMT:
        return x.T
    raise NotImplementedError(f"apply_unary_op: {op}")


def apply_matmul_node(op, a, b, a_dtype: Datatype, comp=jnp.float32):
    """MATMUL/BRGEMM binary/ternary ops incl. _A_TRANS/_B_TRANS/_A_VNNI
    variants (reference enum include/libxsmm_typedefs.h:378-397,426-443),
    shared by dispatch_meltw_binary/ternary and the equation evaluator.
    Transposes act on the trailing 2 dims so BRGEMM batch dims are
    preserved; A_VNNI un-interleaves the stored layout first."""
    if "A_VNNI" in op.name:
        # ONE dtype->factor rule for the whole library (gemm.vnni_factor:
        # 32-bit types are factor 1 == layout no-op; a divergent local
        # copy here interleaved f32 with factor 2)
        from .gemm import _undo_vnni
        a = _undo_vnni(a, a_dtype)
    # reference name order: A_VNNI_TRANS == trans(unvnni(A))
    if "A_TRANS" in op.name or "A_VNNI_TRANS" in op.name:
        a = jnp.swapaxes(a, -1, -2)
    if "B_TRANS" in op.name:
        b = jnp.swapaxes(b, -1, -2)
    if op.name.startswith("BRGEMM"):
        return jnp.einsum("bmk,bkn->mn", a, b,
                          preferred_element_type=comp,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(a, b, preferred_element_type=comp,
                   precision=jax.lax.Precision.HIGHEST)


def apply_binary_op(op: BinaryType, flags: BinaryFlags, a, b, c_prev=None):
    if op == BinaryType.ADD:
        return a + b
    if op == BinaryType.MUL:
        return a * b
    if op == BinaryType.SUB:
        return a - b
    if op == BinaryType.DIV:
        return a / b
    if op == BinaryType.MAX:
        return jnp.maximum(a, b)
    if op == BinaryType.MIN:
        return jnp.minimum(a, b)
    if op == BinaryType.MULADD:
        if c_prev is None:
            raise ValueError("MULADD reads the previous output")
        return c_prev + a * b
    if op == BinaryType.MUL_AND_REDUCE_TO_SCALAR_OP_ADD:
        return jnp.sum(a * b).reshape(1, 1)
    if op in (BinaryType.CMP_OP_GT, BinaryType.CMP_OP_GE, BinaryType.CMP_OP_LT,
              BinaryType.CMP_OP_LE, BinaryType.CMP_OP_EQ, BinaryType.CMP_OP_NE):
        cmp = {BinaryType.CMP_OP_GT: jnp.greater,
               BinaryType.CMP_OP_GE: jnp.greater_equal,
               BinaryType.CMP_OP_LT: jnp.less,
               BinaryType.CMP_OP_LE: jnp.less_equal,
               BinaryType.CMP_OP_EQ: jnp.equal,
               BinaryType.CMP_OP_NE: jnp.not_equal}[op]
        return cmp(a, b)
    if op == BinaryType.MATMUL:
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    raise NotImplementedError(f"apply_binary_op: {op}")


def apply_ternary_op(op: TernaryType, flags: TernaryFlags, a, b, c):
    if op == TernaryType.MULADD:
        return a * b + c
    if op == TernaryType.NMULADD:
        return -(a * b) + c
    if op == TernaryType.SELECT:
        # reference: bit CLEAR selects in0, bit SET selects in1
        # (generator_mateltwise_reference_impl.c:2629 `(bit_val == 0) ?
        # in_val : in1_val`) — c here is the value-level (unpacked) mask
        return jnp.where(c != 0, b, a)
    if op == TernaryType.MATMUL:
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) + c
    raise NotImplementedError(f"apply_ternary_op: {op}")


# ---------------------------------------------------------------------------
# dispatchers
# ---------------------------------------------------------------------------


def _out_cast(y, out_type: Datatype, in_dtype):
    if out_type == Datatype.IMPLICIT:
        return y.astype(in_dtype)
    return y.astype(to_jnp(out_type))


def _build_unary(desc: MeltwDescriptor) -> Kernel:
    op: UnaryType = desc.op_type
    flags = UnaryFlags(desc.flags)
    m, n = desc.m, desc.n
    comp = to_jnp(desc.comp_type)

    def base(x, *args, **state):
        xb = _bcast_unary(x, flags, m, n)
        two_byte = bool(flags & UnaryFlags.BITMASK_2BYTEMULT)

        # activation forwards with runtime alpha + optional packed bitmask
        # side output (generator_mateltwise_reference_impl.c:2140-2166:
        # alpha = *(float*)param->op.primary, mask bit = in > 0)
        if op in (UnaryType.RELU, UnaryType.LEAKY_RELU, UnaryType.ELU):
            alpha = state.get(
                "alpha", args[0] if args
                else (0.01 if op == UnaryType.LEAKY_RELU else 1.0))
            y = apply_unary_op(op, flags, xb.astype(comp), alpha=alpha)
            out = _out_cast(y, desc.out_type, x.dtype)
            if two_byte:
                return out, pack_bitmask(xb > 0, two_byte_mult=True)
            return out

        # gradient kernels: kernel(grad, saved_state[, alpha])
        # (generator_mateltwise_reference_impl.c:2168-2195)
        if op in (UnaryType.RELU_INV, UnaryType.LEAKY_RELU_INV):
            # saved forward bitmask from param->in.secondary; grad passes
            # where the bit is set, else 0 (relu) / alpha*grad (leaky)
            if not args:
                raise ValueError(f"{op.name} needs the saved relu bitmask: "
                                 "kernel(grad, mask[, alpha])")
            mask = args[0]
            bits = unpack_bitmask(mask, m, n)
            g = xb.astype(comp)
            if op == UnaryType.RELU_INV:
                y = jnp.where(bits, g, jnp.zeros_like(g))
            else:
                alpha = state.get("alpha",
                                  args[1] if len(args) > 1 else 0.01)
                y = jnp.where(bits, g, alpha * g)
            return _out_cast(y, desc.out_type, x.dtype)
        if op == UnaryType.ELU_INV:
            # saved forward OUTPUT from param->in.secondary:
            # out = out_fwd > 0 ? grad : grad * (out_fwd + alpha)
            if not args:
                raise ValueError("ELU_INV needs the saved forward output: "
                                 "kernel(grad, out_fwd[, alpha])")
            out_fwd = args[0].astype(comp)
            alpha = state.get("alpha", args[1] if len(args) > 1 else 1.0)
            g = xb.astype(comp)
            y = jnp.where(out_fwd > 0, g, g * (out_fwd + alpha))
            return _out_cast(y, desc.out_type, x.dtype)

        if op in _UNARY_MATH or op in _REDUCE_OPS or op in (
                UnaryType.REDUCE_TO_SCALAR_OP_ADD,):
            y = apply_unary_op(op, flags, xb.astype(comp))
            if (op in _REDUCE_OPS and flags & UnaryFlags.REDUCE_INIT_ACC
                    and args):
                # accumulate into the caller's running accumulator
                # (REDUCE_INIT_ACC: kernel(x, acc) -> acc + reduce(x)).
                # The reference consults the flag only for the ADD reduces
                # (reference_impl.c:1168-1181 reduce_op==0 branch; the
                # max/min branches never read reduce_on_output); X_X2
                # takes one accumulator per output.
                if _REDUCE_OPS[op][0] not in ("add", "add_both"):
                    raise ValueError(f"REDUCE_INIT_ACC is defined for the "
                                     f"ADD reduces only, not {op.name}")
                if isinstance(y, tuple):
                    if len(args) < len(y):
                        raise ValueError(
                            f"{op.name} with REDUCE_INIT_ACC needs one "
                            f"accumulator per output: kernel(x, acc_x, "
                            f"acc_x2)")
                    y = tuple(t + a.astype(comp) for t, a in zip(y, args))
                else:
                    y = y + args[0].astype(comp)
            if isinstance(y, tuple):
                # argop index outputs stay integer (the reference records
                # them into u32/u64 buffers, never through the out dtype)
                return tuple(t if jnp.issubdtype(t.dtype, jnp.integer)
                             else _out_cast(t, desc.out_type, x.dtype)
                             for t in y)
            return _out_cast(y, desc.out_type, x.dtype)

        if op == UnaryType.REDUCE_X_OP_ADD_NCNC_FORMAT:
            # Blocked NCNC layout reduce-over-N (reference impl
            # generator_mateltwise_reference_impl.c:2118-2137: bc=desc.m,
            # bn=desc.n, C=ldi, N=ldo; offset = iN*C*bn + iC*bn*bc + in*bc+ic).
            # Here desc.extra = (C, N); blocks (bc, bn) = (desc.m, desc.n).
            bc, bn = m, n
            C, N = desc.extra
            blk = x.reshape(N // bn, C // bc, bn, bc).astype(comp)
            red = jnp.sum(blk, axis=(0, 2))          # (C//bc, bc)
            return _out_cast(red.reshape(1, C), desc.out_type, x.dtype)

        # transforms -------------------------------------------------------
        if op == UnaryType.TRANSFORM_NORM_TO_NORMT:
            return _out_cast(xb.T, desc.out_type, x.dtype)
        for k in (2, 4, 8):
            if op == getattr(UnaryType, f"TRANSFORM_NORM_TO_VNNI{k}"):
                return _out_cast(_norm_to_vnni(xb, k, pad=False),
                                 desc.out_type, x.dtype)
            if op == getattr(UnaryType, f"TRANSFORM_NORM_TO_VNNI{k}_PAD"):
                return _out_cast(_norm_to_vnni(xb, k, pad=True),
                                 desc.out_type, x.dtype)
            if op == getattr(UnaryType, f"TRANSFORM_NORM_TO_VNNI{k}T"):
                return _out_cast(_norm_to_vnni(xb.T, k, pad=True),
                                 desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI4_TO_NORM:
            return _out_cast(_vnni_to_norm(xb, 4, m, n), desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI8_TO_NORM:
            return _out_cast(_vnni_to_norm(xb, 8, m, n), desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI2_TO_VNNI2T:
            norm = _vnni_to_norm(xb, 2, m, n)
            return _out_cast(_norm_to_vnni(norm.T, 2, pad=True),
                             desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI4_TO_VNNI4T:
            norm = _vnni_to_norm(xb, 4, m, n)
            return _out_cast(_norm_to_vnni(norm.T, 4, pad=True),
                             desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI8_TO_VNNI8T:
            norm = _vnni_to_norm(xb, 8, m, n)
            return _out_cast(_norm_to_vnni(norm.T, 8, pad=True),
                             desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI4T_TO_NORM:
            normt = _vnni_to_norm(xb, 4, n, m)
            return _out_cast(normt.T, desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI2T_TO_NORM:
            normt = _vnni_to_norm(xb, 2, n, m)
            return _out_cast(normt.T, desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI8T_TO_NORM:
            normt = _vnni_to_norm(xb, 8, n, m)
            return _out_cast(normt.T, desc.out_type, x.dtype)
        if op == UnaryType.TRANSFORM_VNNI4_TO_VNNI2:
            norm = _vnni_to_norm(xb, 4, m, n)
            return _out_cast(_norm_to_vnni(norm, 2, pad=False),
                             desc.out_type, x.dtype)
        if op in (UnaryType.TRANSFORM_PADM_MOD2, UnaryType.TRANSFORM_PADN_MOD2,
                  UnaryType.TRANSFORM_PADNM_MOD2, UnaryType.TRANSFORM_PADM_MOD4,
                  UnaryType.TRANSFORM_PADN_MOD4, UnaryType.TRANSFORM_PADNM_MOD4):
            mod = 2 if "MOD2" in op.name else 4
            pad_m = "PADM" in op.name or "PADNM" in op.name
            pad_n = "PADN" in op.name
            return _out_cast(_pad_mod(xb, mod, pad_m, pad_n),
                             desc.out_type, x.dtype)

        # pack/unpack ------------------------------------------------------
        if op == UnaryType.UNZIP:
            # split f32 into (low16, high16) bf16-sized halves
            bits = jax.lax.bitcast_convert_type(xb.astype(jnp.float32),
                                                jnp.uint32)
            lo = (bits & 0xFFFF).astype(jnp.uint16)
            hi = (bits >> 16).astype(jnp.uint16)
            return lo, hi
        if op == UnaryType.REPLICATE_COL_VAR:
            ncols = state.get("ncols", n)
            return jnp.broadcast_to(jnp.reshape(x, (m, 1)), (m, ncols))
        if op == UnaryType.GATHER:
            (idx,) = args
            if flags & UnaryFlags.GS_COLS:
                return jnp.take(xb, idx, axis=1)
            return jnp.take(xb, idx, axis=0)
        if op == UnaryType.SCATTER:
            (idx, out0) = args
            if flags & UnaryFlags.GS_COLS:
                return out0.at[:, idx].set(xb)
            return out0.at[idx, :].set(xb)
        if op in (UnaryType.REDUCE_COLS_IDX_OP_ADD,
                  UnaryType.REDUCE_COLS_IDX_OP_MAX,
                  UnaryType.REDUCE_COLS_IDX_OP_MIN):
            (idx,) = args
            rows = jnp.take(xb, idx, axis=0).astype(comp)
            red = {UnaryType.REDUCE_COLS_IDX_OP_ADD: jnp.sum,
                   UnaryType.REDUCE_COLS_IDX_OP_MAX: jnp.max,
                   UnaryType.REDUCE_COLS_IDX_OP_MIN: jnp.min}[op]
            return _out_cast(red(rows, axis=0, keepdims=True),
                             desc.out_type, x.dtype)
        if op in (UnaryType.DROPOUT, UnaryType.DROPOUT_INV,
                  UnaryType.STOCHASTIC_ROUND, UnaryType.QUANT,
                  UnaryType.DEQUANT):
            from ..kernels import eltwise_pallas
            return eltwise_pallas.run_stateful_unary(desc, x, *args, **state)
        if op.name.startswith("DECOMPRESS_SPARSE_FACTOR"):
            factor = int(op.name.rsplit("_", 1)[1])
            (mask,) = args
            return _decompress_sparse(xb, mask, factor, m, n, x.dtype)
        if op == UnaryType.DECOMP_FP32_TO_BF16X2:
            # split f32 into (hi, lo) bf16 with x ~= hi + lo (splitSGD).
            # hi is derived by TRUNCATING x's own bits: computing
            # x - bf16(x).astype(f32) is elided to bf16 by XLA on TPU
            # (the convert is folded into the sub), losing the residual.
            hf = _trunc_f32_to_bf16_f32(xb)
            return hf.astype(jnp.bfloat16), (xb - hf).astype(jnp.bfloat16)
        if op == UnaryType.DECOMP_FP32_TO_BF16X3:
            h1f = _trunc_f32_to_bf16_f32(xb)
            r1 = xb - h1f
            h2f = _trunc_f32_to_bf16_f32(r1)
            h3 = (r1 - h2f).astype(jnp.bfloat16)
            return h1f.astype(jnp.bfloat16), h2f.astype(jnp.bfloat16), h3
        raise NotImplementedError(f"unary op {op}")

    if op == UnaryType.DUMP:
        # host-side print, NOT jitted: the axon backend has no host
        # send/recv callbacks (jax.debug.print is UNIMPLEMENTED on TPU
        # there), and the reference's DUMP writes from the host anyway
        # (LIBXSMM_DUMP, src/libxsmm_main.c internal_dump :699)
        def dump_fn(x, *args, **state):
            import numpy as _np
            print(f"xsmm dump {desc.name()}:\n{_np.asarray(x)}")
            return x

        info = KernelInfo(kind="meltw", nflops=0)
        return Kernel(fn=dump_fn, descriptor=desc, info=info,
                      name=desc.name())

    # ncols is a SHAPE (REPLICATE_COL_VAR's variable column count,
    # param->op.secondary in the reference) — static under jit so each
    # distinct ncols compiles its own executable instead of crashing
    # on a traced dimension
    jitted = jax.jit(base, static_argnames=("ncols",))
    info = KernelInfo(kind="meltw", nflops=m * n)
    return Kernel(fn=jitted, descriptor=desc, info=info, name=desc.name())


def _decompress_sparse(values, bitmask, factor, m, n, dtype):
    """DECOMPRESS_SPARSE_FACTOR_k: expand a compressed nonzero stream into a
    dense (m,n) using a bitmask; TPU-native via cumsum-gather instead of the
    reference's expand instructions."""
    mask = bitmask.reshape(-1).astype(jnp.int32)
    pos = jnp.cumsum(mask) - 1
    flat_vals = values.reshape(-1)
    gathered = jnp.take(flat_vals, jnp.clip(pos, 0, flat_vals.size - 1))
    dense = jnp.where(mask > 0, gathered, 0)
    return dense.reshape(m, n).astype(dtype)



def _matmul_nflops_wrapper(jitted, info, m, n):
    """Refine KernelInfo.nflops for contraction-typed meltw kernels from
    the runtime operand shapes (the descriptor has no k/br): 2*m*n*k, and
    a stacked (br, ., .) BRGEMM operand multiplies by br. Re-checked per
    call — the registry caches the Kernel across differently-shaped uses."""
    last = []

    def fn(in0, *rest):
        shp = tuple(np.shape(in0))
        if last[:1] != [shp]:
            k = shp[-1]
            br = shp[0] if len(shp) == 3 else 1
            info.nflops = 2 * m * n * max(1, k) * max(1, br)
            last[:] = [shp]
        return jitted(in0, *rest)

    return fn


def _build_binary(desc: MeltwDescriptor) -> Kernel:
    op: BinaryType = desc.op_type
    flags = BinaryFlags(desc.flags)
    m, n = desc.m, desc.n
    comp = to_jnp(desc.comp_type)

    def base(in0, in1, c_prev=None):
        if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
            # contraction ops take natural (not broadcast) operand shapes
            y = apply_matmul_node(op, in0.astype(comp), in1.astype(comp),
                                  desc.in_type, comp)
            return _out_cast(y, desc.out_type, in0.dtype)
        a = _bcast_in(in0, m, n, flags & BinaryFlags.BCAST_ROW_IN_0,
                      flags & BinaryFlags.BCAST_COL_IN_0,
                      flags & BinaryFlags.BCAST_SCALAR_IN_0)
        b = _bcast_in(in1, m, n, flags & BinaryFlags.BCAST_ROW_IN_1,
                      flags & BinaryFlags.BCAST_COL_IN_1,
                      flags & BinaryFlags.BCAST_SCALAR_IN_1)
        if op == BinaryType.ZIP:
            # merge lo/hi 16-bit halves back into f32. The halves arrive
            # either as u16 bit buffers (this library's UNZIP output) or
            # as bf16/f16-typed views (the reference ABI declares the hi
            # half bf16, reference_impl.c:2550) — 16-bit FLOAT operands
            # must be BIT-reinterpreted, not value-converted.
            def _bits16(v):
                if v.dtype in (jnp.bfloat16, jnp.float16):
                    v = jax.lax.bitcast_convert_type(v, jnp.uint16)
                return v.astype(jnp.uint32)
            lo = _bits16(a)
            hi = _bits16(b)
            return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)
        if op == BinaryType.PACK:
            return jnp.stack([a, b], axis=-1).reshape(m, 2 * n)
        y = apply_binary_op(op, flags, a.astype(comp), b.astype(comp),
                            None if c_prev is None else c_prev.astype(comp))
        if op.name.startswith("CMP_OP_"):
            # the reference stores CMP results as a PACKED bitmask with
            # ld = UPDIV(ldo,16)*16 (reference_impl.c:2575-2581) — the
            # same layout pack_bitmask/unpack_bitmask round-trip
            return pack_bitmask(y)
        return _out_cast(y, desc.out_type, in0.dtype)

    jitted = jax.jit(base)
    info = KernelInfo(kind="meltw", nflops=m * n)
    fn = jitted
    if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
        fn = _matmul_nflops_wrapper(jitted, info, m, n)
    return Kernel(fn=fn, descriptor=desc, info=info, name=desc.name())


def _build_ternary(desc: MeltwDescriptor) -> Kernel:
    op: TernaryType = desc.op_type
    flags = TernaryFlags(desc.flags)
    m, n = desc.m, desc.n
    comp = to_jnp(desc.comp_type)

    def base(in0, in1, in2):
        if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
            y = (apply_matmul_node(op, in0.astype(comp), in1.astype(comp),
                                   desc.in_type, comp)
                 + in2.astype(comp))
            return _out_cast(y, desc.out_type, in0.dtype)
        a = _bcast_in(in0, m, n, flags & TernaryFlags.BCAST_ROW_IN_0,
                      flags & TernaryFlags.BCAST_COL_IN_0,
                      flags & TernaryFlags.BCAST_SCALAR_IN_0)
        b = _bcast_in(in1, m, n, flags & TernaryFlags.BCAST_ROW_IN_1,
                      flags & TernaryFlags.BCAST_COL_IN_1,
                      flags & TernaryFlags.BCAST_SCALAR_IN_1)
        if op == TernaryType.SELECT:
            # in2 is a PACKED 2BYTEMULT bitmask (reference extract_bit
            # with ld=UPDIV(ldi2,16)*16): bit CLEAR -> in0, SET -> in1
            mask = unpack_bitmask(in2, m, n)
            y = jnp.where(mask, b.astype(comp), a.astype(comp))
        else:
            c = _bcast_in(in2, m, n, flags & TernaryFlags.BCAST_ROW_IN_2,
                          flags & TernaryFlags.BCAST_COL_IN_2,
                          flags & TernaryFlags.BCAST_SCALAR_IN_2)
            y = apply_ternary_op(op, flags, a.astype(comp), b.astype(comp),
                                 c.astype(comp))
        return _out_cast(y, desc.out_type, in0.dtype)

    jitted = jax.jit(base)
    info = KernelInfo(kind="meltw", nflops=2 * m * n)
    fn = jitted
    if op.name.startswith("MATMUL") or op.name.startswith("BRGEMM"):
        fn = _matmul_nflops_wrapper(jitted, info, m, n)
    return Kernel(fn=fn, descriptor=desc, info=info, name=desc.name())


def dispatch_meltw_unary(op_type: UnaryType, m=None, n: int = None,
                         flags: UnaryFlags = UnaryFlags.NONE,
                         in_type: Datatype = Datatype.F32,
                         out_type: Datatype = Datatype.IMPLICIT,
                         comp_type: Datatype = Datatype.F32,
                         extra=()) -> Kernel:
    """libxsmm_dispatch_meltw_unary analogue (src/libxsmm_main.c:3472).

    Second arg may be a MeltwUnaryShape (the reference signature
    `(unary_type, unary_shape, unary_flags)`) instead of flattened
    m/n/dtypes — in that case pass flags third as in the reference."""
    from ..descriptor import MeltwUnaryShape
    if isinstance(m, MeltwUnaryShape):
        s = m
        if n is not None:        # reference v2 call form: flags ride third
            flags = UnaryFlags(n)
        m, n = s.m, s.n
        in_type, out_type, comp_type = s.in0_type, s.out_type, s.comp_type
    desc = MeltwDescriptor(operation="unary", op_type=op_type,
                           flags=UnaryFlags(flags), m=m, n=n,
                           in_type=in_type, out_type=out_type,
                           comp_type=comp_type, extra=tuple(extra))
    return get_registry().dispatch(desc, _build_unary)


def dispatch_meltw_binary(op_type: BinaryType, m=None, n: int = None,
                          flags: BinaryFlags = BinaryFlags.NONE,
                          in_type: Datatype = Datatype.F32,
                          out_type: Datatype = Datatype.IMPLICIT,
                          comp_type: Datatype = Datatype.F32) -> Kernel:
    """Second arg may be a MeltwBinaryShape (reference v2 signature)."""
    from ..descriptor import MeltwBinaryShape
    in1 = None
    if isinstance(m, MeltwBinaryShape):
        s = m
        if n is not None:        # reference v2 call form: flags ride third
            flags = BinaryFlags(n)
        m, n = s.m, s.n
        in_type, out_type, comp_type = s.in0_type, s.out_type, s.comp_type
        in1 = s.in1_type
    desc = MeltwDescriptor(operation="binary", op_type=op_type,
                           flags=BinaryFlags(flags), m=m, n=n,
                           in_type=in_type, out_type=out_type,
                           comp_type=comp_type, in1_type=in1)
    return get_registry().dispatch(desc, _build_binary)


def dispatch_meltw_ternary(op_type: TernaryType, m=None, n: int = None,
                           flags: TernaryFlags = TernaryFlags.NONE,
                           in_type: Datatype = Datatype.F32,
                           out_type: Datatype = Datatype.IMPLICIT,
                           comp_type: Datatype = Datatype.F32) -> Kernel:
    """Second arg may be a MeltwTernaryShape (reference v2 signature)."""
    from ..descriptor import MeltwTernaryShape
    in1 = in2 = None
    if isinstance(m, MeltwTernaryShape):
        s = m
        if n is not None:        # reference v2 call form: flags ride third
            flags = TernaryFlags(n)
        m, n = s.m, s.n
        in_type, out_type, comp_type = s.in0_type, s.out_type, s.comp_type
        in1, in2 = s.in1_type, s.in2_type
    desc = MeltwDescriptor(operation="ternary", op_type=op_type,
                           flags=TernaryFlags(flags), m=m, n=n,
                           in_type=in_type, out_type=out_type,
                           comp_type=comp_type, in1_type=in1, in2_type=in2)
    return get_registry().dispatch(desc, _build_ternary)
