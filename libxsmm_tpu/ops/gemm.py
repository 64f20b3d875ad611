"""Dense GEMM / BRGEMM dispatch — the core of the library.

Replaces the reference's GEMM dispatch + JIT generator family
(libxsmm_dispatch_gemm /root/reference/src/libxsmm_main.c:3390,
libxsmm_dispatch_brgemm :3409, _brgemm_ext :3428; generators
src/generator_gemm.c:21-1210) with descriptor-keyed builders of jitted XLA /
Pallas callables.

TPU-first design notes (not a translation):
  * A single small GEMM is an XLA `dot_general` — for one m,n,k <= 64 problem
    the MXU is underfilled no matter what; the win comes from batching, which
    is what the batched entry points and BRGEMM provide.
  * BRGEMM (C = sum_i A_i B_i) is algebraically ONE large contraction over
    (br, k) — we lower it as a single dot_general with two contracting dims,
    so the MXU sees an effective K of br*k and runs near roofline. This is
    the key structural difference from the reference, which loops microkernels
    over the batch (generator_gemm_amx.c); on TPU the compiler's single big
    contraction is strictly better.
  * The independent batched case (C_i = A_i B_i, the xgemm/smmbench
    streaming workload) is HBM-bandwidth-bound at small shapes; it routes to
    a Pallas kernel that streams batch tiles through VMEM
    (kernels/gemm_pallas.py) when shapes tile well, else XLA batched dot.
  * alpha=1, beta in {0,1} exactly as the reference restricts
    (README.md "limited to Alpha:=1").

Invoke contract (functional, no aliasing):
    kernel(a, b)          when BETA_0:      returns C = A@B
    kernel(a, b, c)       otherwise:        returns C = A@B + c
  BRGEMM STRIDE:  a:(br,m,k) b:(br,k,n)
  BRGEMM OFFSET/ADDRESS: kernel(a, b, [c,] a_idx, b_idx) — index arrays into
  the stacked leading dim (the TPU-native reading of the reference's
  pointer-array/byte-offset ABIs, include/libxsmm_typedefs.h:709-714).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import device
from ..config import CONFIG
from ..descriptor import (BatchReduceConfig, BatchReduceType, BinaryPostops,
                          BinaryType, GemmDescriptor, GemmExtDescriptor,
                          GemmFlags, GemmShape, UnaryArgops, UnaryType)
from ..dtypes import Datatype, to_jnp
from ..registry import Kernel, KernelInfo, get_registry, memo_dispatch
from .eltwise import apply_binary_op, apply_unary_op


_INT_IN = (Datatype.I8, Datatype.U8, Datatype.I16, Datatype.U16,
           Datatype.I32, Datatype.U32)

# packed GEMM storage dtypes (typedefs.h:218-246 gating,
# generator_gemm.c:41-57, 272-296): MX microscaling floats arrive as
# (payload, scales) pairs; sub-byte ints as packed uint8 payloads
_MX_FLOAT = (Datatype.MXFP4X2, Datatype.NVFP4X2, Datatype.MXBF8,
             Datatype.MXBF6, Datatype.MXHF6)
_INT_SUB = (Datatype.I4X2, Datatype.U4X2, Datatype.I2X4, Datatype.I1X8)


def _comp_dtype(shape: GemmShape):
    if shape.comp_type == Datatype.F64:
        return jnp.float64
    if ((shape.a_in_type in _INT_IN or shape.a_in_type in _INT_SUB)
            and shape.out_type in _INT_IN):
        # integer GEMM accumulates in i32 on the MXU (the reference's
        # i8->i32 contract, generator_gemm.c dtype gating)
        return jnp.int32
    return jnp.float32


def _mx_decode(dt: Datatype, payload, scales):
    """Decode an MX (payload, scales) pair along the LAST axis -> f32."""
    from .. import quant as q_
    if dt == Datatype.MXFP4X2:
        return q_.mxfp4_dequantize_blocks(payload, scales)
    if dt == Datatype.NVFP4X2:
        return q_.nvfp4_dequantize_blocks(payload, scales)
    if dt == Datatype.MXBF8:
        return q_.mxbf8_dequantize_blocks(payload, scales)
    if dt == Datatype.MXBF6:
        return q_.mxfp6_dequantize_blocks(payload, scales, "e3m2")
    if dt == Datatype.MXHF6:
        return q_.mxfp6_dequantize_blocks(payload, scales, "e2m3")
    raise ValueError(dt)


def _validate_packed_combo(shape: GemmShape, flags: GemmFlags) -> None:
    """Dtype gating for MX/sub-byte GEMMs, mirroring the reference's
    generator_gemm.c:272-296 (MX x MX -> F32 comp) and :41-57, 472-488
    (sub-byte A with I8/U8 or F16 B). Transposes are rejected: packed
    payloads are k-contiguous by contract (the reference requires VNNI_A
    for these dtypes for the same reason; the flag is accepted and means
    'packed along k', which is this library's canonical layout)."""
    a, b, o = shape.a_in_type, shape.b_in_type, shape.out_type
    if flags & (GemmFlags.TRANS_A | GemmFlags.TRANS_B):
        raise ValueError("transposes are unsupported for packed MX/sub-byte "
                         "GEMM operands (k-contiguous payload contract)")
    if a in _MX_FLOAT or b in _MX_FLOAT:
        # reference gating is MX x MX (generator_gemm.c:276-296); BF16/F32
        # partners are the TPU-native extension (decode target follows the
        # partner). F16 partners are rejected: MX scales up to 2^127
        # overflow f16 storage.
        if b not in _MX_FLOAT + (Datatype.BF16, Datatype.F32):
            raise ValueError(f"MX GEMM needs an MX, BF16 or F32 B "
                             f"operand (got {b})")
        if a not in _MX_FLOAT + (Datatype.BF16, Datatype.F32):
            raise ValueError(f"MX GEMM needs an MX, BF16 or F32 A "
                             f"operand (got {a})")
        if o not in (Datatype.F32, Datatype.BF16, Datatype.F16):
            raise ValueError(f"MX GEMM output must be F32/BF16/F16 (got {o};"
                             " requantize via UNARY_QUANT if MX storage is"
                             " needed)")
        return
    if a in _INT_SUB:
        if a in (Datatype.I4X2, Datatype.U4X2) and b == Datatype.F16:
            if o not in (Datatype.F16, Datatype.F32):
                raise ValueError("i4 x f16 GEMM outputs F16/F32")
            return
        ok_b = ((Datatype.I8, Datatype.U8) if a != Datatype.I1X8
                else (Datatype.I8,))
        if b not in ok_b:
            raise ValueError(f"{a} GEMM needs B in {ok_b} (got {b}); "
                             "reference gating generator_gemm.c:472-488")
        if o not in (Datatype.I32,):
            raise ValueError(f"{a} x {b} GEMM accumulates to I32 (got {o})")
        return
    raise ValueError(f"unsupported packed combo a={a} b={b}")


def _packed_operand_decoders(shape: GemmShape):
    """Return (decode_a, decode_b) callables (identity for native dtypes).

    Payload layouts (row-major; packing always along k):
      A: payload (..., m, k/pack) [+ scales (..., m, k/32) for MX]
      B: payload (..., k/pack, n) [+ scales (..., k/32, n) for MX]
    MX values decode exactly into bf16 (grid x power-of-two scale carries
    <= 8 significand bits), so the matmul runs at native bf16 MXU speed —
    the TPU-native reading of the reference's dequant-in-microkernel MX
    paths (generator_gemm_reference_impl.c:200-240)."""
    from .. import quant as q_

    # decoded MX values must share the dtype of the (possibly native)
    # partner operand, or dot_general rejects the element-type mismatch:
    # bf16 when the partner is bf16 or itself MX (exact, fast MXU path),
    # f32 when the partner carries f32 data
    a_dt_, b_dt_ = shape.a_in_type, shape.b_in_type
    mx_target = (jnp.float32 if Datatype.F32 in (a_dt_, b_dt_)
                 else jnp.bfloat16)

    def _decode(dt, operand, is_b):
        if dt in _MX_FLOAT:
            payload, scales = operand
            if is_b:
                payload = jnp.swapaxes(payload, -1, -2)
                scales = jnp.swapaxes(scales, -1, -2)
            dec = _mx_decode(dt, payload, scales).astype(mx_target)
            return jnp.swapaxes(dec, -1, -2) if is_b else dec
        if dt in _INT_SUB:
            p = jnp.swapaxes(operand, -1, -2) if is_b else operand
            dec = q_.unpack_subbyte_gemm(dt, p)
            if shape.b_in_type == Datatype.F16:
                dec = dec.astype(jnp.float16)
            return jnp.swapaxes(dec, -1, -2) if is_b else dec
        return operand

    a_dt, b_dt = shape.a_in_type, shape.b_in_type
    decode_a = ((lambda a: _decode(a_dt, a, False))
                if a_dt in _MX_FLOAT + _INT_SUB else (lambda a: a))
    decode_b = ((lambda b: _decode(b_dt, b, True))
                if b_dt in _MX_FLOAT + _INT_SUB else (lambda b: b))
    return decode_a, decode_b


def matmul_precision(shape: GemmShape):
    """MXU pass-precision policy.

    The TPU MXU multiplies in bf16 by default; a numerics library must not
    silently degrade f32 GEMMs, so f32 inputs request HIGHEST (full f32
    emulation via multi-pass). BF32 comp_type (the reference's 19-bit
    tf32-like mode, typedefs.h LIBXSMM_DATATYPE_BF32) maps to HIGH (bf16x3),
    which has the same effective mantissa.
    """
    if shape.comp_type == Datatype.BF32:
        return jax.lax.Precision.HIGH
    f32_in = shape.a_in_type in (Datatype.F32, Datatype.F64)
    return jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT


def pass_precision(dtype):
    """matmul_precision for raw jnp dtypes: the same policy for code that
    works on arrays rather than GemmShapes (models/, parallel/). f32 (or
    wider) operands request HIGHEST; bf16 and narrower run the MXU's
    native bf16 passes."""
    d = jnp.dtype(dtype)
    return (jax.lax.Precision.HIGHEST
            if d in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64))
            else jax.lax.Precision.DEFAULT)


def _maybe_transpose(x, trans: bool):
    return x.T if trans else x


def vnni_factor(dt: Datatype) -> int:
    """Rows interleaved per VNNI group, by element width (the reference's
    layout rule: 2 for 16-bit, 4 for 8-bit, 8 for 4-bit types)."""
    from ..dtypes import bits
    return max(1, 32 // bits(dt))


def _undo_vnni(x, dt: Datatype):
    """Interpret x (leading batch dims allowed) as the VNNI-packed form of a
    NORM (r, c) matrix and return NORM layout (inverse of
    TRANSFORM_NORM_TO_VNNIk: element (i,j) lives at vnni[i//k, j*k+i%k])."""
    f = vnni_factor(dt)
    if f == 1:
        return x
    *lead, rk, ck = x.shape
    y = x.reshape(*lead, rk, ck // f, f)
    y = jnp.swapaxes(y, -1, -2)
    return y.reshape(*lead, rk * f, ck // f)


def _to_vnni(x, dt: Datatype):
    f = vnni_factor(dt)
    if f == 1:
        return x
    *lead, r, c = x.shape
    y = x.reshape(*lead, r // f, f, c)
    y = jnp.swapaxes(y, -1, -2)
    return y.reshape(*lead, r // f, c * f)


def _dot(a, b, comp_dtype, precision):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=comp_dtype, precision=precision)


def _gemm_core(desc: GemmDescriptor, a, b, c=None,
               a_idx=None, b_idx=None):
    """Shared math for gemm/brgemm; operands already in NORM layout."""
    shape = desc.shape
    comp = _comp_dtype(shape)
    prec = matmul_precision(shape)
    br_type = desc.br.br_type

    # VNNI_A/VNNI_B are functional layout contracts (not no-ops): the
    # operand arrives packed as TRANSFORM_NORM_TO_VNNIk produced it, and is
    # unpacked to NORM before the contraction (applied before transposes,
    # matching the reference's "VNNI then trans" ordering). For MX/sub-byte
    # storage the flag means "packed along k" (the reference mandates
    # VNNI_A there) — operands were already decoded to NORM upstream.
    if desc.flags & GemmFlags.VNNI_A and shape.a_in_type not in (
            _MX_FLOAT + _INT_SUB):
        a = _undo_vnni(a, shape.a_in_type)
    if desc.flags & GemmFlags.VNNI_B and shape.b_in_type not in (
            _MX_FLOAT + _INT_SUB):
        b = _undo_vnni(b, shape.b_in_type)

    if br_type == BatchReduceType.NONE:
        am = _maybe_transpose(a, desc.trans_a)
        bm = _maybe_transpose(b, desc.trans_b)
        acc = _dot(am, bm, comp, prec)
    else:
        if br_type == BatchReduceType.ADDRESS or br_type == BatchReduceType.OFFSET:
            # gather the participating slices of the stacked operands
            a = jnp.take(a, a_idx, axis=0)
            b = jnp.take(b, b_idx, axis=0)
        # (br, m, k) x (br, k, n) -> contract over br AND k in one pass:
        # the MXU sees effective K = br*k.
        am = jnp.swapaxes(a, 1, 2) if desc.trans_a else a
        bm = jnp.swapaxes(b, 1, 2) if desc.trans_b else b
        acc = jax.lax.dot_general(
            am, bm,
            dimension_numbers=(((0, 2), (0, 1)), ((), ())),
            preferred_element_type=comp, precision=prec)

    if c is not None:
        acc = acc + c.astype(comp)
    return acc


def _finalize_out(acc, shape: GemmShape, flags: GemmFlags = GemmFlags.NONE):
    out = acc.astype(to_jnp(shape.out_type))
    if flags & GemmFlags.VNNI_C:
        out = _to_vnni(out, shape.out_type)
    return out


def _ensure_x64(shape: GemmShape) -> None:
    # F64 kernels (the spectral-element configs) need JAX's x64 mode; enable
    # it on first F64 dispatch rather than globally at import.
    if Datatype.F64 in (shape.a_in_type, shape.b_in_type, shape.out_type,
                        shape.comp_type):
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)


def _build_gemm(desc: GemmDescriptor) -> Kernel:
    shape = desc.shape
    packed = (shape.a_in_type in _MX_FLOAT + _INT_SUB
              or shape.b_in_type in _MX_FLOAT + _INT_SUB)
    if packed:
        _validate_packed_combo(shape, desc.flags)
        decode_a, decode_b = _packed_operand_decoders(shape)
    else:
        for dt in (shape.a_in_type, shape.b_in_type, shape.out_type):
            to_jnp(dt)  # raises for unsupported storage types
        decode_a = decode_b = lambda x: x
    _ensure_x64(shape)

    beta0 = desc.beta == 0
    br = desc.br.br_type
    needs_idx = br in (BatchReduceType.ADDRESS, BatchReduceType.OFFSET)

    @jax.named_scope(desc.name())
    def run(a, b, c=None, a_idx=None, b_idx=None):
        acc = _gemm_core(desc, decode_a(a), decode_b(b), c, a_idx, b_idx)
        return _finalize_out(acc, shape, desc.flags)

    if beta0:
        if needs_idx:
            def fn(a, b, a_idx, b_idx):
                return run(a, b, None, a_idx, b_idx)
        else:
            def fn(a, b):
                return run(a, b)
    else:
        if needs_idx:
            def fn(a, b, c, a_idx, b_idx):
                return run(a, b, c, a_idx, b_idx)
        else:
            def fn(a, b, c):
                return run(a, b, c)

    jitted = jax.jit(fn)
    nflops = shape.nflops(desc.br.br_count_hint or 1)
    info = KernelInfo(kind="gemm", nflops=nflops, is_reference_kernel=False)
    return Kernel(fn=jitted, descriptor=desc, info=info, name=desc.name())


def dispatch_gemm(shape: GemmShape,
                  flags: GemmFlags = GemmFlags.NONE) -> Kernel:
    """libxsmm_dispatch_gemm analogue (src/libxsmm_main.c:3390).

    Repeat dispatches ride the per-thread memo (registry.memo_dispatch, the
    reference's thread-local cache analogue, src/libxsmm_main.c:292-302)."""
    return memo_dispatch(
        get_registry(), ("gemm", shape, flags),
        lambda: GemmDescriptor(shape=shape, flags=GemmFlags(flags)),
        _build_gemm)


def dispatch_brgemm(shape: GemmShape,
                    flags: GemmFlags = GemmFlags.NONE,
                    br_config: BatchReduceConfig = None) -> Kernel:
    """libxsmm_dispatch_brgemm analogue (src/libxsmm_main.c:3409)."""
    if br_config is None:
        br_config = BatchReduceConfig(br_type=BatchReduceType.STRIDE)
    return memo_dispatch(
        get_registry(), ("brgemm", shape, flags, br_config),
        lambda: GemmDescriptor(shape=shape, flags=GemmFlags(flags),
                               br=br_config),
        _build_gemm)


# ---------------------------------------------------------------------------
# BRGEMM-ext: fused argops/postops epilogues
# ---------------------------------------------------------------------------

def _build_gemm_ext(desc: GemmExtDescriptor) -> Kernel:
    base = desc.base
    shape = base.shape
    _ensure_x64(shape)
    argops, postops = desc.argops, desc.postops
    # MX/sub-byte packed operands arrive as (payload, scales)/nibble pairs:
    # decode them to NORM like _build_gemm does (the same dispatch-time
    # validation + decoders), instead of letting the pair crash deep inside
    # _gemm_core's transposes. a/b argops on packed operands are rejected —
    # a unary on an undecoded payload has no reference meaning.
    packed = (shape.a_in_type in _MX_FLOAT + _INT_SUB
              or shape.b_in_type in _MX_FLOAT + _INT_SUB)
    if packed:
        _validate_packed_combo(shape, base.flags)
        if (argops.ap_type != UnaryType.NONE
                or argops.bp_type != UnaryType.NONE):
            raise ValueError("a/b argops are not supported on MX/sub-byte "
                             "packed operands (decode happens inside the "
                             "kernel; apply eltwise ops to NORM data)")
        decode_a, decode_b = _packed_operand_decoders(shape)
    else:
        decode_a = decode_b = lambda x: x
    beta0 = base.beta == 0
    br = base.br.br_type
    needs_idx = br in (BatchReduceType.ADDRESS, BatchReduceType.OFFSET)

    from ..descriptor import UnaryFlags
    cp_bitmask = bool(argops.cp_flags & UnaryFlags.BITMASK_2BYTEMULT)
    cp_stochastic = argops.cp_type == UnaryType.STOCHASTIC_ROUND

    @jax.named_scope(desc.name())
    def run(a, b, c=None, d=None, a_idx=None, b_idx=None, seed=0):
        extra = {}
        a, b = decode_a(a), decode_b(b)
        if argops.ap_type != UnaryType.NONE:
            a = apply_unary_op(argops.ap_type, argops.ap_flags, a)
            if argops.store_ap:
                extra["ap"] = a
        if argops.bp_type != UnaryType.NONE:
            b = apply_unary_op(argops.bp_type, argops.bp_flags, b)
            if argops.store_bp:
                extra["bp"] = b
        acc = _gemm_core(base, a, b, c, a_idx, b_idx)
        if argops.store_cp:
            extra["cp"] = _finalize_out(acc, shape, base.flags)
        if postops.d_type.name != "NONE":
            if d is None:
                raise ValueError("postop configured but no d operand passed")
            acc = apply_binary_op(postops.d_type, postops.d_flags,
                                  acc, d.astype(acc.dtype))
        if cp_stochastic:
            # fused stochastic-round store (reference: SR bf8/bf16 stores
            # in the gemm_ext epilogue, meltw STOCHASTIC_ROUND flag)
            from ..kernels.eltwise_pallas import stochastic_round
            out = stochastic_round(acc, seed, shape.out_type)
            if base.flags & GemmFlags.VNNI_C:
                out = _to_vnni(out, shape.out_type)
            if extra:
                return out, extra
            return out
        if argops.cp_type != UnaryType.NONE:
            if argops.cp_type == UnaryType.RELU and cp_bitmask:
                # relu with bitmask output: the mask is an extra result in
                # the reference's PACKED bit layout (UPDIV(ld,16)*16-bit
                # row stride), consumable by RELU_INV
                from .eltwise import pack_bitmask
                extra["cp_bitmask"] = pack_bitmask(acc > 0)
            acc = apply_unary_op(argops.cp_type, argops.cp_flags, acc)
        out = _finalize_out(acc, shape, base.flags)
        if extra:
            return out, extra
        return out

    has_d = postops.d_type.name != "NONE"

    def fn(a, b, *rest, seed=0):
        i = 0
        c = None
        d = None
        a_idx = b_idx = None
        if not beta0:
            c = rest[i]; i += 1
        if has_d:
            d = rest[i]; i += 1
        if needs_idx:
            a_idx = rest[i]; b_idx = rest[i + 1]; i += 2
        return run(a, b, c, d, a_idx, b_idx, seed)

    jitted = jax.jit(fn)
    nflops = shape.nflops(base.br.br_count_hint or 1)
    info = KernelInfo(kind="gemm_ext", nflops=nflops)
    return Kernel(fn=jitted, descriptor=desc, info=info, name=desc.name())


def dispatch_brgemm_ext(shape: GemmShape,
                        flags: GemmFlags = GemmFlags.NONE,
                        br_config: BatchReduceConfig = None,
                        argops: UnaryArgops = UnaryArgops(),
                        postops: BinaryPostops = BinaryPostops()) -> Kernel:
    """libxsmm_dispatch_brgemm_ext analogue (src/libxsmm_main.c:3428).

    The fused-epilogue factory: argops/postops compile into the same jitted
    computation, which XLA fuses into the matmul's epilogue — the TPU-native
    reading of the BRGEMM-ext fused eltwise JIT
    (generator_gemm_amx_microkernel.c fused paths).
    """
    if br_config is None:
        br_config = BatchReduceConfig(br_type=BatchReduceType.STRIDE)
    desc = GemmExtDescriptor(
        base=GemmDescriptor(shape=shape, flags=GemmFlags(flags), br=br_config),
        argops=argops, postops=postops)
    return get_registry().dispatch(desc, _build_gemm_ext)


def dispatch_tilecfg_gemm(shape: GemmShape,
                          flags: GemmFlags = GemmFlags.NONE) -> Kernel:
    """API-parity analogue of libxsmm_dispatch_tilecfg_gemm
    (src/libxsmm_main.c:3355): AMX tile configuration has no TPU equivalent
    (the MXU needs no state setup), so this returns a no-op kernel; provided
    so reference-shaped code ports cleanly."""
    desc = GemmDescriptor(shape=shape,
                          flags=GemmFlags(flags) | GemmFlags.NO_RESET_TILECONFIG)

    def _build(d):
        info = KernelInfo(kind="tilecfg", nflops=0)
        return Kernel(fn=lambda *a, **k: None, descriptor=d, info=info,
                      name=d.name() + "_tilecfg")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# Batched independent small GEMM (the xgemm/smmbench streaming workload)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _batched_kernel(desc: GemmDescriptor, batch: int, use_pallas: bool):
    from ..kernels import gemm_pallas

    if use_pallas:
        fn = gemm_pallas.build_batched_gemm(desc, batch)
        if fn is not None:
            return jax.jit(fn), False
    shape = desc.shape
    comp = _comp_dtype(shape)

    prec = matmul_precision(shape)

    def fn(a, b, c=None):
        am = jnp.swapaxes(a, 1, 2) if desc.trans_a else a
        bm = jnp.swapaxes(b, 1, 2) if desc.trans_b else b
        acc = jax.lax.dot_general(
            am, bm, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=comp, precision=prec)
        if c is not None:
            acc = acc + c.astype(comp)
        return acc.astype(to_jnp(shape.out_type))

    return jax.jit(fn), False


def dispatch_gemm_batched(shape: GemmShape,
                          flags: GemmFlags = GemmFlags.NONE,
                          batch: int = 0,
                          tune: bool = False) -> Kernel:
    """Batched independent small GEMMs: C[i] = A[i]@B[i] (+ C0[i]).

    The TPU-native answer to "stream many independent small matmuls", the
    reference's bread-and-butter use (samples/utilities/smmbench,
    samples/magazine): one Pallas kernel streams (A_i, B_i, C_i) tiles
    through VMEM at HBM bandwidth. a:(B,m,k) b:(B,k,n).

    tune=True microbenchmarks the Pallas kernel against XLA's batched dot
    on the first invocation per batch size and keeps the winner — the
    fsspmdm create-time autotune pattern applied to the SMM entry point.
    """
    if GemmFlags(flags) & (GemmFlags.VNNI_A | GemmFlags.VNNI_B
                           | GemmFlags.VNNI_C):
        # neither the Pallas kernel nor the XLA fallback applies the VNNI
        # layout contract dispatch_gemm honors; silently contracting the
        # interleaved layout would be wrong for every batch item
        raise ValueError("VNNI flags are not supported by the batched SMM "
                         "entry; use dispatch_gemm per item or NORM layout")
    desc = GemmDescriptor(shape=shape, flags=GemmFlags(flags))

    def _build(d):
        chosen = {}

        def pick(bsz, a, b, c):
            from ..utils.timer import bench_chain
            cands = [_batched_kernel(d, bsz, use_pallas=up)[0]
                     for up in (True, False)]
            args = (a, b) if c is None else (a, b, c)
            best_fn, best_t = cands[0], float("inf")
            for fn_ in cands:
                # chained + host-synced: fixed-arg timing is memoized and
                # block_until_ready does not sync on this backend
                t = bench_chain(fn_, args, chain_idx=0, reps=6)
                if t < best_t:
                    best_fn, best_t = fn_, t
            chosen[bsz] = best_fn
            return best_fn

        def fn(a, b, c=None):
            if c is not None and d.beta == 0:
                # keep Pallas and XLA candidates semantically identical:
                # the Pallas kernel ignores c under BETA_0 while XLA's
                # fallback would add it — reject instead of diverging
                raise ValueError("c operand passed to a BETA_0 batched "
                                 "GEMM (dispatch without BETA_0 for C+=)")
            if c is None and d.beta != 0:
                # the XLA fallback would silently return the beta=0 result
                raise ValueError("beta=1 batched GEMM needs the C operand "
                                 "(dispatch with BETA_0 for C=)")
            bsz = a.shape[0]
            inner = chosen.get(bsz)
            if inner is None:
                if tune:
                    inner = pick(bsz, a, b, c)
                else:
                    inner = _batched_kernel(d, bsz, use_pallas=True)[0]
                    chosen[bsz] = inner
            if c is None:
                return inner(a, b)
            return inner(a, b, c)

        if batch and not tune:
            # pre-build for the announced batch size (dispatch-time work,
            # reference two-phase contract: dispatch expensive, invoke hot).
            # Under tune=True the pick stays with pick() at first invocation
            # so the documented Pallas-vs-XLA microbenchmark actually runs.
            chosen[batch] = _batched_kernel(d, batch, use_pallas=True)[0]

        info = KernelInfo(kind="gemm_batched",
                          nflops=d.shape.nflops())
        return Kernel(fn=fn, descriptor=d, info=info,
                      name=d.name() + "_batched")

    # separate cache identity from plain gemm: wrap kind into the key
    key = ("batched", desc, bool(tune))
    return get_registry().dispatch(key, lambda _k: _build(desc))


def brgemm_pack_factor(shape: GemmShape) -> int:
    """Lane-pack factor Q for the packed BRGEMM layout (128//k)."""
    if 128 % shape.k:
        raise ValueError(f"packed BRGEMM needs k | 128 (got k={shape.k})")
    return 128 // shape.k


def dispatch_brgemm_packed(shape: GemmShape,
                           flags: GemmFlags = GemmFlags.NONE,
                           br_config: BatchReduceConfig = None,
                           step_groups: int = None,
                           pack_q: int = None,
                           acc_scratch: bool = False) -> Kernel:
    """Batch-reduce GEMM on the lane-packed A layout.

    C = sum_i A_i @ B_i with A in pack_batched(a, Q) layout (Q = 128//k by
    default): the MXU's 128-lane contraction computes Q items and their
    reduction in one pass (kernels/gemm_pallas.py build_packed_brgemm).
    b stays in the natural (br, k, n) layout; kernel(a_packed, b[, c])
    -> (m, n).

    pack_q (a multiple of 128//k) selects a DEEPER pack: pack_batched(a,
    pack_q) folds pack_q batch items into one (m, pack_q*k)x(pack_q*k, n)
    MXU contraction per group — fewer result passes and accumulator
    round-trips per FLOP. bench.py sweeps it as a variant axis alongside
    step_groups (Mosaic compile lottery discipline).

    Use dispatch_brgemm for natural-layout A; this variant is the
    speed-of-light path when k < 128 (measured +20% at k=64 bf16).
    """
    if br_config is None:
        br_config = BatchReduceConfig(br_type=BatchReduceType.STRIDE)
    desc = GemmDescriptor(shape=shape, flags=GemmFlags(flags), br=br_config)
    from ..kernels import gemm_pallas
    if GemmFlags(flags) & (GemmFlags.VNNI_A | GemmFlags.VNNI_B
                           | GemmFlags.VNNI_C):
        raise ValueError("VNNI flags are not supported by the packed "
                         "BRGEMM entry (NORM layout only)")
    if not gemm_pallas.packed_brgemm_supported(desc):
        raise ValueError(f"unsupported for packed BRGEMM: {desc.name()} "
                         "(need k|128, f32/bf16, no transposes)")

    def _build(d):
        import dataclasses as _dc

        built = {}
        q = int(pack_q) if pack_q else 128 // d.shape.k
        out_dt = to_jnp(d.shape.out_type)

        def _make(br):
            d0 = _dc.replace(d, flags=GemmFlags(d.flags)
                             | GemmFlags.BETA_0)
            raw = gemm_pallas.build_packed_brgemm(d0, br, step_groups,
                                                  pack_q=pack_q,
                                                  acc_scratch=acc_scratch)
            if raw is None:
                raise ValueError(f"br={br} not compatible with pack "
                                 f"factor {q} (need br % q == 0 and "
                                 f"q a multiple of {128 // d.shape.k})")
            core = jax.jit(raw)

            # custom VJP (Pallas forward has no autodiff rule): backward in
            # XLA — dA_i = dC @ B_i^T, dB_i = A_i^T @ dC on the lane-packed
            # A view (A_i recovered per item via unpack-style reshape)
            @jax.custom_vjp
            def f(a, b):
                return core(a, b)

            def fwd(a, b):
                return core(a, b), (a, b)

            def bwd(res, dout):
                a, b = res
                g = a.shape[0]
                k, n = d.shape.k, d.shape.n
                ai = (a.reshape(g, d.shape.m, q, k)
                      .transpose(0, 2, 1, 3)
                      .reshape(br, d.shape.m, k)).astype(jnp.float32)
                d32 = dout.astype(jnp.float32)
                da_i = jnp.einsum("mn,bkn->bmk", d32,
                                  b.astype(jnp.float32),
                                  precision=jax.lax.Precision.HIGHEST)
                db = jnp.einsum("bmk,mn->bkn", ai, d32,
                                precision=jax.lax.Precision.HIGHEST)
                da = (da_i.reshape(g, q, d.shape.m, k)
                      .transpose(0, 2, 1, 3).reshape(g, d.shape.m, q * k))
                return da.astype(a.dtype), db.astype(b.dtype)

            f.defvjp(fwd, bwd)

            def wrapper(a, b, c=None):
                out = f(a, b)
                if c is not None:
                    out = (out.astype(jnp.float32)
                           + c.astype(jnp.float32)).astype(out_dt)
                return out

            return wrapper

        def fn(a, b, c=None):
            if c is not None and d.beta == 0:
                raise ValueError("c operand passed to a BETA_0 packed "
                                 "BRGEMM")
            if c is None and d.beta != 0:
                # silently computing the beta=0 result would drop a ported
                # accumulation loop's C+= semantics
                raise ValueError("beta=1 packed BRGEMM needs the C operand "
                                 "(dispatch with BETA_0 for C=)")
            br = b.shape[0]
            inner = built.get(br)
            if inner is None:
                built[br] = inner = _make(br)
            return inner(a, b) if c is None else inner(a, b, c)

        info = KernelInfo(kind="brgemm_packed", nflops=d.shape.nflops())
        return Kernel(fn=fn, descriptor=d, info=info,
                      name=d.name() + "_brpacked")

    key = ("brgemm_packed", desc, step_groups, pack_q, acc_scratch)
    return get_registry().dispatch(key, lambda _k: _build(desc))


def dispatch_brgemm_ext_packed(shape: GemmShape,
                               flags: GemmFlags = GemmFlags.NONE,
                               br_config: BatchReduceConfig = None,
                               argops: UnaryArgops = UnaryArgops(),
                               postops: BinaryPostops = BinaryPostops(),
                               step_groups: int = None,
                               pack_q: int = None,
                               acc_scratch: bool = False) -> Kernel:
    """BRGEMM-ext on the lane-packed fast path: the fused-epilogue kernel.

    The packed BRGEMM Pallas kernel (kernels/gemm_pallas.build_packed_
    brgemm) with the cp-unary epilogue and the binary ADD postop fused
    into the final grid step against the VMEM-resident accumulator — the
    TPU reading of the reference's fused AMX microkernel epilogues
    (generator_gemm_amx_microkernel.c): the fusion costs no extra HBM
    traffic, so fused throughput == unfused throughput (bench extra
    `brgemm_fused_frac`).

    Supported ext subset (others route to dispatch_brgemm_ext's XLA path):
    cp_type in the elementwise epilogue set (no bitmask/SR store), no
    a/b argops, postop NONE or ADD with a (m, n)/broadcastable D.
    Invoke: kernel(a_packed, b[, c][, d]) with a packed via pack_batched
    (Q = 128//k, or pack_q when given — see dispatch_brgemm_packed's
    deep-contraction axis), b (br, k, n), c/d (m, n).
    """
    if br_config is None:
        br_config = BatchReduceConfig(br_type=BatchReduceType.STRIDE)
    from ..kernels import gemm_pallas

    desc = GemmExtDescriptor(
        base=GemmDescriptor(shape=shape, flags=GemmFlags(flags),
                            br=br_config),
        argops=argops, postops=postops)
    if argops.ap_type != UnaryType.NONE or argops.bp_type != UnaryType.NONE:
        raise ValueError("packed BRGEMM-ext fuses cp/postops only; a/b "
                         "argops need dispatch_brgemm_ext")
    if argops.store_ap or argops.store_bp or argops.store_cp:
        raise ValueError("store_* argops are not supported on the packed "
                         "fast path")
    cp = UnaryType(argops.cp_type).name
    if cp not in gemm_pallas._EPILOGUES:
        raise ValueError(f"unsupported packed epilogue {cp} "
                         f"(supported: {sorted(gemm_pallas._EPILOGUES)})")
    with_bias = postops.d_type != BinaryType.NONE
    if with_bias and postops.d_type != BinaryType.ADD:
        raise ValueError("packed BRGEMM-ext supports the ADD binary postop "
                         "only (bias)")
    if not gemm_pallas.packed_brgemm_supported(desc.base):
        raise ValueError(f"unsupported for packed BRGEMM: "
                         f"{desc.base.name()} (need k|128, f32/bf16, "
                         "no transposes)")

    def _build(d):
        built = {}
        q = int(pack_q) if pack_q else 128 // shape.k
        m, n = shape.m, shape.n

        def fn(a, b, c=None, d_op=None):
            br = b.shape[0]
            inner = built.get(br)
            if inner is None:
                raw = gemm_pallas.build_packed_brgemm(
                    desc.base, br, step_groups, cp_type=cp,
                    with_bias=with_bias, pack_q=pack_q,
                    acc_scratch=acc_scratch)
                if raw is None:
                    raise ValueError(f"br={br} not compatible with pack "
                                     f"factor {q}")
                built[br] = inner = jax.jit(raw)
            if desc.base.beta == 1 and c is None:
                raise ValueError("beta=1 requires the C operand")
            if desc.base.beta == 0 and c is not None:
                # A forwarded C would land AFTER the epilogue (epi(acc)+c),
                # matching neither beta=1 seeding nor the reference's
                # beta=0 (C unread) contract — reject it.
                raise ValueError("c operand passed to a BETA_0 packed "
                                 "BRGEMM-ext")
            d_full = None
            if with_bias:
                if d_op is None:
                    raise ValueError("ADD postop requires the D operand")
                d_full = jnp.broadcast_to(jnp.asarray(d_op), (m, n))
            return inner(a, b, c, d_full)

        info = KernelInfo(kind="brgemm_ext_packed", nflops=shape.nflops())
        return Kernel(fn=fn, descriptor=d, info=info,
                      name=desc.base.name() + f"_extpacked_{cp.lower()}"
                      + ("_bias" if with_bias else ""))

    key = ("brgemm_ext_packed", desc, step_groups, pack_q, acc_scratch)
    return get_registry().dispatch(key, lambda _k: _build(desc))


def smm_pack_factor(shape: GemmShape) -> int:
    """Lane-pack factor P for the packed batched SMM layout (128//n)."""
    if shape.k != shape.n or 128 % shape.n:
        raise ValueError("packed SMM needs k == n and n | 128 "
                         f"(got n={shape.n} k={shape.k})")
    return 128 // shape.n


def pack_batched(x, p: int):
    """(B, r, c) -> lane-packed (B//p, r, p*c): p consecutive problems side
    by side along lanes, so minor-dim tiles are 128 wide in HBM (no padding
    waste). The TPU analogue of the reference's SOA packing
    (src/generator_packed_gemm_common.c); inverse: unpack_batched."""
    bsz, r, c = x.shape
    if bsz % p:
        raise ValueError(f"batch {bsz} not divisible by pack factor {p}")
    return (jnp.asarray(x).reshape(bsz // p, p, r, c)
            .transpose(0, 2, 1, 3).reshape(bsz // p, r, p * c))


def unpack_batched(x, p: int):
    """Inverse of pack_batched: (G, r, p*c) -> (G*p, r, c)."""
    g, r, pc = x.shape
    c = pc // p
    return (jnp.asarray(x).reshape(g, r, p, c)
            .transpose(0, 2, 1, 3).reshape(g * p, r, c))


def dispatch_gemm_batched_packed(shape: GemmShape,
                                 flags: GemmFlags = GemmFlags.NONE,
                                 cp_type: UnaryType = UnaryType.NONE,
                                 step_groups: int = None,
                                 tune: bool = False) -> Kernel:
    """Batched independent small GEMMs on the lane-packed layout.

    The speed-of-light SMM path (bench.py headline): operands stay in the
    pack_batched layout end-to-end — a:(G,m,P*k) b:(G,k,P*n) [c:(G,m,P*n)]
    -> (G,m,P*n), P = 128//n. Requires k == n, n | 128, f32/bf16.

    Use dispatch_gemm_batched for arbitrary layouts/shapes; this kernel
    trades layout freedom for full-width HBM tiles + one MXU pass per P
    problems (kernels/gemm_pallas.py build_packed_batched_gemm).

    cp_type fuses a unary epilogue (RELU/GELU/TANH/SIGMOID/X2) onto the
    accumulator inside the kernel — the BRGEMM-ext cp_type analogue.

    tune=True compiles several step-size (step_groups) variants on first
    invocation per batch size and keeps the fastest: Mosaic draws a
    different schedule per compile (measured 0.58-0.93x of speed of light
    for identical source), so latency-critical users should let the
    dispatch win the compile lottery for them.
    """
    # validate BEFORE the tune early-return so both paths fail at dispatch
    # time (an unsupported shape must not dispatch successfully and only
    # raise on first invocation)
    desc = GemmDescriptor(shape=shape, flags=GemmFlags(flags))
    from ..kernels import gemm_pallas
    if GemmFlags(flags) & (GemmFlags.VNNI_A | GemmFlags.VNNI_B
                           | GemmFlags.VNNI_C):
        raise ValueError("VNNI flags are not supported by the packed SMM "
                         "entry (NORM layout only)")
    if not gemm_pallas.packed_smm_supported(desc):
        raise ValueError(f"unsupported for packed SMM: {desc.name()} "
                         "(need k==n, n|128, f32/bf16, no transposes)")
    cp = UnaryType(cp_type).name
    if cp not in gemm_pallas._EPILOGUES:
        raise ValueError(f"unsupported packed-SMM epilogue: {cp} "
                         f"(supported: {sorted(gemm_pallas._EPILOGUES)})")
    if (shape.a_in_type == Datatype.I8
            and cp not in ("NONE", "IDENTITY", "RELU", "X2")):
        raise ValueError(f"epilogue {cp} is float-only (int8 kernel)")

    if tune and step_groups is None:
        def _tuned_fn(a, b, c=None, _picked={}):
            g = a.shape[0]
            kern = _picked.get(g)
            if kern is None:
                from ..utils.timer import bench_chain
                best_t = float("inf")
                for sg in (24, 48, 96):
                    cand = dispatch_gemm_batched_packed(
                        shape, flags, cp_type, step_groups=min(sg, g))
                    args = (a, b) if c is None else (a, b, c)
                    t = bench_chain(cand, args, chain_idx=0, reps=12)
                    if t < best_t:
                        kern, best_t = cand, t
                _picked[g] = kern
            return kern(a, b) if c is None else kern(a, b, c)

        p = 128 // shape.n
        info = KernelInfo(kind="gemm_batched_packed",
                          nflops=shape.nflops() * p)
        base = GemmDescriptor(shape=shape, flags=GemmFlags(flags))
        return get_registry().dispatch(
            ("batched_packed_tuned", base, UnaryType(cp_type).name),
            lambda _k: Kernel(fn=_tuned_fn, descriptor=base, info=info,
                              name=base.name() + f"_packed{p}_tuned"))

    def _build(d):
        import dataclasses as _dc

        built = {}
        p = 128 // d.shape.n
        out_dt = to_jnp(d.shape.out_type)
        # transcendental epilogues keep the raw (non-differentiable) path;
        # NONE/IDENTITY get a custom VJP so the packed kernel is trainable
        differentiable = cp in ("NONE", "IDENTITY")

        def _per_item(x):          # (G, r, p*c) -> (G*p, r, c)
            gg, r, pc = x.shape
            return (x.reshape(gg, r, p, pc // p)
                    .transpose(0, 2, 1, 3).reshape(gg * p, r, pc // p))

        def _to_packed(x):         # inverse of _per_item
            gp, r, c = x.shape
            return (x.reshape(gp // p, p, r, c)
                    .transpose(0, 2, 1, 3).reshape(gp // p, r, p * c))

        def _make(g):
            if not differentiable:
                return jax.jit(
                    gemm_pallas.build_packed_batched_gemm(d, g, cp,
                                          step_groups))

            # beta0 core kernel + custom VJP: the Pallas forward has no
            # autodiff rule, so the backward runs in plain XLA on the
            # per-item view (dA_i = dC_i B_i^T, dB_i = A_i^T dC_i); the
            # beta=1 c-add happens OUTSIDE the kernel where JAX can
            # differentiate it natively.
            d0 = _dc.replace(d, flags=GemmFlags(d.flags)
                             | GemmFlags.BETA_0)
            core = jax.jit(gemm_pallas.build_packed_batched_gemm(
                d0, g, cp, step_groups))

            @jax.custom_vjp
            def f(a, b):
                return core(a, b)

            def fwd(a, b):
                return core(a, b), (a, b)

            def bwd(res, dout):
                a, b = res
                ai = _per_item(a).astype(jnp.float32)
                bi = _per_item(b).astype(jnp.float32)
                di = _per_item(dout).astype(jnp.float32)
                da = jnp.einsum("gmn,gkn->gmk", di, bi,
                                precision=jax.lax.Precision.HIGHEST)
                db = jnp.einsum("gmk,gmn->gkn", ai, di,
                                precision=jax.lax.Precision.HIGHEST)
                return (_to_packed(da).astype(a.dtype),
                        _to_packed(db).astype(b.dtype))

            f.defvjp(fwd, bwd)

            def wrapper(a, b, c=None):
                out = f(a, b)
                if c is not None:
                    out = (out.astype(jnp.float32)
                           + c.astype(jnp.float32)).astype(out_dt)
                return out

            return wrapper

        def fn(a, b, c=None):
            if c is not None and d.beta == 0:
                raise ValueError("c operand passed to a BETA_0 packed SMM")
            if c is None and d.beta != 0:
                raise ValueError("beta=1 packed SMM needs the C operand "
                                 "(dispatch with BETA_0 for C=)")
            g = a.shape[0]
            if g == 0:            # empty batch: no kernel to build
                return jnp.zeros((0, d.shape.m, p * d.shape.n), out_dt)
            inner = built.get(g)
            if inner is None:
                built[g] = inner = _make(g)
            return inner(a, b) if c is None else inner(a, b, c)

        info = KernelInfo(kind="gemm_batched_packed",
                          nflops=d.shape.nflops() * p)
        return Kernel(fn=fn, descriptor=d, info=info,
                      name=d.name() + f"_packed{p}"
                      + ("" if cp == "NONE" else f"_{cp.lower()}"))

    key = ("batched_packed", desc, cp, step_groups)
    return get_registry().dispatch(key, lambda _k: _build(desc))


# ---------------------------------------------------------------------------
# BLAS-style convenience (libxsmm_?gemm, src/libxsmm_main.c:3933)
# ---------------------------------------------------------------------------

def xmmdispatch(descriptor):
    """libxsmm_xmmdispatch analogue (src/libxsmm_main.c:3323): dispatch
    directly from a pre-built descriptor (the shape-struct dispatch_* APIs
    are sugar over this, exactly as in the reference)."""
    builder = (_build_gemm_ext if isinstance(descriptor, GemmExtDescriptor)
               else _build_gemm)
    return get_registry().dispatch(descriptor, builder)


def gemm(a, b, c=None, *, trans_a: bool = False, trans_b: bool = False,
         beta: int = None):
    """Dispatch+invoke in one call, like libxsmm_dgemm/sgemm."""
    from ..dtypes import from_jnp

    m = a.shape[1] if trans_a else a.shape[0]
    k = a.shape[0] if trans_a else a.shape[1]
    n = b.shape[0] if trans_b else b.shape[1]
    if beta is None:
        beta = 0 if c is None else 1
    flags = GemmFlags.NONE
    if trans_a:
        flags |= GemmFlags.TRANS_A
    if trans_b:
        flags |= GemmFlags.TRANS_B
    if beta == 0:
        flags |= GemmFlags.BETA_0
    adt = from_jnp(a.dtype)
    bdt = from_jnp(b.dtype)
    odt = from_jnp(c.dtype) if c is not None else adt
    shape = GemmShape(m=m, n=n, k=k, a_in_type=adt, b_in_type=bdt,
                      out_type=odt)
    kernel = dispatch_gemm(shape, flags)
    if beta == 0:
        return kernel(a, b)
    return kernel(a, b, c)


def sgemm(a, b, c=None, **kw):
    return gemm(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                None if c is None else jnp.asarray(c, jnp.float32), **kw)


def dgemm(a, b, c=None, **kw):
    return gemm(jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64),
                None if c is None else jnp.asarray(c, jnp.float64), **kw)
