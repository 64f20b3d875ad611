"""Packed (SOA) dense GEMM: P independent small GEMMs interleaved in the
trailing dimension.

Parity with the reference's packed dense generators
(/root/reference/src/generator_packed_gemm*.c, create API
src/libxsmm_main.c:3733-3841): the reference's SOA layout [row][col][packed]
maps to row-major arrays with the packed width as the trailing axis —
C[m,n,p] = A[m,k,p] @ B[k,n,p] for each p.

TPU note: the packed dimension rides the VPU lanes, so XLA lowers the
einsum to p-batched MXU work with lane-major layout; for packed_width >=
8 this is exactly the SOA vectorization the reference's JIT builds.

The row-major packed variants (AC_RM / BC_RM: only A&C or B&C packed,
the other operand shared across p) are included — the reference uses them
for grid-point batches sharing one operator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..descriptor import GemmFlags, GemmShape
from ..dtypes import to_jnp
from ..registry import Kernel, KernelInfo, get_registry
from .gemm import _comp_dtype, _ensure_x64, matmul_precision


def _build_packed(desc):
    kind, shape, flags, packed_width = desc
    # the reference REJECTS transpose and VNNI flags on the packed dense
    # entries (generator_packed_gemm.c:41-48, LIBXSMM_ERR_LDA_TRANS /
    # ERR_LDB_TRANS / ERR_ARCH_PREC) — silently returning an untransposed
    # kernel would compute A@B where the caller asked for A@B^T
    bad = (GemmFlags.TRANS_A | GemmFlags.TRANS_B | GemmFlags.VNNI_A
           | GemmFlags.VNNI_B | GemmFlags.VNNI_C)
    if GemmFlags(flags) & bad:
        raise ValueError("packed dense GEMM supports NORM layouts only "
                         "(no TRANS_*/VNNI_* flags; reference "
                         "generator_packed_gemm.c:41-48)")
    _ensure_x64(shape)
    comp = _comp_dtype(shape)
    out_dt = to_jnp(shape.out_type)
    prec = matmul_precision(shape)
    beta0 = bool(flags & GemmFlags.BETA_0)

    spec = {
        "packed": "mkp,knp->mnp",     # all operands packed
        "ac_rm": "mkp,kn->mnp",       # A,C packed; B shared
        "bc_rm": "mk,knp->mnp",       # B,C packed; A shared
    }[kind]

    @jax.named_scope(f"xsmm_packed_gemm_{kind}_{shape.m}x{shape.n}"
                     f"x{shape.k}_p{packed_width}")
    def run(a, b, c=None):
        if beta0 and c is not None:
            # BETA_0 means C is UNREAD (reference contract); silently
            # adding it would change a ported accumulation's semantics
            raise ValueError("c operand passed to a BETA_0 packed GEMM")
        if not beta0 and c is None:
            raise ValueError("beta=1 packed GEMM needs the C operand "
                             "(pass GemmFlags.BETA_0 for C=)")
        acc = jnp.einsum(spec, a.astype(comp), b.astype(comp),
                         precision=prec)
        if c is not None:
            acc = acc + c.astype(comp)
        return acc.astype(out_dt)

    fn = jax.jit(run)
    nflops = 2 * shape.m * shape.n * shape.k * packed_width
    info = KernelInfo(kind=f"packed_gemm_{kind}", nflops=nflops)
    return Kernel(fn=fn, descriptor=desc, info=info,
                  name=f"packed_gemm_{kind}_{shape.m}x{shape.n}x{shape.k}"
                       f"_p{packed_width}")


def create_packed_gemm(shape: GemmShape,
                       flags: GemmFlags = GemmFlags.NONE,
                       packed_width: int = 1) -> Kernel:
    """libxsmm_create_packed_gemm analogue (src/libxsmm_main.c:3733).
    kernel(a, b[, c]): a (m,k,p), b (k,n,p) -> c (m,n,p)."""
    desc = ("packed", shape, GemmFlags(flags), packed_width)
    return get_registry().dispatch(desc, _build_packed)


def create_packed_gemm_ac_rm(shape: GemmShape,
                             flags: GemmFlags = GemmFlags.NONE,
                             packed_width: int = 1) -> Kernel:
    """libxsmm_create_packed_gemm_ac_rm analogue (:3769).
    kernel(a, b[, c]): a (m,k,p), b (k,n) shared -> c (m,n,p)."""
    desc = ("ac_rm", shape, GemmFlags(flags), packed_width)
    return get_registry().dispatch(desc, _build_packed)


def create_packed_gemm_bc_rm(shape: GemmShape,
                             flags: GemmFlags = GemmFlags.NONE,
                             packed_width: int = 1) -> Kernel:
    """libxsmm_create_packed_gemm_bc_rm analogue (:3805).
    kernel(a, b[, c]): a (m,k) shared, b (k,n,p) -> c (m,n,p)."""
    desc = ("bc_rm", shape, GemmFlags(flags), packed_width)
    return get_registry().dispatch(desc, _build_packed)
