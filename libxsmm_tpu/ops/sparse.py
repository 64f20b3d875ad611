"""Sparse GEMM: packed SpGEMM (CSR/CSC/BCSC) and pattern-baked SpMM.

Re-designs the reference's sparse generator family for TPU
(/root/reference/src/generator_packed_spgemm.c:24-50 routing,
generator_packed_spgemm_csr_asparse.c, *_csc_bsparse.c,
*_bcsc_bsparse_avx_avx2_avx512_amx.c, generator_spgemm_csr_asparse_reg.c):

  * The sparsity PATTERN is a create-time constant — the TPU analogue of
    JIT-ing the pattern into machine code. It is fingerprinted into the
    kernel key (descriptor.SparsePattern) so identical patterns share one
    compiled kernel and there are no recompile storms (SURVEY.md §7.3).
  * Sparse VALUES are runtime operands (as in the reference's packed spgemm,
    where the param carries the value pointer), EXCEPT csr_areg, which bakes
    values as trace-time constants exactly like the reference holds them in
    vector registers (generator_spgemm_csr_asparse_reg.c:66-96).
  * CSR A-sparse lowers to ELL form: pad rows to the max row-degree, gather
    B rows, multiply-accumulate — a dense, static-shape formulation XLA
    tiles well. Row-degree skew wastes work; the fsspmdm autotuner decides
    when the dense MXU path wins instead.
  * BCSC B-sparse lowers to: gather dense A panels per nonzero block ->
    ONE batched MXU matmul over all blocks -> segment-sum per block-column.
    This keeps all FLOPs on the MXU (the TPU reading of the reference's AMX
    BCSC kernels).

Layouts are row-major; "packed" SOA operands keep the packed width as the
trailing dimension (reference: [row][col][packed], same order).
Alpha=1, beta in {0,1} as everywhere in this library.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import device
from ..descriptor import (GemmFlags, GemmShape, SparsePattern, SpgemmConfig)
from ..dtypes import Datatype, itemsize, to_jnp
from ..registry import Kernel, KernelInfo, get_registry
from .gemm import _ensure_x64, matmul_precision


def _dense_beats_sparse(shape: GemmShape, sparse_bytes: int) -> bool:
    """Roofline heuristic for the auto strategy: on a TPU the MXU is so much
    faster than gather/scatter traffic that densifying the sparse operand
    and doing ONE dense matmul often wins (the hardware-scale version of
    fsspmdm's dense bias). Compare dense compute time against the sparse
    path's dominant memory traffic."""
    geom = device.get_geometry()
    peak = (geom.peak_bf16_tflops if shape.a_in_type in
            (Datatype.BF16, Datatype.F16, Datatype.I8, Datatype.U8)
            else geom.peak_f32_tflops) * 1e12
    dense_s = 2.0 * shape.m * shape.n * shape.k / peak
    sparse_s = sparse_bytes / (geom.hbm_gbps * 1e9)
    return dense_s < sparse_s


# ---------------------------------------------------------------------------
# host-side sparse containers (pattern handling; NumPy, not traced)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CsrMatrix:
    """Host CSR: the currency for A-sparse kernels."""

    shape: Tuple[int, int]
    indptr: np.ndarray      # (m+1,) int32
    indices: np.ndarray     # (nnz,) int32 column ids
    data: Optional[np.ndarray] = None

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @staticmethod
    def from_dense(a, tol: float = 0.0) -> "CsrMatrix":
        a = np.asarray(a)
        mask = np.abs(a) > tol
        m, k = a.shape
        indptr = np.zeros(m + 1, np.int32)
        indptr[1:] = np.cumsum(mask.sum(axis=1))
        indices = np.nonzero(mask)[1].astype(np.int32)
        data = a[mask]
        return CsrMatrix((m, k), indptr, indices, data)

    def to_dense(self) -> np.ndarray:
        m, k = self.shape
        out = np.zeros((m, k), self.data.dtype if self.data is not None
                       else np.float64)
        for i in range(m):
            s, e = self.indptr[i], self.indptr[i + 1]
            out[i, self.indices[s:e]] = self.data[s:e]
        return out

    def ell(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """ELL-pad: returns (col_idx (m,rmax), pos (m,rmax), mask, rmax).

        pos maps each ELL slot to its position in the nnz value stream so
        runtime value vectors can be gathered without re-deriving layout.
        """
        m = self.shape[0]
        deg = np.diff(self.indptr)
        rmax = max(1, int(deg.max(initial=0)))
        col = np.zeros((m, rmax), np.int32)
        pos = np.zeros((m, rmax), np.int32)
        mask = np.zeros((m, rmax), np.float32)
        for i in range(m):
            s, e = int(self.indptr[i]), int(self.indptr[i + 1])
            col[i, : e - s] = self.indices[s:e]
            pos[i, : e - s] = np.arange(s, e, dtype=np.int32)
            mask[i, : e - s] = 1.0
        return col, pos, mask, rmax

    def fingerprint(self, include_values: bool = False) -> int:
        return SparsePattern.fingerprint_of(
            self.indptr, self.indices,
            values=self.data if include_values else None)


@dataclasses.dataclass
class CscMatrix:
    """Host CSC: the currency for B-sparse kernels."""

    shape: Tuple[int, int]
    indptr: np.ndarray      # (n+1,) column pointers
    indices: np.ndarray     # (nnz,) row ids
    data: Optional[np.ndarray] = None

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @staticmethod
    def from_dense(b, tol: float = 0.0) -> "CscMatrix":
        csr_t = CsrMatrix.from_dense(np.asarray(b).T, tol)
        return CscMatrix(b.shape, csr_t.indptr, csr_t.indices, csr_t.data)

    def fingerprint(self, include_values: bool = False) -> int:
        return SparsePattern.fingerprint_of(
            self.indptr, self.indices,
            values=self.data if include_values else None)


@dataclasses.dataclass
class BcscMatrix:
    """Host block-CSC: (bk x bn) dense blocks, sparse block structure.

    Mirrors the reference's BCSC B-sparse operand
    (generator_packed_spgemm_bcsc_bsparse*.c): values are stored block by
    block in column-major block order, each block dense row-major here.
    """

    shape: Tuple[int, int]          # (k, n) element dims
    bk: int
    bn: int
    indptr: np.ndarray              # (n//bn + 1,) block-column pointers
    indices: np.ndarray             # (nblocks,) block-row ids
    data: Optional[np.ndarray] = None   # (nblocks, bk, bn)

    @property
    def nblocks(self) -> int:
        return len(self.indices)

    @staticmethod
    def from_dense(b, bk: int, bn: int, tol: float = 0.0) -> "BcscMatrix":
        b = np.asarray(b)
        k, n = b.shape
        if k % bk or n % bn:
            raise ValueError(f"dims ({k},{n}) not divisible by block "
                             f"({bk},{bn})")
        kb, nb = k // bk, n // bn
        blocks = b.reshape(kb, bk, nb, bn).transpose(2, 0, 1, 3)  # (nb,kb,bk,bn)
        nz = np.abs(blocks).max(axis=(2, 3)) > tol                # (nb, kb)
        indptr = np.zeros(nb + 1, np.int32)
        indptr[1:] = np.cumsum(nz.sum(axis=1))
        indices = np.nonzero(nz)[1].astype(np.int32)
        data = blocks[nz]                                         # (nblk,bk,bn)
        return BcscMatrix((k, n), bk, bn, indptr, indices, data)

    def to_dense(self) -> np.ndarray:
        k, n = self.shape
        out = np.zeros((k, n), self.data.dtype)
        for jb in range(n // self.bn):
            s, e = int(self.indptr[jb]), int(self.indptr[jb + 1])
            for l in range(s, e):
                ib = int(self.indices[l])
                out[ib * self.bk:(ib + 1) * self.bk,
                    jb * self.bn:(jb + 1) * self.bn] = self.data[l]
        return out

    def fingerprint(self, include_values: bool = False) -> int:
        return SparsePattern.fingerprint_of(
            self.indptr, self.indices, np.asarray([self.bk, self.bn]),
            values=self.data if include_values else None)


# ---------------------------------------------------------------------------
# packed SpGEMM, A sparse (CSR): C[m,n(,p)] += A_sp[m,k] * B[k,n(,p)]
# ---------------------------------------------------------------------------

def create_packed_spgemm_csr(shape: GemmShape,
                             flags: GemmFlags = GemmFlags.NONE,
                             packed_width: int = 1,
                             row_ptr: np.ndarray = None,
                             column_idx: np.ndarray = None,
                             strategy: str = "auto",
                             sparse_operand: str = "a") -> Kernel:
    """libxsmm_create_packed_spgemm_csr analogue (src/libxsmm_main.c:3553).

    The reference entry routes TWO kernels by which leading dim is zero
    (generator_packed_spgemm.c:24-56); this library has no ld args, so the
    routing is the explicit `sparse_operand`: "a" (default, lda==0 reading)
    keeps A sparse; "b" (ldb==0 reading) delegates to
    create_packed_spgemm_csr_bsparse with the same CSR index contract
    re-read over B's (k, n).

    A-sparse kernel: kernel(values, b[, c]) with values (nnz,) runtime,
    b (k,n) or (k,n,p); the pattern is baked at create time.

    strategy: "sparse" = ELL gather path; "dense" = scatter values into a
    dense A and run one MXU matmul (wins at moderate density on TPU);
    "auto" picks by roofline heuristic (_dense_beats_sparse).
    """
    if sparse_operand == "b":
        return create_packed_spgemm_csr_bsparse(
            shape, flags, packed_width, row_ptr, column_idx, strategy)
    if sparse_operand != "a":
        raise ValueError(f"sparse_operand must be 'a' or 'b', got "
                         f"{sparse_operand!r}")
    csr = CsrMatrix((shape.m, shape.k), np.asarray(row_ptr, np.int32),
                    np.asarray(column_idx, np.int32))
    _ensure_x64(shape)
    # cheap probe: only the max row degree is needed for the auto choice —
    # the full O(m*rmax) ELL construction belongs to the sparse build only
    rmax_probe = int(np.diff(csr.indptr).max(initial=0))
    if csr.nnz == 0:
        # empty pattern: the ELL value gather indexes a size-0 array; the
        # dense lowering handles it via the appended zero slot
        strategy = "dense"
    elif strategy == "auto":
        sparse_bytes = (shape.m * rmax_probe * shape.n
                        * max(1, packed_width) * itemsize(shape.b_in_type))
        strategy = ("dense" if _dense_beats_sparse(shape, sparse_bytes)
                    else "sparse")
    pattern = SparsePattern(format="csr", rows=shape.m, cols=shape.k,
                            nnz=csr.nnz, fingerprint=csr.fingerprint())
    desc = ("pspgemm_csr", shape, GemmFlags(flags), packed_width, pattern,
            strategy)

    def _build(_key):
        comp = to_jnp(shape.comp_type)
        out_dt = to_jnp(shape.out_type)
        prec = matmul_precision(shape)
        scope = jax.named_scope(
            f"xsmm_pspgemm_csr_{shape.m}x{shape.n}x{shape.k}"
            f"_nnz{csr.nnz}_{strategy}")
        # only the CHOSEN strategy's pattern arrays are built and kept
        # device-resident (a sparse-strategy kernel must not hold an m*k
        # posmat on device forever, nor ride it as an unused jit argument);
        # all arrays are bound as ARGUMENTS, not jit closure constants
        # (constants re-upload per call, tunnel-measured ~430us)
        if strategy == "dense":
            # densify via a create-time GATHER map (a per-call element
            # scatter is ~100x slower on TPU; same trick as the BCSC dense
            # path): posmat[row, col] = value index, missing -> nnz (the
            # appended zero slot)
            posmat = np.full(shape.m * shape.k, csr.nnz, np.int32)
            rows_np = np.repeat(np.arange(shape.m, dtype=np.int64),
                                np.diff(csr.indptr))
            posmat[rows_np * shape.k + csr.indices] = np.arange(
                csr.nnz, dtype=np.int32)
            posd = jax.device_put(jnp.asarray(posmat))

            @scope
            def run(pmat, values, b, c=None):
                vpad = jnp.concatenate(
                    [values, jnp.zeros((1,), values.dtype)])
                adense = jnp.take(vpad, pmat).reshape(shape.m, shape.k)
                if b.ndim == 2:
                    acc = jax.lax.dot_general(
                        adense, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=comp, precision=prec)
                else:
                    acc = jnp.einsum("mk,knp->mnp", adense.astype(comp),
                                     b.astype(comp), precision=prec)
                if c is not None:
                    acc = acc + c.astype(comp)
                return acc.astype(out_dt)

            jitted = jax.jit(run)

            def fn(values, b, c=None):
                if c is None:
                    return jitted(posd, values, b)
                return jitted(posd, values, b, c)
        else:
            col, pos, mask, rmax = csr.ell()
            colj = jax.device_put(jnp.asarray(col.reshape(-1)))
            posj = jax.device_put(jnp.asarray(pos.reshape(-1)))
            maskj = jax.device_put(jnp.asarray(mask))

            @scope
            def run(colv, posv, maskv, values, b, c=None):
                vals = jnp.take(values, posv, axis=0)
                vals = vals.reshape(shape.m, rmax).astype(comp) * maskv
                gb = jnp.take(b, colv, axis=0)
                if b.ndim == 2:                  # (k, n)
                    gb = gb.reshape(shape.m, rmax, shape.n).astype(comp)
                    acc = jnp.einsum("mr,mrn->mn", vals, gb,
                                     precision=prec)
                else:                            # (k, n, p)
                    p = b.shape[-1]
                    gb = gb.reshape(shape.m, rmax, shape.n, p).astype(comp)
                    acc = jnp.einsum("mr,mrnp->mnp", vals, gb,
                                     precision=prec)
                if c is not None:
                    acc = acc + c.astype(comp)
                return acc.astype(out_dt)

            jitted = jax.jit(run)

            def fn(values, b, c=None):
                if c is None:
                    return jitted(colj, posj, maskj, values, b)
                return jitted(colj, posj, maskj, values, b, c)

        nflops = 2 * csr.nnz * shape.n * max(1, packed_width)
        info = KernelInfo(kind="pspgemm_csr", nflops=nflops)
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"pspgemm_csr_{shape.m}x{shape.n}x{shape.k}")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# packed SpGEMM, B sparse (CSC): C[m(,p),n] += A[m,k(,p)] * B_sp[k,n]
# ---------------------------------------------------------------------------

def create_packed_spgemm_csc(shape: GemmShape,
                             flags: GemmFlags = GemmFlags.NONE,
                             packed_width: int = 1,
                             column_ptr: np.ndarray = None,
                             row_idx: np.ndarray = None,
                             sparse_operand: str = "b",
                             strategy: str = "auto") -> Kernel:
    """libxsmm_create_packed_spgemm_csc analogue (src/libxsmm_main.c:3597).

    The reference entry routes TWO kernels by which leading dim is zero
    (generator_packed_spgemm.c:61-101); the routing here is the explicit
    `sparse_operand`: "b" (default, ldb==0 reading) keeps B sparse; "c"
    (ldc==0 reading) delegates to create_packed_spgemm_csc_csparse (SDDMM)
    with the same CSC index contract re-read over C's (m, n).

    B-sparse kernel: kernel(a, values[, c]): a (m,k) or (m,k,p); values
    (nnz,). Lowering: gather columns of A per nonzero, scale, segment-sum
    per output column (static segment ids from the pattern).
    """
    if sparse_operand == "c":
        return create_packed_spgemm_csc_csparse(
            shape, flags, packed_width, column_ptr, row_idx, strategy)
    if sparse_operand != "b":
        raise ValueError(f"sparse_operand must be 'b' or 'c', got "
                         f"{sparse_operand!r}")
    if strategy != "auto":
        # the B-sparse CSC routing has a single lowering; silently ignoring
        # a requested strategy would mask mis-tuned call sites
        raise ValueError("strategy applies only to the C-sparse routing "
                         f"(sparse_operand='c'); got {strategy!r}")
    csc = CscMatrix((shape.k, shape.n), np.asarray(column_ptr, np.int32),
                    np.asarray(row_idx, np.int32))
    _ensure_x64(shape)
    pattern = SparsePattern(format="csc", rows=shape.k, cols=shape.n,
                            nnz=csc.nnz, fingerprint=csc.fingerprint())
    desc = ("pspgemm_csc", shape, GemmFlags(flags), packed_width, pattern)

    def _build(_key):
        nnz = csc.nnz
        rowsj = jax.device_put(jnp.asarray(csc.indices, jnp.int32))
        seg = np.repeat(np.arange(shape.n, dtype=np.int32),
                        np.diff(csc.indptr))
        segd = jax.device_put(jnp.asarray(seg))             # (nnz,) col id
        comp = to_jnp(shape.comp_type)
        out_dt = to_jnp(shape.out_type)

        @jax.named_scope(f"xsmm_pspgemm_csc_{shape.m}x{shape.n}x{shape.k}"
                         f"_nnz{nnz}")
        def run(rows, segj, a, values, c=None):
            cols = jnp.take(a, rows, axis=1).astype(comp)   # (m, nnz[, p])
            v = values.astype(comp)
            if a.ndim == 2:
                contrib = cols * v[None, :]
                acc = jax.ops.segment_sum(contrib.T, segj,
                                          num_segments=shape.n).T
            else:
                contrib = cols * v[None, :, None]
                acc = jax.ops.segment_sum(
                    contrib.transpose(1, 0, 2), segj,
                    num_segments=shape.n).transpose(1, 0, 2)  # (m, n, p)
            if c is not None:
                acc = acc + c.astype(comp)
            return acc.astype(out_dt)

        jitted = jax.jit(run)

        def fn(a, values, c=None):
            if c is None:
                return jitted(rowsj, segd, a, values)
            return jitted(rowsj, segd, a, values, c)

        nflops = 2 * nnz * shape.m * max(1, packed_width)
        info = KernelInfo(kind="pspgemm_csc", nflops=nflops)
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"pspgemm_csc_{shape.m}x{shape.n}x{shape.k}")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# packed SpGEMM, B sparse in CSR: C[m,n(,p)] += A[m,k(,p)] * B_sp[k,n]
# ---------------------------------------------------------------------------

def create_packed_spgemm_csr_bsparse(shape: GemmShape,
                                     flags: GemmFlags = GemmFlags.NONE,
                                     packed_width: int = 1,
                                     row_ptr: np.ndarray = None,
                                     column_idx: np.ndarray = None,
                                     strategy: str = "auto") -> Kernel:
    """The reference's ldb==0 routing of libxsmm_create_packed_spgemm_csr
    (generator_packed_spgemm.c:39-53 -> generator_packed_spgemm_csr_bsparse.c;
    sample contract samples/xgemm_norm_packed/bsparse_packed_csr.c): B is
    sparse and stays in CSR — row_ptr (k+1,) over B's k rows, column_idx
    (nnz,) in [0, n) — while A and C are dense packed SOA.

    Returned kernel: kernel(a, values[, c]) with a (m,k) or (m,k,p),
    values (nnz,) runtime, c (m,n[,p]); beta per flags.

    strategy: "sparse" = per-nonzero column gather of A + segment-sum over
    output columns (the CSC-B lowering on the CSR index contract — CSR
    order is row-major so the segment ids are unsorted, which segment_sum
    handles); "dense" = create-time gather-map densify of B + ONE MXU
    matmul; "auto" picks by roofline (_dense_beats_sparse).
    """
    k, n = shape.k, shape.n
    indptr = np.asarray(row_ptr, np.int32)
    indices = np.asarray(column_idx, np.int32)
    nnz = int(indptr[-1])
    _ensure_x64(shape)
    p = max(1, packed_width)
    if strategy == "auto":
        sparse_bytes = shape.m * nnz * p * itemsize(shape.a_in_type)
        strategy = ("dense" if _dense_beats_sparse(shape, sparse_bytes)
                    else "sparse")
    pattern = SparsePattern(format="csr_b", rows=k, cols=n, nnz=nnz,
                            fingerprint=SparsePattern.fingerprint_of(
                                indptr, indices))
    desc = ("pspgemm_csr_b", shape, GemmFlags(flags), packed_width, pattern,
            strategy)

    def _build(_key):
        # k-row id per nonzero (CSR expansion)
        kidx = np.repeat(np.arange(k, dtype=np.int32), np.diff(indptr))
        comp = to_jnp(shape.comp_type)
        out_dt = to_jnp(shape.out_type)
        prec = matmul_precision(shape)
        scope = jax.named_scope(f"xsmm_pspgemm_csr_b_{shape.m}x{n}x{k}"
                                f"_nnz{nnz}_{strategy}")
        # only the CHOSEN strategy's pattern arrays are built/kept (the
        # sparse path must not hold a k*n posmat on device forever); all
        # bound as jit ARGUMENTS, not closure constants
        if strategy == "dense":
            # create-time gather map (per-call scatter is ~100x slower on
            # TPU; same trick as the CSR A-sparse dense path)
            posmat = np.full(k * n, nnz, np.int32)
            posmat[kidx.astype(np.int64) * n + indices] = np.arange(
                nnz, dtype=np.int32)
            posd = jax.device_put(jnp.asarray(posmat))

            @scope
            def run(pmat, a, values, c=None):
                vpad = jnp.concatenate(
                    [values, jnp.zeros((1,), values.dtype)])
                bdense = jnp.take(vpad, pmat).reshape(k, n)
                if a.ndim == 2:
                    acc = jax.lax.dot_general(
                        a, bdense, (((1,), (0,)), ((), ())),
                        preferred_element_type=comp, precision=prec)
                else:
                    acc = jnp.einsum("mkp,kn->mnp", a.astype(comp),
                                     bdense.astype(comp), precision=prec)
                if c is not None:
                    acc = acc + c.astype(comp)
                return acc.astype(out_dt)

            jitted = jax.jit(run)

            def fn(a, values, c=None):
                if c is None:
                    return jitted(posd, a, values)
                return jitted(posd, a, values, c)
        else:
            kidxj = jax.device_put(jnp.asarray(kidx))
            segd = jax.device_put(jnp.asarray(indices))

            @scope
            def run(kid, segj, a, values, c=None):
                cols = jnp.take(a, kid, axis=1).astype(comp)  # (m,nnz[,p])
                v = values.astype(comp)
                if a.ndim == 2:
                    contrib = cols * v[None, :]
                    acc = jax.ops.segment_sum(contrib.T, segj,
                                              num_segments=n).T
                else:
                    contrib = cols * v[None, :, None]
                    acc = jax.ops.segment_sum(
                        contrib.transpose(1, 0, 2), segj,
                        num_segments=n).transpose(1, 0, 2)
                if c is not None:
                    acc = acc + c.astype(comp)
                return acc.astype(out_dt)

            jitted = jax.jit(run)

            def fn(a, values, c=None):
                if c is None:
                    return jitted(kidxj, segd, a, values)
                return jitted(kidxj, segd, a, values, c)

        nflops = 2 * nnz * shape.m * p
        info = KernelInfo(kind="pspgemm_csr_b", nflops=nflops)
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"pspgemm_csr_b_{shape.m}x{n}x{k}")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# packed SpGEMM, C sparse in CSC (SDDMM): values at C's nonzeros only
# ---------------------------------------------------------------------------

def create_packed_spgemm_csc_csparse(shape: GemmShape,
                                     flags: GemmFlags = GemmFlags.NONE,
                                     packed_width: int = 1,
                                     column_ptr: np.ndarray = None,
                                     row_idx: np.ndarray = None,
                                     strategy: str = "auto") -> Kernel:
    """The reference's ldc==0 routing of libxsmm_create_packed_spgemm_csc
    (generator_packed_spgemm.c:81-95 -> generator_packed_spgemm_csc_csparse
    _avx_avx2_avx512.c): sampled dense-dense matmul (SDDMM) — only C's
    baked nonzero positions are computed and stored. Pattern: column_ptr
    (n+1,) over C's n columns, row_idx (nnz,) in [0, m).

    Returned kernel: kernel(a, b[, c_vals]) -> values (nnz,), with a (m,k)
    or (m,k,p) and b (k,n) or (k,n,p). Matching the reference kernel, the
    packed dimension is REDUCED into each sparse value (the 16-lane
    horizontal "reduce C" stage, csparse_avx...c:123-193): value[t] =
    sum_k sum_p A[row_t,k,p] * B[k,col_t,p]. beta=1 adds c_vals (nnz,).

    strategy: "gather" = batched per-nonzero row.col dots (gather rows of A
    and cols of B); "dense" = ONE MXU matmul then gather the pattern
    positions; "auto" picks by roofline (_dense_beats_sparse).
    """
    m, n, k = shape.m, shape.n, shape.k
    indptr = np.asarray(column_ptr, np.int32)
    indices = np.asarray(row_idx, np.int32)
    nnz = int(indptr[-1])
    _ensure_x64(shape)
    p = max(1, packed_width)
    if strategy == "auto":
        sparse_bytes = 2 * nnz * k * p * itemsize(shape.a_in_type)
        strategy = ("dense" if _dense_beats_sparse(shape, sparse_bytes)
                    else "gather")
    pattern = SparsePattern(format="csc_c", rows=m, cols=n, nnz=nnz,
                            fingerprint=SparsePattern.fingerprint_of(
                                indptr, indices))
    desc = ("pspgemm_csc_c", shape, GemmFlags(flags), packed_width, pattern,
            strategy)

    def _build(_key):
        cols = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
        rowsj = jax.device_put(jnp.asarray(indices))
        colsj = jax.device_put(jnp.asarray(cols))
        # flat gather positions for the dense strategy
        flatj = jax.device_put(jnp.asarray(
            indices.astype(np.int64) * n + cols, jnp.int32))
        comp = to_jnp(shape.comp_type)
        out_dt = to_jnp(shape.out_type)
        prec = matmul_precision(shape)

        @jax.named_scope(f"xsmm_pspgemm_csc_c_{m}x{n}x{k}"
                         f"_nnz{nnz}_{strategy}")
        def run(rows, colj, flat, a, b, c=None):
            if strategy == "dense":
                if a.ndim == 2:
                    dense = jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=comp, precision=prec)
                else:
                    dense = jnp.einsum("mkp,knp->mn", a.astype(comp),
                                       b.astype(comp), precision=prec)
                vals = jnp.take(dense.reshape(-1), flat)
            else:
                ar = jnp.take(a, rows, axis=0).astype(comp)  # (nnz,k[,p])
                bc = jnp.take(b, colj, axis=1).astype(comp)  # (k,nnz[,p])
                if a.ndim == 2:
                    vals = jnp.einsum("tk,kt->t", ar, bc, precision=prec)
                else:
                    vals = jnp.einsum("tkp,ktp->t", ar, bc, precision=prec)
            if c is not None:
                vals = vals + c.astype(comp)
            return vals.astype(out_dt)

        jitted = jax.jit(run)

        def fn(a, b, c=None):
            if c is None:
                return jitted(rowsj, colsj, flatj, a, b)
            return jitted(rowsj, colsj, flatj, a, b, c)

        nflops = 2 * nnz * k * p
        info = KernelInfo(kind="pspgemm_csc_c", nflops=nflops)
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"pspgemm_csc_c_{m}x{n}x{k}")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# packed SpGEMM, B block-sparse (BCSC): all FLOPs on the MXU
# ---------------------------------------------------------------------------

def create_tilecfg_packed_spgemm_bcsc(shape: GemmShape,
                                      flags: GemmFlags = GemmFlags.NONE,
                                      config: SpgemmConfig = SpgemmConfig()):
    """API-parity analogue of libxsmm_create_tilecfg_packed_spgemm_bcsc
    (include/libxsmm.h:187): AMX tileconfig has no TPU equivalent, so this
    returns the same no-op kernel as dispatch_tilecfg_gemm."""
    from .gemm import dispatch_tilecfg_gemm
    return dispatch_tilecfg_gemm(shape, flags)


def _build_bcsc_super(shape: GemmShape, flags: GemmFlags,
                      config: SpgemmConfig, indptr: np.ndarray,
                      indices: np.ndarray, desc, nblocks: int) -> Kernel:
    """128x128-supertile BCSC lowering (strategy='super').

    Host side (create time): map every (bk, bn) sub-block into its
    (128, 128) supertile, build the supertile CSC pattern and a gather map
    g (ns, 128/bk, 128/bn) of sub-block value indices (missing -> the
    appended zero block). Device side (per call): one contiguous gather
    assembles the occupied supertiles' dense values, then the Pallas
    scalar-prefetch kernel (kernels/spmm_pallas.py) runs at MXU-native
    128x128 granularity, visiting ONLY occupied supertiles.
    """
    from ..kernels import spmm_pallas

    bk, bn = config.bk, config.bn
    SB = 128
    if SB % bk or SB % bn or shape.k % SB or shape.n % SB:
        raise ValueError("strategy='super' needs bk|128, bn|128, and "
                         f"128 | (k, n) (got bk={bk} bn={bn} "
                         f"k={shape.k} n={shape.n})")
    rk, rn = SB // bk, SB // bn
    kb_s, nb_s = shape.k // SB, shape.n // SB
    nb = shape.n // bn

    # occupied supertiles in CSC (column-major) order + sub-block slots
    slots: dict = {}
    for j in range(nb):
        sj, jj = divmod(j, rn)
        for pos in range(int(indptr[j]), int(indptr[j + 1])):
            r = int(indices[pos])
            si, ii = divmod(r, rk)
            key = (sj, si)
            if key not in slots:
                slots[key] = np.full((rk, rn), nblocks, np.int32)
            slots[key][ii, jj] = pos
    skeys = sorted(slots)                       # CSC order: by sj, then si
    ns = len(skeys)
    s_indptr = np.zeros(nb_s + 1, np.int32)
    for sj, _si in skeys:
        s_indptr[sj + 1] += 1
    s_indptr = np.cumsum(s_indptr).astype(np.int32)
    s_indices = np.asarray([si for _sj, si in skeys], np.int32)
    gmap = (np.stack([slots[kq] for kq in skeys])
            if ns else np.zeros((0, rk, rn), np.int32))    # (ns, rk, rn)
    gmap_d = jax.device_put(jnp.asarray(gmap.reshape(-1)))

    pfn = spmm_pallas.build_bcsc_spmm_super(shape, s_indptr, s_indices)
    if pfn is None:
        raise ValueError("descriptor unsupported by the Pallas supertile "
                         "kernel (need m % 8 == 0, f32/bf16)")
    in_dt = to_jnp(shape.a_in_type)

    # ONE launch: assemble + spmm (+ c) fused in a single jit — separate
    # launches would each pay the backend's 1.2-14 ms dispatch cost, which
    # dwarfs a low-occupancy SpMM
    @jax.jit
    def whole(gm, sched, a, values, c=None):
        vpad = jnp.concatenate(
            [values.astype(in_dt), jnp.zeros((1, bk, bn), in_dt)], axis=0)
        sup = jnp.take(vpad, gm, axis=0).reshape(ns, rk, rn, bk, bn)
        # (ns, rk, rn, bk, bn) -> (ns, rk*bk, rn*bn) row-major supertiles
        sup = sup.transpose(0, 1, 3, 2, 4).reshape(ns, SB, SB)
        # pfn.raw takes the schedule as ARGUMENTS: calling pfn(a, sup)
        # here would bake its four schedule arrays into this outer jit as
        # closure constants (re-uploaded per call, CLAUDE.md)
        out = pfn.raw(*sched, a, sup)
        if c is not None:
            out = out + c.astype(out.dtype)
        return out

    def fn(a, values, c=None):
        if c is None:
            return whole(gmap_d, pfn.schedule, a, values)
        return whole(gmap_d, pfn.schedule, a, values, c)

    occupancy = ns / max(1, kb_s * nb_s)
    info = KernelInfo(kind="pspgemm_bcsc",
                      nflops=2 * nblocks * bk * bn * shape.m)
    return Kernel(fn=fn, descriptor=desc, info=info,
                  name=f"pspgemm_bcsc_{shape.m}x{shape.n}x{shape.k}"
                       f"_super{ns}of{kb_s * nb_s}"
                       f"_occ{int(occupancy * 100)}")


def _bcsc_autotune(shape: GemmShape, flags: GemmFlags, config: SpgemmConfig,
                   indptr: np.ndarray, indices: np.ndarray,
                   bcsc: "BcscMatrix") -> str:
    """Create-time strategy selection for BCSC SpMM.

    On TPU: build EVERY candidate lowering and microbenchmark them on
    device with the chained-timing discipline, exactly the reference's
    fsspmdm autotune-then-select pattern (libxsmm_fsspmdm.c:285-382)
    applied to the BCSC component; the pick is persisted in the autotune
    KV log keyed by the pattern fingerprint. On CPU backends (test
    harness) fall back to the roofline heuristic — interpret-mode timings
    would be meaningless.
    """
    from .. import device

    nblocks = bcsc.nblocks
    bk, bn = config.bk, config.bn
    if not device.on_tpu():
        sparse_bytes = nblocks * shape.m * bk * itemsize(shape.a_in_type)
        return ("dense" if _dense_beats_sparse(shape, sparse_bytes)
                else "sparse")

    from ..config import CONFIG
    from ..ops.fsspmdm import _autotune_cache   # lazy: avoids import cycle
    cache = _autotune_cache()
    # v2 entries carry the winning time so a later create can re-validate
    # (one bad time-share window must not poison every future process)
    key = (f"bcsc2:{shape.m}:{shape.n}:{shape.k}:{bk}:{bn}:"
           f"{shape.a_in_type.value}:{bcsc.fingerprint():x}").encode()
    cached = None                      # (pick, best_us)
    if cache is not None:
        raw = cache.get(key)
        if raw:
            try:
                pick_s, us_s = raw.decode().split(":")
                cached = (pick_s, float(us_s))
            except ValueError:
                pass

    import jax.numpy as jnp
    from ..utils.timer import bench_chain_interleaved
    rng = np.random.default_rng(0)
    in_dt = to_jnp(shape.a_in_type)
    a = jnp.asarray(rng.standard_normal((shape.m, shape.k)), in_dt)
    v = jnp.asarray(rng.standard_normal((nblocks, bk, bn)), in_dt)

    if cached is not None:
        pick, _stored_us = cached
        # Window-robust revalidation: probe the cached pick against ONE
        # rival strategy INTERLEAVED and re-tune only when the rival wins
        # the ratio by >10%. Absolute stored times are incomparable across
        # ~100x time-share windows — a 2x absolute gate flaps into a full
        # re-tune on nearly every cached create (r3 review). Rival: "dense"
        # (always available) for sparse picks; "union4" (the flagship
        # sparse lowering since r4 — fused rhs, best at both bench
        # densities) when the pick IS dense.
        rival = "dense" if pick != "dense" else "union4"
        try:
            kern = create_packed_spgemm_bcsc(shape, flags, config,
                                             indptr, indices, strategy=pick)
            try:
                rkern = create_packed_spgemm_bcsc(shape, flags, config,
                                                  indptr, indices,
                                                  strategy=rival)
            except Exception:
                return pick            # no rival buildable: keep the pick
            probes = bench_chain_interleaved(
                [(kern, (a, v), 1), (rkern, (a, v), 1)],
                reps=8, rounds=2, min_launch_s=0.02)
            if (probes[0] is not None
                    and (probes[1] is None
                         or probes[0] <= probes[1] * 1.10)):
                return pick
        except Exception:
            pass   # stale/broken entry -> full re-tune

    # full tune: build every lowering, then time them with launches
    # INTERLEAVED round-by-round (the fsspmdm discipline: ratios of
    # interleaved candidates survive any time-share window; a sequential
    # per-strategy loop hands the win to whoever drew the good window)
    cands = []
    for s in ("dense", "union", "union2", "union3", "union4", "union4a",
              "union4d", "union5", "super", "sparse", "pallas"):
        try:
            kern = create_packed_spgemm_bcsc(shape, flags, config,
                                             indptr, indices, strategy=s)
            cands.append((s, kern))
        except Exception:
            continue
    if not cands:
        return "dense"
    # chain through VALUES (the runtime operand per the reference API)
    # so loop-invariant densify cannot be hoisted — see bench.py
    times = bench_chain_interleaved(
        [(kern, (a, v), 1) for _s, kern in cands], reps=12, rounds=3)
    tuned = {s: t for (s, _k), t in zip(cands, times) if t is not None}
    if not tuned:
        return "dense"
    pick = min(tuned, key=tuned.get)
    if CONFIG.verbose >= 2:
        us = {s: round(t * 1e6, 1) for s, t in tuned.items()}
        print(f"libxsmm_tpu: bcsc {shape.m}x{shape.n}x{shape.k} "
              f"b{bk}x{bn} nblk={nblocks} -> {pick} ({us})")
    if cache is not None:
        cache.put(key, f"{pick}:{tuned[pick] * 1e6:.3f}".encode())
    return pick


def create_packed_spgemm_bcsc(shape: GemmShape,
                              flags: GemmFlags = GemmFlags.NONE,
                              config: SpgemmConfig = SpgemmConfig(),
                              column_ptr: np.ndarray = None,
                              row_idx: np.ndarray = None,
                              strategy: str = "auto") -> Kernel:
    """libxsmm_create_packed_spgemm_bcsc analogue (src/libxsmm_main.c:3640).

    kernel(a, values[, c]): a (m,k), values (nblocks, bk, bn).

    Lowerings, picked by `strategy` ("auto"|"sparse"|"dense"|"pallas"|
    "super"|"union"|"union2"|"union3"|"union4"|"union4a"|"union4d"|"union5"); "auto" microbenchmarks ALL of them on device at
    create time and keeps the winner (_bcsc_autotune, the fsspmdm
    pattern):
      * sparse: gather A panels per nonzero block -> one batched MXU matmul
        -> segment-sum per block-column. Traffic scales with
        nblocks*m*bk (A panel amplification) — wins only at low density.
      * dense: gather the blocks into a dense B and run ONE dense MXU
        matmul. The hardware-scale form of the reference's fsspmdm dense
        bias; the one to beat at moderate density.
      * pallas: scalar-prefetch pattern-driven block scheduling at the
        native (bk, bn) granularity (kernels/spmm_pallas.py).
      * super: re-block the pattern into 128x128 SUPERTILES at create time
        and run the Pallas kernel at MXU-native granularity, skipping
        empty supertiles. Beats dense when supertile occupancy
        1-(1-d)^((128/bk)*(128/bn)) is well below 1 — i.e. very sparse
        fine-grained patterns on large operands.
      * union: compact each 128-lane output column group's k-union at
        create time and contract it in ONE full-depth full-lane MXU pass
        against VMEM-resident A^T (kernels/spmm_pallas.py
        build_bcsc_spmm_union). Compute scales with union density instead
        of 1.0 — the moderate-density winner.
    """
    bk, bn = config.bk, config.bn
    indptr = np.asarray(column_ptr, np.int32)
    indices = np.asarray(row_idx, np.int32)
    # validate the blocking AT CREATE: a floored nb would silently return
    # an (m, nb*bn) result (columns missing) or fail with an opaque
    # broadcast error when c is passed
    if shape.n % bn or shape.k % bk:
        raise ValueError(f"BCSC blocking must divide the shape: "
                         f"n={shape.n} %% bn={bn}, k={shape.k} %% bk={bk}")
    nb = shape.n // bn
    if len(indptr) != nb + 1:
        raise ValueError(f"column_ptr must have n/bn+1 = {nb + 1} entries, "
                         f"got {len(indptr)}")
    _ensure_x64(shape)
    bcsc = BcscMatrix((shape.k, shape.n), bk, bn, indptr, indices)
    nblocks = bcsc.nblocks
    if strategy == "auto":
        strategy = _bcsc_autotune(shape, flags, config, indptr, indices,
                                  bcsc)
    pattern = SparsePattern(format="bcsc", rows=shape.k, cols=shape.n,
                            nnz=nblocks * bk * bn,
                            fingerprint=bcsc.fingerprint(), block=(bk, bn))
    desc = ("pspgemm_bcsc", shape, GemmFlags(flags), config, pattern,
            strategy)

    def _build(_key):
        if strategy == "super":
            return _build_bcsc_super(shape, flags, config, indptr, indices,
                                     desc, nblocks)
        if strategy in ("union", "union2", "union3", "union4", "union4a",
                        "union4d", "union5"):
            from ..kernels import spmm_pallas
            # union4a: pad the union depth so the contraction U*bk is a
            # multiple of 128 (MXU-aligned; pad slots are zero-block
            # no-ops); union4d: force the FULLY-DENSE union (U = k/bk) —
            # the fused-densify formulation whose dot is one regular
            # full-k contraction per lane group (trades union-density
            # flops for the MXU's regular-shape rate). Both are
            # compile-lottery siblings the autotuner races.
            ua = {"union4a": max(1, 128 // config.bk),
                  "union4d": max(1, shape.k // config.bk)}.get(strategy, 1)
            pfn = spmm_pallas.build_bcsc_spmm_union(
                shape, config, indptr, indices,
                double_buffer=(strategy == "union2"),
                assemble_dma=(strategy == "union3"),
                fuse_rhs=strategy.startswith("union4"),
                u_align=ua,
                # union5: fused rhs + the A-prologue overlap (A^T in HBM,
                # bulk copy landing under groups 0/1's direct-HBM panels)
                hbm_a=(strategy == "union5"))
            if pfn is None:
                raise ValueError("descriptor unsupported by the k-union "
                                 "BCSC kernel (need bn|128, 128|n, bk|k, "
                                 "f32/bf16, sublane-aligned bk/m)")

            def ufn(a, values, c=None):
                out = pfn(a, values)
                if c is not None:
                    out = out + c.astype(out.dtype)
                return out

            info = KernelInfo(kind="pspgemm_bcsc",
                              nflops=2 * nblocks * bk * bn * shape.m)
            return Kernel(fn=ufn, descriptor=desc, info=info,
                          name=f"pspgemm_bcsc_{shape.m}x{shape.n}x{shape.k}"
                               f"_{strategy}_u{pfn.union_panels}")
        if strategy == "pallas":
            from ..kernels import spmm_pallas
            pfn = spmm_pallas.build_bcsc_spmm(shape, config, indptr, indices)
            if pfn is None:
                raise ValueError("descriptor unsupported by the Pallas BCSC "
                                 "kernel; use strategy='sparse'/'dense'")

            def fn(a, values, c=None):
                out = pfn(a, values)
                if c is not None:
                    out = out + c.astype(out.dtype)
                return out

            info = KernelInfo(kind="pspgemm_bcsc",
                              nflops=2 * nblocks * bk * bn * shape.m)
            return Kernel(fn=fn, descriptor=desc, info=info,
                          name=f"pspgemm_bcsc_{shape.m}x{shape.n}x{shape.k}"
                               f"_pallas")

        rowd = jax.device_put(jnp.asarray(indices, jnp.int32))
        seg = np.repeat(np.arange(nb, dtype=np.int32), np.diff(indptr))
        segd = jax.device_put(jnp.asarray(seg))
        comp = to_jnp(shape.comp_type)
        out_dt = to_jnp(shape.out_type)
        prec = matmul_precision(shape)
        kb = shape.k // bk
        # dense strategy: densify via a create-time GATHER map (pattern is
        # a create-time constant). Each gathered slice is a contiguous
        # (bk, bn) block, which the TPU moves as bulk copies; the previous
        # .at[].set scatter was element-wise and ~100x slower per call.
        gmap = np.full((kb, nb), nblocks, np.int32)   # nblocks -> zero block
        for j in range(nb):
            gmap[indices[indptr[j]:indptr[j + 1]], j] = np.arange(
                indptr[j], indptr[j + 1], dtype=np.int32)
        gmapd = jax.device_put(jnp.asarray(gmap.reshape(-1)))
        # one-pass Pallas densifier when the value store fits VMEM (the
        # XLA take+transpose chain costs ~a matmul per call, r3 probe)
        densifier = None
        if strategy == "dense":
            from ..kernels import spmm_pallas
            densifier = spmm_pallas.build_bcsc_densify(shape, config,
                                                       indptr, indices)

        @jax.named_scope(f"xsmm_pspgemm_bcsc_{shape.m}x{shape.n}x{shape.k}"
                         f"_b{bk}x{bn}_nb{nblocks}_{strategy}")
        def run(rowj, segj, gmapj, a, values, c=None):
            if strategy == "dense":
                if densifier is not None:
                    bdense = densifier(gmapj, values)
                else:
                    vpad = jnp.concatenate(
                        [values, jnp.zeros((1, bk, bn), values.dtype)],
                        axis=0)
                    dense = jnp.take(vpad, gmapj, axis=0).reshape(
                        kb, nb, bk, bn)
                    bdense = dense.transpose(0, 2, 1, 3).reshape(shape.k,
                                                                 shape.n)
                acc = jax.lax.dot_general(
                    a, bdense.astype(a.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=comp, precision=prec)
            else:
                # A panels: (m, k) -> (kb, m, bk) -> gather by block row
                panels = a.reshape(shape.m, kb, bk).transpose(1, 0, 2)
                pa = jnp.take(panels, rowj, axis=0)          # (nblk, m, bk)
                pb = jnp.einsum("bmk,bkn->bmn", pa.astype(comp),
                                values.astype(comp),
                                precision=prec)              # batched MXU
                acc = jax.ops.segment_sum(pb, segj, num_segments=nb)
                acc = acc.transpose(1, 0, 2).reshape(shape.m, nb * bn)
            if c is not None:
                acc = acc + c.astype(comp)
            return acc.astype(out_dt)

        jitted = jax.jit(run)

        def fn(a, values, c=None):
            # schedule/gather arrays ride as device-resident ARGUMENTS,
            # not jit closure constants (constants re-upload per call)
            if c is None:
                return jitted(rowd, segd, gmapd, a, values)
            return jitted(rowd, segd, gmapd, a, values, c)

        nflops = 2 * nblocks * bk * bn * shape.m
        info = KernelInfo(kind="pspgemm_bcsc", nflops=nflops)
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"pspgemm_bcsc_{shape.m}x{shape.n}x{shape.k}"
                           f"_{strategy}")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# CSR A-in-"registers": values baked at trace time (fsspmdm backend)
# ---------------------------------------------------------------------------

# cap on baked pattern size, mirroring the reference's 65,536-op limit
# (generator_spgemm_csr_asparse_reg.c:23)
MAX_BAKED_NNZ = 65536


def create_spgemm_csr_areg(shape: GemmShape,
                           flags: GemmFlags = GemmFlags.NONE,
                           row_ptr: np.ndarray = None,
                           column_idx: np.ndarray = None,
                           values: np.ndarray = None) -> Kernel:
    """libxsmm_create_spgemm_csr_areg analogue (src/libxsmm_main.c:3842).

    Pattern AND values are trace-time constants. The reference additionally
    DEDUPLICATES unique |values| to fit them in vector registers
    (generator_spgemm_csr_asparse_reg.c:66-96) — that optimization does not
    port: on TPU the baked values live in VMEM as a device-resident array,
    where duplicates cost nothing (there is no register-count ceiling to
    stay under). The 65,536-nnz cap is kept as the compile-size guard.
    kernel(b[, c]) -> (m, n).
    """
    _ensure_x64(shape)
    csr = CsrMatrix((shape.m, shape.k), np.asarray(row_ptr, np.int32),
                    np.asarray(column_idx, np.int32),
                    np.asarray(values))
    if csr.nnz > MAX_BAKED_NNZ:
        raise ValueError(f"nnz {csr.nnz} exceeds baked-kernel cap "
                         f"{MAX_BAKED_NNZ}")
    pattern = SparsePattern(format="csr", rows=shape.m, cols=shape.k,
                            nnz=csr.nnz,
                            fingerprint=csr.fingerprint(include_values=True))
    desc = ("spgemm_areg", shape, GemmFlags(flags), pattern)

    def _build(_key):
        col, pos, mask, rmax = csr.ell()
        # nnz==0: the all-zero mask makes the gather irrelevant, but the
        # size-0 value array cannot be indexed — bake zeros directly
        vals_ell = ((csr.data[pos.reshape(-1)].reshape(shape.m, rmax)
                     * mask) if csr.nnz else
                    np.zeros((shape.m, rmax), np.float32))   # baked values
        valsd = jax.device_put(jnp.asarray(vals_ell, to_jnp(shape.comp_type)))
        cold = jax.device_put(jnp.asarray(col.reshape(-1)))
        comp = to_jnp(shape.comp_type)
        out_dt = to_jnp(shape.out_type)

        @jax.named_scope(f"xsmm_spgemm_areg_{shape.m}x{shape.n}x{shape.k}"
                         f"_nnz{csr.nnz}")
        def run(valsj, colj, b, c=None):
            gb = jnp.take(b, colj, axis=0)
            gb = gb.reshape(shape.m, rmax, shape.n).astype(comp)
            # f32 contraction must not drop to bf16 MXU passes
            # (matmul_precision policy, CLAUDE.md)
            acc = jnp.einsum("mr,mrn->mn", valsj, gb,
                             precision=matmul_precision(shape))
            if c is not None:
                acc = acc + c.astype(comp)
            return acc.astype(out_dt)

        jitted = jax.jit(run)

        def fn(b, c=None):
            if c is None:
                return jitted(valsd, cold, b)
            return jitted(valsd, cold, b, c)

        info = KernelInfo(kind="spgemm_areg", nflops=2 * csr.nnz * shape.n)
        return Kernel(fn=fn, descriptor=desc, info=info,
                      name=f"spgemm_areg_{shape.m}x{shape.n}x{shape.k}")

    return get_registry().dispatch(desc, _build)


# ---------------------------------------------------------------------------
# BSR (block-CSR): the distribution currency for multi-chip SpMM
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BsrMatrix:
    """Host block-CSR: (br x bc) dense blocks, block-row major.

    Used by parallel.spmm_dist to block-row-partition a sparse matrix over a
    device mesh (SURVEY.md §2.6/§5.7: the new multi-host dimension).
    """

    shape: Tuple[int, int]          # (m, k) element dims
    br: int
    bc: int
    indptr: np.ndarray              # (m//br + 1,) block-row pointers
    indices: np.ndarray             # (nblocks,) block-col ids
    data: Optional[np.ndarray] = None   # (nblocks, br, bc)

    @property
    def nblocks(self) -> int:
        return len(self.indices)

    @property
    def nnz(self) -> int:
        """Stored element count (blocks are dense)."""
        return self.nblocks * self.br * self.bc

    @staticmethod
    def from_dense(a, br: int, bc: int, tol: float = 0.0) -> "BsrMatrix":
        a = np.asarray(a)
        m, k = a.shape
        if m % br or k % bc:
            raise ValueError(f"dims ({m},{k}) not divisible by block "
                             f"({br},{bc})")
        mb, kb = m // br, k // bc
        blocks = a.reshape(mb, br, kb, bc).transpose(0, 2, 1, 3)  # (mb,kb,br,bc)
        nz = np.abs(blocks).max(axis=(2, 3)) > tol
        indptr = np.zeros(mb + 1, np.int32)
        indptr[1:] = np.cumsum(nz.sum(axis=1))
        indices = np.nonzero(nz)[1].astype(np.int32)
        data = blocks[nz]
        return BsrMatrix((m, k), br, bc, indptr, indices, data)

    def to_dense(self) -> np.ndarray:
        m, k = self.shape
        out = np.zeros((m, k), self.data.dtype)
        for ib in range(m // self.br):
            s, e = int(self.indptr[ib]), int(self.indptr[ib + 1])
            for l in range(s, e):
                jb = int(self.indices[l])
                out[ib * self.br:(ib + 1) * self.br,
                    jb * self.bc:(jb + 1) * self.bc] = self.data[l]
        return out

    def fingerprint(self, include_values: bool = False) -> int:
        return SparsePattern.fingerprint_of(
            self.indptr, self.indices, np.asarray([self.br, self.bc]),
            values=self.data if include_values else None)
