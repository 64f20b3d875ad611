"""Numerical parity on the REFERENCE's real sample matrices.

BASELINE.md names the PyFR/EDGE `.mtx` operator sets as the
numerical-parity target; the reference snapshot bundles them
(samples/xgemm_sparse_Ainregs/mats, samples/xgemm_norm_packed/mats) and we
read them in place — nothing is copied. Mirrors tests/fsspmdm.sh (real
PyFR operators through fsspmdm with randomized hints) and the
xgemm_norm_packed CSR/CSC drivers on EDGE matrices.
"""

import numpy as np
import pytest

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import GemmFlags, GemmShape
from libxsmm_tpu.matdiff import matdiff
from libxsmm_tpu.utils import testmats

RNG = np.random.default_rng(11)

pyfr_needed = pytest.mark.skipif(
    not testmats.have_reference_pyfr_mats(),
    reason="reference PyFR matrix set not present")
edge_needed = pytest.mark.skipif(
    not testmats.have_reference_edge_mats(),
    reason="reference EDGE matrix set not present")


@pyfr_needed
@pytest.mark.parametrize("hint", [0, 1, 2], ids=["auto", "sparse", "dense"])
def test_fsspmdm_real_pyfr_operators(hint, monkeypatch):
    """Every real p3/hex operator through fsspmdm under each hint
    (the reference's tests/fsspmdm.sh randomizes LIBXSMM_FSSPMDM_HINT)."""
    from libxsmm_tpu.ops.fsspmdm import fsspmdm_create

    monkeypatch.setenv("XSMM_TPU_FSSPMDM_HINT", str(hint))
    n = 192
    for name, a in testmats.reference_pyfr_operators(orders=("p3",),
                                                     elems=("hex",)):
        a = a.astype(np.float32)
        m, k = a.shape
        h = fsspmdm_create(n, a)
        b = RNG.standard_normal((k, n)).astype(np.float32)
        got = np.asarray(h.execute(b), np.float64)
        want = a.astype(np.float64) @ b.astype(np.float64)
        d = matdiff(want, got)
        assert d.normf_rel < 1e-5, f"{name} hint={hint}: {d.normf_rel}"


@pyfr_needed
def test_fsspmdm_real_pyfr_alpha_beta():
    from libxsmm_tpu.ops.fsspmdm import fsspmdm_create

    ops = dict(testmats.reference_pyfr_operators(orders=("p4",),
                                                 elems=("hex",)))
    a = ops["p4/hex/m3-sp"].astype(np.float32)
    m, k = a.shape
    n = 64
    b = RNG.standard_normal((k, n)).astype(np.float32)
    c = RNG.standard_normal((m, n)).astype(np.float32)
    h = fsspmdm_create(n, a, alpha=2.5, beta=1)
    got = np.asarray(h.execute(b, c), np.float64)
    want = 2.5 * a.astype(np.float64) @ b.astype(np.float64) + c
    assert matdiff(want, got).normf_rel < 1e-5


@pyfr_needed
def test_csr_areg_real_pyfr_tet():
    """Values-baked CSR kernel (the reference's A-in-registers backend) on
    real tet operators."""
    from libxsmm_tpu.ops.sparse import CsrMatrix, create_spgemm_csr_areg

    for name, a in testmats.reference_pyfr_operators(orders=("p2",),
                                                     elems=("tet",)):
        a = a.astype(np.float64)
        m, k = a.shape
        csr = CsrMatrix.from_dense(a)
        n = 48
        kern = create_spgemm_csr_areg(
            GemmShape(m, n, k), GemmFlags.BETA_0,
            csr.indptr, csr.indices, csr.data)
        b = RNG.standard_normal((k, n))
        got = np.asarray(kern(b.astype(np.float32)), np.float64)
        want = a @ b
        assert matdiff(want, got).normf_rel < 1e-5, name


@edge_needed
def test_packed_spgemm_real_edge_matrices():
    """Packed SpGEMM CSR (A-sparse, SOA packed B) on real EDGE seismic
    matrices — the xgemm_norm_packed driver's workload."""
    from libxsmm_tpu.ops.sparse import CsrMatrix, create_packed_spgemm_csr

    ops = [(name, a) for name, a in
           testmats.reference_edge_operators(fmt="csr")
           if a.shape[0] >= 10][:6]
    assert ops, "no usable EDGE matrices found"
    p = 8                       # packed (SOA) width
    for name, a in ops:
        a = a.astype(np.float32)
        m, k = a.shape
        n = 24
        csr = CsrMatrix.from_dense(a)
        kern = create_packed_spgemm_csr(
            GemmShape(m, n, k), GemmFlags.BETA_0, packed_width=p,
            row_ptr=csr.indptr, column_idx=csr.indices)
        b = RNG.standard_normal((k, n, p)).astype(np.float32)
        got = np.asarray(kern(csr.data.astype(np.float32), b), np.float64)
        want = np.einsum("mk,knp->mnp", a.astype(np.float64),
                         b.astype(np.float64))
        assert matdiff(want, got).normf_rel < 1e-5, name


@edge_needed
def test_packed_spgemm_bsparse_csparse_real_edge_matrices():
    """The two reference routings added in r3 — CSR B-sparse and CSC
    C-sparse (SDDMM) — on real EDGE patterns (generator_packed_spgemm.c
    ldb==0 / ldc==0 paths)."""
    from libxsmm_tpu.ops.sparse import (
        CscMatrix, CsrMatrix, create_packed_spgemm_csc_csparse,
        create_packed_spgemm_csr_bsparse)

    ops = [(name, a) for name, a in
           testmats.reference_edge_operators(fmt="csr")
           if a.shape[0] >= 10][:4]
    assert ops, "no usable EDGE matrices found"
    for name, mat in ops:
        mat = mat.astype(np.float32)
        k, n = mat.shape
        m = 16
        # B-sparse: EDGE matrix as the sparse B in CSR
        csr = CsrMatrix.from_dense(mat)
        kern = create_packed_spgemm_csr_bsparse(
            GemmShape(m, n, k), GemmFlags.BETA_0,
            row_ptr=csr.indptr, column_idx=csr.indices)
        a = RNG.standard_normal((m, k)).astype(np.float32)
        got = np.asarray(kern(a, csr.data.astype(np.float32)), np.float64)
        want = a.astype(np.float64) @ mat.astype(np.float64)
        assert matdiff(want, got).normf_rel < 1e-5, name
        # C-sparse: EDGE pattern as the sampled output pattern (SDDMM)
        csc = CscMatrix.from_dense(mat)
        kern2 = create_packed_spgemm_csc_csparse(
            GemmShape(k, n, m), GemmFlags.BETA_0,
            column_ptr=csc.indptr, row_idx=csc.indices)
        a2 = RNG.standard_normal((k, m)).astype(np.float32)
        b2 = RNG.standard_normal((m, n)).astype(np.float32)
        dense = a2.astype(np.float64) @ b2.astype(np.float64)
        cols = np.repeat(np.arange(n), np.diff(csc.indptr))
        want2 = dense[csc.indices, cols]
        got2 = np.asarray(kern2(a2, b2), np.float64)
        assert matdiff(want2, got2).normf_rel < 1e-5, name
