"""Sparse SpGEMM + fsspmdm tests — randomized patterns vs NumPy oracle.

Models samples/xgemm_sparse (BCSC B-sparse), xgemm_norm_packed (packed
CSR/CSC) and tests/fsspmdm.sh (hint randomization), SURVEY.md §2.7/§4.
"""

import numpy as np
import pytest

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import GemmFlags, GemmShape, SpgemmConfig
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import check
from libxsmm_tpu.ops.fsspmdm import (fsspmdm_create, fsspmdm_destroy,
                                     fsspmdm_execute)
from libxsmm_tpu.ops.sparse import (BcscMatrix, CscMatrix, CsrMatrix,
                                    create_packed_spgemm_bcsc,
                                    create_packed_spgemm_csc,
                                    create_packed_spgemm_csr,
                                    create_spgemm_csr_areg)

RNG = np.random.default_rng(99)


def _sparse_dense(m, k, density=0.3):
    a = RNG.standard_normal((m, k)).astype(np.float32)
    a[RNG.random((m, k)) >= density] = 0.0
    return a


# ---------------------------------------------------------------------------
# host containers
# ---------------------------------------------------------------------------

def test_csr_roundtrip():
    a = _sparse_dense(13, 9)
    csr = CsrMatrix.from_dense(a)
    np.testing.assert_array_equal(csr.to_dense(), a)
    assert csr.nnz == np.count_nonzero(a)
    # fingerprint is pattern-only unless values included
    a2 = a * 2
    assert (CsrMatrix.from_dense(a2).fingerprint()
            == csr.fingerprint())
    assert (CsrMatrix.from_dense(a2).fingerprint(include_values=True)
            != csr.fingerprint(include_values=True))


def test_bcsc_roundtrip():
    b = _sparse_dense(16, 24, 0.4)
    # zero whole blocks to create block sparsity
    bm = BcscMatrix.from_dense(b, bk=4, bn=8)
    np.testing.assert_array_equal(bm.to_dense(), b)


def test_bcsc_bad_blocks():
    with pytest.raises(ValueError):
        BcscMatrix.from_dense(np.ones((10, 10)), bk=3, bn=5)


# ---------------------------------------------------------------------------
# packed SpGEMM CSR (A sparse)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,n,k,density", [(16, 24, 12, 0.3),
                                           (13, 5, 7, 0.5),
                                           (8, 128, 32, 0.1)])
def test_pspgemm_csr(m, n, k, density):
    a = _sparse_dense(m, k, density)
    csr = CsrMatrix.from_dense(a)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    kern = create_packed_spgemm_csr(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        row_ptr=csr.indptr, column_idx=csr.indices)
    check(a @ b, np.asarray(kern(csr.data, b)), margin=1e-4)
    # same values but scaled: pattern reused, new values at runtime
    check(2 * (a @ b), np.asarray(kern(2 * csr.data, b)), margin=1e-4)


def test_pspgemm_csr_packed_width():
    m, n, k, p = 8, 6, 10, 4
    a = _sparse_dense(m, k, 0.4)
    csr = CsrMatrix.from_dense(a)
    b = RNG.standard_normal((k, n, p)).astype(np.float32)
    kern = create_packed_spgemm_csr(
        GemmShape(m, n, k), GemmFlags.BETA_0, packed_width=p,
        row_ptr=csr.indptr, column_idx=csr.indices)
    ref = np.einsum("mk,knp->mnp", a, b)
    check(ref, np.asarray(kern(csr.data, b)), margin=1e-4)


def test_pspgemm_csr_beta1():
    m, n, k = 9, 7, 11
    a = _sparse_dense(m, k, 0.4)
    csr = CsrMatrix.from_dense(a)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    c = RNG.standard_normal((m, n)).astype(np.float32)
    kern = create_packed_spgemm_csr(GemmShape(m, n, k),
                                    row_ptr=csr.indptr,
                                    column_idx=csr.indices)
    check(a @ b + c, np.asarray(kern(csr.data, b, c)), margin=1e-4)


def test_pspgemm_pattern_cache():
    m, n, k = 8, 8, 8
    a = _sparse_dense(m, k, 0.4)
    csr = CsrMatrix.from_dense(a)
    k1 = create_packed_spgemm_csr(GemmShape(m, n, k), GemmFlags.BETA_0,
                                  row_ptr=csr.indptr,
                                  column_idx=csr.indices)
    k2 = create_packed_spgemm_csr(GemmShape(m, n, k), GemmFlags.BETA_0,
                                  row_ptr=csr.indptr,
                                  column_idx=csr.indices)
    assert k1 is k2   # identical pattern fingerprint -> cached kernel


# ---------------------------------------------------------------------------
# packed SpGEMM CSC (B sparse)
# ---------------------------------------------------------------------------

def test_pspgemm_csc():
    m, n, k = 12, 10, 8
    b = _sparse_dense(k, n, 0.3)
    csc = CscMatrix.from_dense(b)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_csc(GemmShape(m, n, k), GemmFlags.BETA_0,
                                    column_ptr=csc.indptr,
                                    row_idx=csc.indices)
    check(a @ b, np.asarray(kern(a, csc.data)), margin=1e-4)


def test_pspgemm_csc_packed():
    m, n, k, p = 6, 8, 10, 2
    b = _sparse_dense(k, n, 0.4)
    csc = CscMatrix.from_dense(b)
    a = RNG.standard_normal((m, k, p)).astype(np.float32)
    kern = create_packed_spgemm_csc(GemmShape(m, n, k), GemmFlags.BETA_0,
                                    packed_width=p,
                                    column_ptr=csc.indptr,
                                    row_idx=csc.indices)
    ref = np.einsum("mkp,kn->mnp", a, b)
    check(ref, np.asarray(kern(a, csc.data)), margin=1e-4)


# ---------------------------------------------------------------------------
# BCSC (B block-sparse, MXU path)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bk,bn", [(4, 4), (8, 16)])
def test_pspgemm_bcsc(bk, bn):
    m, k, n = 32, 32, 64
    b = _sparse_dense(k, n, 0.2)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    bd = bm.to_dense()
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_bcsc(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        SpgemmConfig(packed_width=1, bk=bk, bn=bn),
        column_ptr=bm.indptr, row_idx=bm.indices)
    check(a @ bd, np.asarray(kern(a, bm.data)), margin=1e-4)


def test_pspgemm_bcsc_bf16():
    import jax.numpy as jnp
    m, k, n, bk, bn = 32, 32, 32, 8, 8
    b = _sparse_dense(k, n, 0.3)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    kern = create_packed_spgemm_bcsc(
        shape, GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        column_ptr=bm.indptr, row_idx=bm.indices)
    ab = jnp.asarray(a, jnp.bfloat16)
    vb = jnp.asarray(bm.data, jnp.bfloat16)
    ref = (np.asarray(ab, np.float32) @
           BcscMatrix((k, n), bk, bn, bm.indptr, bm.indices,
                      np.asarray(vb, np.float32)).to_dense())
    check(ref, np.asarray(kern(ab, vb)), dtype_name="bf16")


def test_pspgemm_bcsc_bf16_out_all_strategies():
    """bf16 OUTPUT through every Pallas lowering: Mosaic requires 32-bit
    matmul accumulators, so a bf16 o_ref previously failed TPU compile
    (r3 probe; interpret mode hides it). Kernels now accumulate f32 and
    cast on store — value-check each strategy with a bf16 out_type."""
    import jax.numpy as jnp
    m, k, n, bk, bn = 64, 128, 128, 32, 32
    b = _sparse_dense(k, n, 0.3)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.BF16)
    ab = jnp.asarray(a, jnp.bfloat16)
    vb = jnp.asarray(bm.data, jnp.bfloat16)
    ref = (np.asarray(ab.astype(jnp.float32)) @
           BcscMatrix((k, n), bk, bn, bm.indptr, bm.indices,
                      np.asarray(vb.astype(jnp.float32))).to_dense())
    for strat in ("dense", "union", "union2", "union4", "union4a",
                  "pallas", "super", "sparse"):
        kern = create_packed_spgemm_bcsc(
            shape, GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
            column_ptr=bm.indptr, row_idx=bm.indices, strategy=strat)
        got = np.asarray(jnp.asarray(kern(ab, vb)).astype(jnp.float32))
        check(ref, got, dtype_name="bf16")


def test_pspgemm_bcsc_union2_multi_group():
    """union2 (double-buffered scratch) over an ODD number of 128-lane
    column groups: exercises the g==0 prologue, both parity branches, and
    the no-prefetch guard on the final group."""
    m, k, n, bk, bn = 32, 256, 384, 32, 32        # nsg = 3
    b = _sparse_dense(k, n, 0.25)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    shape = GemmShape(m, n, k)
    want = a @ bm.to_dense()
    for strat in ("union", "union2", "union4", "union4a"):
        kern = create_packed_spgemm_bcsc(
            shape, GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
            column_ptr=bm.indptr, row_idx=bm.indices, strategy=strat)
        assert strat in kern.name
        check(want, np.asarray(kern(a, bm.data)), margin=1e-4)
    # union5's manual HBM panel DMAs need a 128-aligned m-tile; at tm=32
    # the builder must REFUSE (a Mosaic compile crash on hardware
    # otherwise — interpret CI hides it), so the create raises
    with pytest.raises(ValueError):
        create_packed_spgemm_bcsc(
            shape, GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
            column_ptr=bm.indptr, row_idx=bm.indices, strategy="union5")


# ---------------------------------------------------------------------------
# csr_areg (values baked)
# ---------------------------------------------------------------------------

def test_spgemm_areg():
    m, n, k = 16, 48, 12
    a = _sparse_dense(m, k, 0.25)
    csr = CsrMatrix.from_dense(a)
    kern = create_spgemm_csr_areg(GemmShape(m, n, k), GemmFlags.BETA_0,
                                  csr.indptr, csr.indices, csr.data)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    check(a @ b, np.asarray(kern(b)), margin=1e-4)
    # values baked -> different values = different kernel
    kern2 = create_spgemm_csr_areg(GemmShape(m, n, k), GemmFlags.BETA_0,
                                   csr.indptr, csr.indices, 2 * csr.data)
    assert kern2 is not kern
    check(2 * (a @ b), np.asarray(kern2(b)), margin=1e-4)


def test_spgemm_areg_nnz_cap():
    m = k = 300
    a = np.ones((m, k), np.float32)   # 90000 nnz > 65536 cap
    csr = CsrMatrix.from_dense(a)
    with pytest.raises(ValueError):
        create_spgemm_csr_areg(GemmShape(m, 8, k), GemmFlags.BETA_0,
                               csr.indptr, csr.indices, csr.data)


# ---------------------------------------------------------------------------
# fsspmdm
# ---------------------------------------------------------------------------

def test_fsspmdm_auto():
    m, k, n = 25, 27, 96
    a = _sparse_dense(m, k, 0.2).astype(np.float64)
    h = fsspmdm_create(n, a, alpha=1.0, beta=0)
    b = RNG.standard_normal((k, n))
    check(a @ b, np.asarray(h.execute(b)), dtype_name="f64", margin=1e-10)
    assert h.kind in ("dense", "sparse")
    assert h.nnz == np.count_nonzero(a)
    fsspmdm_destroy(h)


def test_fsspmdm_alpha_beta():
    m, k, n = 10, 12, 32
    a = _sparse_dense(m, k, 0.3)
    h = fsspmdm_create(n, a, alpha=-2.0, beta=1)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    c = RNG.standard_normal((m, n)).astype(np.float32)
    check(-2.0 * (a @ b) + c, np.asarray(fsspmdm_execute(h, b, c)),
          margin=1e-4)


def test_fsspmdm_hint_override(monkeypatch):
    from libxsmm_tpu.config import CONFIG
    m, k, n = 8, 8, 16
    a = _sparse_dense(m, k, 0.3)
    monkeypatch.setattr(CONFIG, "fsspmdm_hint", 1)
    h = fsspmdm_create(n, a)
    assert h.kind == "sparse"
    monkeypatch.setattr(CONFIG, "fsspmdm_hint", 2)
    h = fsspmdm_create(n, a)
    assert h.kind == "dense"


def test_fsspmdm_bad_beta():
    with pytest.raises(ValueError):
        fsspmdm_create(8, np.ones((4, 4), np.float32), beta=2)


# ---------------------------------------------------------------------------
# mtx reader roundtrip
# ---------------------------------------------------------------------------

def test_mtx_roundtrip(tmp_path):
    from libxsmm_tpu.utils.mtx import read_mtx, write_mtx
    a = _sparse_dense(9, 5, 0.4).astype(np.float64)
    p = str(tmp_path / "t.mtx")
    write_mtx(p, a)
    np.testing.assert_allclose(read_mtx(p), a, rtol=1e-15)


def test_fsspmdm_autotune_cache(tmp_path, monkeypatch):
    from libxsmm_tpu import native_bridge
    if native_bridge.load() is None:
        pytest.skip("native lib unavailable")
    from libxsmm_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "autotune_cache_path",
                        str(tmp_path / "tune.xkv"))
    m, k, n = 8, 8, 32
    a = _sparse_dense(m, k, 0.3)
    h1 = fsspmdm_create(n, a)
    assert "cached" not in h1.tuned_us
    h2 = fsspmdm_create(n, a)          # same matrix -> cached decision
    assert h2.tuned_us.get("cached") is True
    assert h2.kind == h1.kind
    b = RNG.standard_normal((k, n)).astype(np.float32)
    check(a @ b, np.asarray(h2.execute(b)), margin=1e-4)


@pytest.mark.parametrize("strategy", ["sparse", "dense"])
def test_pspgemm_bcsc_strategies_agree(strategy):
    m, k, n, bk, bn = 16, 32, 32, 8, 8
    b = _sparse_dense(k, n, 0.3)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_bcsc(
        GemmShape(m, n, k), GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        column_ptr=bm.indptr, row_idx=bm.indices, strategy=strategy)
    assert strategy in kern.name
    check(a @ bm.to_dense(), np.asarray(kern(a, bm.data)), margin=1e-4)


@pytest.mark.parametrize("strategy", ["sparse", "dense"])
def test_pspgemm_csr_strategies_agree(strategy):
    m, n, k = 16, 24, 12
    a = _sparse_dense(m, k, 0.3)
    csr = CsrMatrix.from_dense(a)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    kern = create_packed_spgemm_csr(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        row_ptr=csr.indptr, column_idx=csr.indices, strategy=strategy)
    check(a @ b, np.asarray(kern(csr.data, b)), margin=1e-4)
    # packed width through the dense path too
    p = 2
    bp = RNG.standard_normal((k, n, p)).astype(np.float32)
    kp = create_packed_spgemm_csr(
        GemmShape(m, n, k), GemmFlags.BETA_0, packed_width=p,
        row_ptr=csr.indptr, column_idx=csr.indices, strategy=strategy)
    check(np.einsum("mk,knp->mnp", a, bp), np.asarray(kp(csr.data, bp)),
          margin=1e-4)


def test_pspgemm_bcsc_pallas_strategy():
    m, k, n, bk, bn = 32, 32, 64, 8, 8
    b = _sparse_dense(k, n, 0.25)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_bcsc(
        GemmShape(m, n, k), GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        column_ptr=bm.indptr, row_idx=bm.indices, strategy="pallas")
    assert "pallas" in kern.name
    check(a @ bm.to_dense(), np.asarray(kern(a, bm.data)), margin=1e-4)


def test_pspgemm_bcsc_pallas_empty_columns():
    # a pattern with fully empty block-columns must still produce zeros
    m, k, n, bk, bn = 16, 16, 32, 8, 8
    b = np.zeros((k, n), np.float32)
    b[:8, :8] = RNG.standard_normal((8, 8))     # only block-col 0 occupied
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_bcsc(
        GemmShape(m, n, k), GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        column_ptr=bm.indptr, row_idx=bm.indices, strategy="pallas")
    out = np.asarray(kern(a, bm.data))
    check(a @ b, out, margin=1e-4)
    assert np.all(out[:, 8:] == 0)


def test_pspgemm_bcsc_pallas_m_not_tile_multiple():
    # m=384 > the 256-row tile cap but NOT a multiple of 256: the shared
    # _pick_m_tile rule serves it with a 192-row tile (the old per-kernel
    # `min(m, 256)` exact-divisor check rejected the shape outright)
    m, k, n, bk, bn = 384, 32, 64, 8, 8
    b = _sparse_dense(k, n, 0.25)
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_bcsc(
        GemmShape(m, n, k), GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        column_ptr=bm.indptr, row_idx=bm.indices, strategy="pallas")
    assert "pallas" in kern.name
    check(a @ bm.to_dense(), np.asarray(kern(a, bm.data)), margin=1e-4)


def test_pspgemm_bcsc_i8_i32():
    import jax.numpy as jnp
    m, k, n, bk, bn = 32, 32, 32, 8, 8
    bq = RNG.integers(-50, 50, (k, n)).astype(np.int8)
    keep = RNG.random((k // bk, n // bn)) < 0.5
    bq *= np.kron(keep, np.ones((bk, bn), np.int8))
    bm = BcscMatrix.from_dense(bq.astype(np.float32), bk=bk, bn=bn)
    aq = RNG.integers(-50, 50, (m, k)).astype(np.int8)
    shape = GemmShape(m, n, k, a_in_type=Datatype.I8, b_in_type=Datatype.I8,
                      out_type=Datatype.I32, comp_type=Datatype.I32)
    kern = create_packed_spgemm_bcsc(
        shape, GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        column_ptr=bm.indptr, row_idx=bm.indices, strategy="dense")
    out = np.asarray(kern(jnp.asarray(aq),
                          jnp.asarray(bm.data.astype(np.int8))))
    ref = aq.astype(np.int32) @ bm.to_dense().astype(np.int32)
    np.testing.assert_array_equal(ref, out)


def test_reduce_init_acc():
    from libxsmm_tpu.descriptor import UnaryFlags, UnaryType
    m, n = 6, 8
    x = _sparse_dense(m, n, 1.0)
    acc0 = RNG.standard_normal((1, n)).astype(np.float32)
    kern = xt.dispatch_meltw_unary(
        UnaryType.REDUCE_X_OP_ADD, m, n,
        UnaryFlags.REDUCE_COLS | UnaryFlags.REDUCE_INIT_ACC)
    check(x.sum(axis=0, keepdims=True) + acc0, np.asarray(kern(x, acc0)),
          margin=1e-5)


@pytest.mark.parametrize("p", [2, 3])
def test_fsspmdm_spectral_element_operators(p):
    """The north-star workload on synthetic PyFR-class operators
    (tensor-product hex derivative + face interpolation)."""
    from libxsmm_tpu.utils.testmats import (hex_derivative_operator,
                                            hex_interp_operator)
    n = 192
    for op in (hex_derivative_operator(p, axis=1),
               hex_interp_operator(p)):
        dens = np.count_nonzero(op) / op.size
        assert dens < 0.6            # genuinely sparse
        h = fsspmdm_create(n, op.astype(np.float64))
        b = RNG.standard_normal((op.shape[1], n))
        check(op @ b, np.asarray(h.execute(b)), dtype_name="f64",
              margin=1e-9)


def test_spgemm_areg_edge_matrix():
    """EDGE-class flux matrix with few unique values through the
    values-baked kernel (the reference's dedup-unique-values target)."""
    from libxsmm_tpu.utils.testmats import edge_fluxmatrix
    a = edge_fluxmatrix(20, 35, seed=3)
    csr = CsrMatrix.from_dense(a)
    assert len(np.unique(np.abs(csr.data))) <= 16
    kern = create_spgemm_csr_areg(GemmShape(20, 64, 35), GemmFlags.BETA_0,
                                  csr.indptr, csr.indices, csr.data)
    b = RNG.standard_normal((35, 64)).astype(np.float32)
    check(a @ b, np.asarray(kern(b)), margin=1e-4)


def test_pspgemm_bcsc_super_strategy():
    # 128x128 supertile re-blocking matches the dense oracle
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    m, k, n, bk, bn = 64, 256, 256, 32, 32
    bmat = rng.standard_normal((k, n)).astype(np.float32)
    keep = rng.random((k // bk, n // bn)) < 0.15
    bmat *= np.kron(keep, np.ones((bk, bn), np.float32))
    bcsc = BcscMatrix.from_dense(bmat, bk, bn)
    shape = GemmShape(m, n, k)
    kern = create_packed_spgemm_bcsc(shape, GemmFlags.BETA_0,
                                     SpgemmConfig(1, bk, bn),
                                     column_ptr=bcsc.indptr,
                                     row_idx=bcsc.indices,
                                     strategy="super")
    assert "_super" in kern.name
    a = rng.standard_normal((m, k)).astype(np.float32)
    got = np.asarray(kern(a, jnp.asarray(bcsc.data)))
    check(a @ bmat, got, margin=1e-4)
    # beta=1 epilogue
    c = rng.standard_normal((m, n)).astype(np.float32)
    got_c = np.asarray(kern(a, jnp.asarray(bcsc.data), c))
    check(a @ bmat + c, got_c, margin=1e-4)


def test_pspgemm_bcsc_super_rejects_bad_shapes():
    import pytest
    with pytest.raises(ValueError):
        create_packed_spgemm_bcsc(
            GemmShape(64, 192, 192), GemmFlags.BETA_0,
            SpgemmConfig(1, 32, 32),
            column_ptr=np.zeros(7, np.int32),
            row_idx=np.zeros(0, np.int32), strategy="super")


# ---------------------------------------------------------------------------
# packed SpGEMM CSR B-sparse (the reference's ldb==0 routing)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("strategy", ["sparse", "dense"])
@pytest.mark.parametrize("m,n,k,density", [(16, 24, 12, 0.3),
                                           (13, 5, 7, 0.5)])
def test_pspgemm_csr_bsparse(m, n, k, density, strategy):
    from libxsmm_tpu.ops.sparse import create_packed_spgemm_csr_bsparse

    b = _sparse_dense(k, n, density)
    # CSR over B: row_ptr along k, column_idx in [0, n)
    csr = CsrMatrix.from_dense(b)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_csr_bsparse(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        row_ptr=csr.indptr, column_idx=csr.indices, strategy=strategy)
    check(a @ b, np.asarray(kern(a, csr.data)), margin=1e-4)
    # runtime values scale without re-create
    check(2 * (a @ b), np.asarray(kern(a, 2 * csr.data)), margin=1e-4)


def test_pspgemm_csr_bsparse_packed_beta1():
    from libxsmm_tpu.ops.sparse import create_packed_spgemm_csr_bsparse

    m, n, k, p = 8, 6, 10, 4
    b = _sparse_dense(k, n, 0.4)
    csr = CsrMatrix.from_dense(b)
    a = RNG.standard_normal((m, k, p)).astype(np.float32)
    c = RNG.standard_normal((m, n, p)).astype(np.float32)
    kern = create_packed_spgemm_csr_bsparse(
        GemmShape(m, n, k), packed_width=p,
        row_ptr=csr.indptr, column_idx=csr.indices, strategy="sparse")
    ref = np.einsum("mkp,kn->mnp", a, b) + c
    check(ref, np.asarray(kern(a, csr.data, c)), margin=1e-4)


def test_pspgemm_csr_routing_by_operand():
    # the single-entry routing mirror of generator_packed_spgemm.c:24-56
    m, n, k = 12, 9, 10
    b = _sparse_dense(k, n, 0.3)
    csr = CsrMatrix.from_dense(b)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    kern = create_packed_spgemm_csr(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        row_ptr=csr.indptr, column_idx=csr.indices, sparse_operand="b")
    check(a @ b, np.asarray(kern(a, csr.data)), margin=1e-4)
    with pytest.raises(ValueError):
        create_packed_spgemm_csr(GemmShape(m, n, k), GemmFlags.BETA_0,
                                 row_ptr=csr.indptr,
                                 column_idx=csr.indices, sparse_operand="x")


# ---------------------------------------------------------------------------
# packed SpGEMM CSC C-sparse / SDDMM (the reference's ldc==0 routing)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("strategy", ["gather", "dense"])
@pytest.mark.parametrize("m,n,k,density", [(16, 24, 12, 0.3),
                                           (13, 5, 7, 0.5)])
def test_pspgemm_csc_csparse(m, n, k, density, strategy):
    from libxsmm_tpu.ops.sparse import create_packed_spgemm_csc_csparse

    cpat = _sparse_dense(m, n, density)
    csc = CscMatrix.from_dense(cpat)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    kern = create_packed_spgemm_csc_csparse(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        column_ptr=csc.indptr, row_idx=csc.indices, strategy=strategy)
    dense = a @ b
    cols = np.repeat(np.arange(n), np.diff(csc.indptr))
    want = dense[csc.indices, cols]
    check(want, np.asarray(kern(a, b)), margin=1e-4)


def test_pspgemm_csc_csparse_packed_reduces():
    # the packed dim joins the contraction (reference "reduce C" stage)
    from libxsmm_tpu.ops.sparse import create_packed_spgemm_csc_csparse

    m, n, k, p = 10, 8, 6, 4
    cpat = _sparse_dense(m, n, 0.4)
    csc = CscMatrix.from_dense(cpat)
    a = RNG.standard_normal((m, k, p)).astype(np.float32)
    b = RNG.standard_normal((k, n, p)).astype(np.float32)
    kern = create_packed_spgemm_csc_csparse(
        GemmShape(m, n, k), GemmFlags.BETA_0, packed_width=p,
        column_ptr=csc.indptr, row_idx=csc.indices, strategy="gather")
    dense = np.einsum("mkp,knp->mn", a, b)
    cols = np.repeat(np.arange(n), np.diff(csc.indptr))
    want = dense[csc.indices, cols]
    check(want, np.asarray(kern(a, b)), margin=1e-4)


def test_pspgemm_csc_csparse_beta1_and_routing():
    from libxsmm_tpu.ops.sparse import create_packed_spgemm_csc_csparse

    m, n, k = 9, 7, 11
    cpat = _sparse_dense(m, n, 0.35)
    csc = CscMatrix.from_dense(cpat)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    prior = RNG.standard_normal(csc.nnz).astype(np.float32)
    kern = create_packed_spgemm_csc_csparse(
        GemmShape(m, n, k), column_ptr=csc.indptr, row_idx=csc.indices,
        strategy="dense")
    dense = a @ b
    cols = np.repeat(np.arange(n), np.diff(csc.indptr))
    want = dense[csc.indices, cols] + prior
    check(want, np.asarray(kern(a, b, prior)), margin=1e-4)
    # single-entry routing mirror (generator_packed_spgemm.c:81-95)
    kern2 = create_packed_spgemm_csc(
        GemmShape(m, n, k), GemmFlags.BETA_0, column_ptr=csc.indptr,
        row_idx=csc.indices, sparse_operand="c")
    check(dense[csc.indices, cols], np.asarray(kern2(a, b)), margin=1e-4)


def _fake_bencher(fmod, monkeypatch, script):
    """Monkeypatched _bench_candidates replaying scripted (dense_us,
    sparse_us) measurements — the recorded-trace replay harness the
    r3 VERDICT asked for."""
    calls = []

    def fake_bench(cands, reps, rounds=3, **kw):
        calls.append(len(cands))
        times = script.pop(0)
        # the real bencher also returns the median paired-round
        # dense/sparse ratio; derive it from the scripted times
        return times, times[0] / times[1]

    monkeypatch.setattr(fmod, "_bench_candidates", fake_bench)
    return calls


def test_fsspmdm_autotune_history_recovers(tmp_path, monkeypatch):
    """VERDICT r2 #2 / r3 #8: a distorted first measurement must not
    poison future creates. Every create folds its fresh interleaved-ratio
    measurement into the PERSISTED ratio history and decides on the
    aggregate median — the distorted entry is simply outvoted as honest
    measurements accumulate."""
    from libxsmm_tpu.config import CONFIG
    from libxsmm_tpu.ops import fsspmdm as fmod

    monkeypatch.setattr(CONFIG, "autotune_cache_path",
                        str(tmp_path / "autotune.kv"))
    if fmod._autotune_cache() is None:
        pytest.skip("native KV unavailable")
    monkeypatch.setattr(CONFIG, "fsspmdm_hint", 0)
    monkeypatch.delenv("XSMM_TPU_FSSPMDM_HINT", raising=False)

    # truth: dense=100, sparse=50 (sparse wins beyond the 10% bias); the
    # FIRST full tune is distorted by a transient spike on sparse.
    calls = _fake_bencher(fmod, monkeypatch, [
        [100.0, 1000.0],   # create 1: ratio 0.1 -> history [0.1] -> dense
        [100.0, 50.0],     # create 2: median(0.1, 2.0) -> sparse
        [100.0, 50.0]])    # create 3: median(0.1, 2, 2) -> sparse, stable

    a = _sparse_dense(16, 12, 0.3)
    h1 = fmod.fsspmdm_create(8, a)
    assert h1.kind == "dense"          # poisoned by the distorted tune
    h2 = fmod.fsspmdm_create(8, a)
    assert h2.tuned_us.get("cached")
    assert h2.kind == "sparse"         # fresh ratio outvotes the spike
    h3 = fmod.fsspmdm_create(8, a)
    assert h3.kind == "sparse"
    assert h3.tuned_us["ratio_history"] == [0.1, 2.0, 2.0]
    assert calls == [2, 2, 2]          # exactly one measurement per create


def test_fsspmdm_autotune_drought_replay(tmp_path, monkeypatch):
    """VERDICT r3 #8 seeded drought-trace regression: a persisted
    sparse pick built from consistent wins must NOT flip on single
    drought-window draws that favor dense (the r3 failure: the final dev
    run flipped to dense on one lucky min-of-rounds draw). Flipping
    requires the aggregate median itself to cross the bias."""
    from libxsmm_tpu.config import CONFIG
    from libxsmm_tpu.ops import fsspmdm as fmod

    monkeypatch.setattr(CONFIG, "autotune_cache_path",
                        str(tmp_path / "autotune.kv"))
    if fmod._autotune_cache() is None:
        pytest.skip("native KV unavailable")
    monkeypatch.setattr(CONFIG, "fsspmdm_hint", 0)
    monkeypatch.delenv("XSMM_TPU_FSSPMDM_HINT", raising=False)

    # recorded trace: 3 honest windows (sparse 1.3x), then a drought draw
    # favoring dense (0.8), then another honest one.
    _fake_bencher(fmod, monkeypatch, [
        [130.0, 100.0], [130.0, 100.0], [130.0, 100.0],
        [80.0, 100.0],                 # drought draw: dense looks faster
        [130.0, 100.0]])

    a = _sparse_dense(16, 12, 0.3)
    kinds = [fmod.fsspmdm_create(8, a).kind for _ in range(5)]
    # create 1 decides on one sample (1.3 > 1.1 bias -> sparse); the
    # drought draw at create 4 must not flip the persisted pick
    assert kinds == ["sparse"] * 5
    # but a GENUINE regime change (consistent dense wins) does flip it
    _fake_bencher(fmod, monkeypatch, [[80.0, 100.0]] * 4)
    kinds2 = [fmod.fsspmdm_create(8, a).kind for _ in range(4)]
    assert kinds2[-1] == "dense"       # majority of the capped history


def test_bcsc_union_clustering():
    """Create-time block-column clustering: a pattern built from two
    support families interleaved (adjacent grouping unions both families;
    clustered grouping separates them) must (a) trigger the permutation,
    (b) shrink the max union, (c) stay numerically exact vs the oracle."""
    from libxsmm_tpu.descriptor import GemmFlags, GemmShape, SpgemmConfig
    from libxsmm_tpu.kernels.spmm_pallas import (_cluster_union_groups,
                                                 build_bcsc_spmm_union)

    bk = bn = 32
    m, n, k = 64, 256, 1024
    kb, nb = k // bk, n // bn            # 32 x 8 blocks, W=4, nsg=2
    rng = np.random.default_rng(11)
    # family sizes chosen so the clustering GAIN (11 panels: adjacent
    # grouping unions both 16-row families, clustered grouping one) clears
    # the geometry-derived break-even gate on cpu/v5e/v5p/v4 (v5e f32:
    # ceil(osz*peak/hbm/bk) = 8 panels) but stays under the min_gain=16
    # margin assert below
    famA = np.arange(0, 16)              # block-rows 0-15
    famB = np.arange(16, 32)             # block-rows 16-31
    cols = []
    for j in range(nb):                  # interleave the families
        fam = famA if j % 2 == 0 else famB
        cols.append(np.sort(rng.choice(fam, 10, replace=False)))
    indptr = np.arange(0, 10 * nb + 1, 10, dtype=np.int32)
    indices = np.concatenate(cols).astype(np.int32)

    # the builder's engage decision is geometry-derived; on a device whose
    # gate exceeds this pattern's 11-panel gain the refusal IS the correct
    # behavior (gather out-costs the saving) — skip the engage asserts
    from libxsmm_tpu import device as _dev
    _geo = _dev.get_geometry()
    _gate = -(-int(4 * _geo.peak_f32_tflops * 1e12
                   / (_geo.hbm_gbps * 1e9)) // bk)
    expect_engage = _gate <= 11

    perm = _cluster_union_groups(indptr, indices, 4)
    assert perm is not None              # clustering must engage
    # margin contract: a saving below min_gain must NOT engage (the
    # restore gather costs a full (m, n) HBM pass, worth osz*peak/hbm
    # saved union k-rows — a marginal improvement would regress silently)
    assert _cluster_union_groups(indptr, indices, 4, min_gain=16) is None

    shape = GemmShape(m, n, k)
    values = rng.standard_normal((len(indices), bk, bn)).astype(np.float32)
    a = rng.standard_normal((m, k)).astype(np.float32)
    dense_b = np.zeros((k, n), np.float32)
    for j in range(nb):
        for pos in range(indptr[j], indptr[j + 1]):
            r = indices[pos]
            dense_b[r * bk:(r + 1) * bk, j * bn:(j + 1) * bn] = values[pos]
    want = a @ dense_b

    for db in (False, True):
        fn = build_bcsc_spmm_union(shape, SpgemmConfig(1, bk, bn),
                                   indptr, indices, double_buffer=db)
        base = build_bcsc_spmm_union(shape, SpgemmConfig(1, bk, bn),
                                     indptr, indices, double_buffer=db,
                                     cluster=False)
        if expect_engage:
            assert fn.clustered
            assert fn.union_panels < base.union_panels, (
                fn.union_panels, base.union_panels)
        np.testing.assert_allclose(np.asarray(fn(a, values)), want,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(base(a, values)), want,
                                   rtol=2e-5, atol=2e-5)


def test_fsspmdm_declared_dtype_applied():
    """An explicit dtype= must govern the stored A operand: a declared-F64
    handle fed an f32 array would otherwise silently compute from
    f32-resident A (and the inverse would keep a needless f64 copy).
    Reference handles are templated on the element type (libxsmm_fsspmdm.c)."""
    m, k, n = 12, 16, 32
    a32 = _sparse_dense(m, k, 0.3).astype(np.float32)
    h = fsspmdm_create(n, a32, beta=0, dtype=Datatype.F64)
    b = RNG.standard_normal((k, n))  # f64
    out = np.asarray(h.execute(b))
    assert out.dtype == np.float64
    # f64-resolution check: an f32-A compute path fails this margin
    check(a32.astype(np.float64) @ b, out, dtype_name="f64", margin=1e-12)
    fsspmdm_destroy(h)
    # inverse: declared F32 from an f64 array computes/stores in f32
    h2 = fsspmdm_create(n, a32.astype(np.float64), beta=0,
                        dtype=Datatype.F32)
    out2 = np.asarray(h2.execute(b.astype(np.float32)))
    assert out2.dtype == np.float32
    fsspmdm_destroy(h2)


def test_bcsc_blocking_validated_at_create():
    """n%bn / k%bk / indptr-length mismatches must fail AT CREATE: a
    floored nb silently dropped output columns (review finding)."""
    from libxsmm_tpu.descriptor import SpgemmConfig
    shape = GemmShape(16, 100, 64)
    cfg = SpgemmConfig(bk=8, bn=8)   # 100 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        create_packed_spgemm_bcsc(shape, GemmFlags.BETA_0, cfg,
                                  column_ptr=np.zeros(13, np.int32),
                                  row_idx=np.zeros(0, np.int32),
                                  strategy="dense")
    shape2 = GemmShape(16, 96, 64)
    with pytest.raises(ValueError, match="column_ptr"):
        create_packed_spgemm_bcsc(shape2, GemmFlags.BETA_0, cfg,
                                  column_ptr=np.zeros(5, np.int32),
                                  row_idx=np.zeros(0, np.int32),
                                  strategy="dense")


def test_pspgemm_bcsc_union3_dma_matches():
    """union3 (DMA-assembled double-buffered union pipeline): numerically
    identical to union/union2 and the oracle."""
    m, k, n, bk, bn = 128, 256, 256, 32, 32
    b = _sparse_dense(k, n, 0.25)
    # block-sparsify
    keep = RNG.random((k // bk, n // bn)) < 0.3
    b *= np.kron(keep, np.ones((bk, bn), np.float32))
    bm = BcscMatrix.from_dense(b, bk=bk, bn=bn)
    a = RNG.standard_normal((m, k)).astype(np.float32)
    ref = a @ bm.to_dense()
    outs = {}
    for s in ("union", "union3", "union4"):
        kern = create_packed_spgemm_bcsc(
            GemmShape(m, n, k), GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
            column_ptr=bm.indptr, row_idx=bm.indices, strategy=s)
        outs[s] = np.asarray(kern(a, bm.data))
        check(ref, outs[s], margin=1e-4)
    np.testing.assert_allclose(outs["union"], outs["union3"], rtol=1e-6)
    np.testing.assert_allclose(outs["union"], outs["union4"], rtol=1e-6)
