"""matdiff norm machinery tests (reference: tests/matdiff.c, math.c)."""

import numpy as np
import pytest

from libxsmm_tpu.matdiff import MatdiffInfo, check, matdiff, matdiff_reduce


def test_identical_is_zero():
    a = np.random.default_rng(0).normal(size=(17, 9))
    info = matdiff(a, a.copy())
    assert info.linf_abs == 0.0
    assert info.normf_rel == 0.0
    assert info.m == -1 and info.n == -1  # no difference -> OOB location


def test_location_of_max_diff():
    a = np.zeros((5, 4))
    b = np.zeros((5, 4))
    b[3, 2] = 0.5
    info = matdiff(a, b)
    assert (info.m, info.n) == (3, 2)
    assert info.linf_abs == 0.5
    assert info.v_ref == 0.0 and info.v_tst == 0.5


def test_norms_match_numpy():
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(8, 6))
    tst = ref + rng.normal(scale=1e-3, size=(8, 6))
    info = matdiff(ref, tst)
    d = tst - ref
    # reference field semantics (libxsmm_matdiff.h:116/:183): normi_abs =
    # max COLUMN-sum, norm1_abs = max ROW-sum — swapped vs netlib naming;
    # parity with reference-generated baselines wins
    assert info.normi_abs == pytest.approx(np.abs(d).sum(axis=0).max())
    assert info.norm1_abs == pytest.approx(np.abs(d).sum(axis=1).max())
    assert info.l2_abs == pytest.approx(np.sqrt((d * d).sum()))
    assert info.normf_rel == pytest.approx(
        np.sqrt((d * d).sum()) / np.sqrt((ref * ref).sum()))
    assert 0.99 < info.rsq <= 1.0


def test_nan_is_inf():
    ref = np.ones((3, 3))
    tst = np.ones((3, 3))
    tst[1, 1] = np.nan
    info = matdiff(ref, tst)
    assert np.isinf(info.linf_abs)


def test_epsilon_and_reduce():
    # Field-wise worst-of merge into the output struct
    # (libxsmm_matdiff_reduce, src/libxsmm_math.c:386-446).
    ref = np.ones((4, 4))
    small = matdiff(ref, ref + 1e-8)
    big = matdiff(ref, ref + 1e-2)
    assert big.epsilon() > small.epsilon()
    out = matdiff_reduce(small, big)
    assert out is small  # merged in place, returns the output struct
    assert out.linf_abs == big.linf_abs
    assert out.l2_abs == big.l2_abs
    # reducing the worse report again is a no-op for the abs norms
    worst = out.linf_abs
    assert matdiff_reduce(out, matdiff(ref, ref + 1e-8)).linf_abs == worst


def test_matdiff_clear_then_reduce_adopts_input():
    from libxsmm_tpu.matdiff import matdiff_clear
    ref = np.arange(16.0).reshape(4, 4)
    rep = matdiff(ref, ref + 1e-3)
    acc = matdiff_clear()
    assert acc.m == -1 and np.isinf(acc.rsq)
    matdiff_reduce(acc, rep)
    assert acc.linf_abs == rep.linf_abs
    assert acc.min_ref == rep.min_ref and acc.max_tst == rep.max_tst
    assert (acc.m, acc.n) == (rep.m, rep.n)


def test_check_passes_and_fails():
    ref = np.ones((4, 4))
    check(ref, ref + 1e-7, dtype_name="f32")
    with pytest.raises(AssertionError):
        check(ref, ref + 1.0, dtype_name="f32")


def test_linf_rel_per_element():
    # linf_rel is the MAX per-element relative error (matdiff.h:60), not
    # the relative error at the argmax-absolute location
    ref = np.array([[100.0, 0.001]])
    tst = np.array([[101.0, 0.002]])
    info = matdiff(ref, tst)
    assert info.linf_rel == pytest.approx(1.0)       # 0.001/0.001
    assert info.linf_abs == pytest.approx(1.0)       # at the 100 element


def test_rsq_clamped_and_constant_ref():
    # large diff vs low-variance ref: reference clamps rsq at 0
    ref = np.array([[1.0, 1.001, 0.999, 1.0]])
    tst = ref + 5.0
    assert matdiff(ref, tst).rsq == 0.0
    # constant ref, exact match: DIV fallback gives resrel = l2 = 0 -> 1
    c = np.full((3, 3), 2.5)
    assert matdiff(c, c.copy()).rsq == 1.0


def test_nan_sentinel_contract():
    # libxsmm_math.c:278-295: NaN in TST -> tst stats poisoned with the
    # +inf/-inf sentinels (not NaN), all norms +inf; NaN in REF ->
    # symmetric on the ref side
    ref = np.ones((3, 3))
    tst = np.ones((3, 3))
    tst[1, 1] = np.nan
    info = matdiff(ref, tst)
    assert np.isinf(info.norm1_abs) and np.isinf(info.linf_rel)
    assert info.min_tst == np.inf and info.max_tst == -np.inf
    assert np.isinf(info.l1_tst) and np.isinf(info.var_tst)
    assert np.isnan(info.avg_tst)
    assert info.min_ref == 1.0 and info.max_ref == 1.0   # ref side intact
    # blame follows the REF element at the first bad tst position
    # (libxsmm_math.c:98): ref also bad there -> ref-side sentinel
    ref2 = ref.copy()
    ref2[1, 1] = np.nan
    info2 = matdiff(ref2, tst)
    assert info2.min_ref == np.inf and info2.max_ref == -np.inf
    assert np.isinf(info2.l1_ref) and np.isnan(info2.avg_ref)
    # IDENTICAL non-finite pairs are the reference's ti==ri OK path:
    # byte-equal arrays with an inf must NOT poison anything
    both = np.ones((3, 3))
    both[0, 0] = np.inf
    info3 = matdiff(both, both.copy())
    assert info3.linf_abs == 0.0 and info3.norm1_abs == 0.0
    assert info3.normf_rel == 0.0
