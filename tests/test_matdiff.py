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
    assert info.norm1_abs == pytest.approx(np.abs(d).sum(axis=0).max())
    assert info.normi_abs == pytest.approx(np.abs(d).sum(axis=1).max())
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
    ref = np.ones((4, 4))
    small = matdiff(ref, ref + 1e-8)
    big = matdiff(ref, ref + 1e-2)
    assert big.epsilon() > small.epsilon()
    assert matdiff_reduce(small, big) is big
    assert matdiff_reduce(big, small) is big


def test_check_passes_and_fails():
    ref = np.ones((4, 4))
    check(ref, ref + 1e-7, dtype_name="f32")
    with pytest.raises(AssertionError):
        check(ref, ref + 1.0, dtype_name="f32")
