"""Packed (SOA) dense GEMM tests (xgemm_packed / xgemm_norm_packed parity)."""

import numpy as np
import pytest

from libxsmm_tpu.descriptor import GemmFlags, GemmShape
from libxsmm_tpu.matdiff import check
from libxsmm_tpu.ops.packed import (create_packed_gemm,
                                    create_packed_gemm_ac_rm,
                                    create_packed_gemm_bc_rm)

RNG = np.random.default_rng(41)


def _r(*s):
    return RNG.standard_normal(s).astype(np.float32)


@pytest.mark.parametrize("p", [1, 4, 8])
def test_packed_gemm(p):
    m, n, k = 9, 7, 11
    a, b = _r(m, k, p), _r(k, n, p)
    kern = create_packed_gemm(GemmShape(m, n, k), GemmFlags.BETA_0, p)
    check(np.einsum("mkp,knp->mnp", a, b), np.asarray(kern(a, b)),
          margin=1e-4)


def test_packed_gemm_beta1():
    m, n, k, p = 6, 6, 6, 4
    a, b, c = _r(m, k, p), _r(k, n, p), _r(m, n, p)
    kern = create_packed_gemm(GemmShape(m, n, k), GemmFlags.NONE, p)
    check(np.einsum("mkp,knp->mnp", a, b) + c, np.asarray(kern(a, b, c)),
          margin=1e-4)


def test_packed_gemm_ac_rm():
    m, n, k, p = 8, 10, 6, 8
    a, b = _r(m, k, p), _r(k, n)
    kern = create_packed_gemm_ac_rm(GemmShape(m, n, k), GemmFlags.BETA_0, p)
    check(np.einsum("mkp,kn->mnp", a, b), np.asarray(kern(a, b)),
          margin=1e-4)


def test_packed_gemm_bc_rm():
    m, n, k, p = 8, 10, 6, 8
    a, b = _r(m, k), _r(k, n, p)
    kern = create_packed_gemm_bc_rm(GemmShape(m, n, k), GemmFlags.BETA_0, p)
    check(np.einsum("mk,knp->mnp", a, b), np.asarray(kern(a, b)),
          margin=1e-4)


def test_packed_gemm_cached():
    k1 = create_packed_gemm(GemmShape(4, 4, 4), GemmFlags.BETA_0, 2)
    k2 = create_packed_gemm(GemmShape(4, 4, 4), GemmFlags.BETA_0, 2)
    assert k1 is k2


def test_packed_gemm_flag_and_beta_contracts():
    # reference rejects TRANS/VNNI on the packed dense entries
    # (generator_packed_gemm.c:41-48) — silently ignoring TRANS_B computed
    # A@B where the caller asked for A@B^T
    with pytest.raises(ValueError, match="NORM"):
        create_packed_gemm(GemmShape(4, 4, 4), GemmFlags.TRANS_B, 2)
    # BETA_0 means C unread; beta=1 requires C
    k0 = create_packed_gemm(GemmShape(4, 4, 4), GemmFlags.BETA_0, 2)
    a = np.ones((4, 4, 2), np.float32)
    with pytest.raises(ValueError, match="BETA_0"):
        k0(a, a, a)
    k1 = create_packed_gemm(GemmShape(4, 4, 4), GemmFlags.NONE, 2)
    with pytest.raises(ValueError, match="C operand"):
        k1(a, a)
