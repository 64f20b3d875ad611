"""GEMM/BRGEMM kernel correctness — randomized shapes vs NumPy oracle.

Models the reference's xgemm driver strategy (samples/xgemm/gemm_kernel.c:
JIT output vs plain-C gold compare through matdiff norms, with randomized
shape sampling per SURVEY.md §4.2).
"""

import numpy as np
import pytest

import libxsmm_tpu as xt
from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                    BinaryPostops, BinaryType, GemmFlags,
                                    GemmShape, UnaryArgops, UnaryType)
from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.matdiff import check

RNG = np.random.default_rng(123)

SMALL_SHAPES = [(13, 5, 7), (32, 32, 32), (1, 1, 1), (64, 48, 16),
                (17, 23, 31), (8, 128, 64)]


def _rand(shape, dtype=np.float32):
    return RNG.standard_normal(shape).astype(dtype)


@pytest.mark.parametrize("m,n,k", SMALL_SHAPES)
def test_gemm_beta0_f32(m, n, k):
    a, b = _rand((m, k)), _rand((k, n))
    kern = xt.dispatch_gemm(GemmShape(m, n, k), GemmFlags.BETA_0)
    check(a @ b, np.asarray(kern(a, b)), dtype_name="f32")
    assert xt.get_kernel_info(kern).nflops == 2 * m * n * k


@pytest.mark.parametrize("m,n,k", [(16, 8, 12), (13, 5, 7)])
def test_gemm_beta1_accumulate(m, n, k):
    a, b, c = _rand((m, k)), _rand((k, n)), _rand((m, n))
    kern = xt.dispatch_gemm(GemmShape(m, n, k))
    check(a @ b + c, np.asarray(kern(a, b, c)), dtype_name="f32")


@pytest.mark.parametrize("ta,tb", [(True, False), (False, True), (True, True)])
def test_gemm_transposes(ta, tb):
    m, n, k = 9, 14, 6
    a = _rand((k, m)) if ta else _rand((m, k))
    b = _rand((n, k)) if tb else _rand((k, n))
    flags = GemmFlags.BETA_0
    if ta:
        flags |= GemmFlags.TRANS_A
    if tb:
        flags |= GemmFlags.TRANS_B
    kern = xt.dispatch_gemm(GemmShape(m, n, k), flags)
    ref = (a.T if ta else a) @ (b.T if tb else b)
    check(ref, np.asarray(kern(a, b)), dtype_name="f32")


def test_gemm_bf16_in_f32_out():
    import jax.numpy as jnp
    m, n, k = 32, 16, 24
    a = jnp.asarray(_rand((m, k)), jnp.bfloat16)
    b = jnp.asarray(_rand((k, n)), jnp.bfloat16)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    kern = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    check(ref, np.asarray(kern(a, b)), dtype_name="bf16")


def test_gemm_f64():
    m, n, k = 13, 5, 7
    a, b = _rand((m, k), np.float64), _rand((k, n), np.float64)
    shape = GemmShape(m, n, k, a_in_type=Datatype.F64,
                      b_in_type=Datatype.F64, out_type=Datatype.F64)
    kern = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    check(a @ b, np.asarray(kern(a, b)), dtype_name="f64")


def test_gemm_i8_i32():
    import jax.numpy as jnp
    m, n, k = 16, 16, 32
    a = RNG.integers(-100, 100, (m, k)).astype(np.int8)
    b = RNG.integers(-100, 100, (k, n)).astype(np.int8)
    shape = GemmShape(m, n, k, a_in_type=Datatype.I8, b_in_type=Datatype.I8,
                      out_type=Datatype.I32, comp_type=Datatype.F32)
    kern = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    ref = a.astype(np.int32) @ b.astype(np.int32)
    out = np.asarray(kern(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(ref, out)


def test_dispatch_cache_hit():
    shape = GemmShape(24, 24, 24)
    k1 = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    k2 = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    assert k1 is k2
    k3 = xt.dispatch_gemm(GemmShape(24, 24, 25), GemmFlags.BETA_0)
    assert k3 is not k1


# ---------------------------------------------------------------------------
# BRGEMM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("br", [1, 3, 8])
def test_brgemm_stride(br):
    m, n, k = 16, 12, 10
    a, b = _rand((br, m, k)), _rand((br, k, n))
    kern = xt.dispatch_brgemm(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br))
    ref = np.einsum("bmk,bkn->mn", a, b)
    check(ref, np.asarray(kern(a, b)), dtype_name="f32", margin=1e-4)


def test_brgemm_stride_beta1():
    br, m, n, k = 4, 8, 8, 8
    a, b, c = _rand((br, m, k)), _rand((br, k, n)), _rand((m, n))
    kern = xt.dispatch_brgemm(
        GemmShape(m, n, k), GemmFlags.NONE,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br))
    ref = np.einsum("bmk,bkn->mn", a, b) + c
    check(ref, np.asarray(kern(a, b, c)), dtype_name="f32", margin=1e-4)


def test_brgemm_address_gather():
    pool, br, m, n, k = 10, 5, 8, 6, 4
    a, b = _rand((pool, m, k)), _rand((pool, k, n))
    idx_a = np.asarray([0, 3, 7, 2, 9], np.int32)
    idx_b = np.asarray([1, 4, 5, 8, 0], np.int32)
    kern = xt.dispatch_brgemm(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.ADDRESS, br_count_hint=br))
    ref = np.einsum("bmk,bkn->mn", a[idx_a], b[idx_b])
    check(ref, np.asarray(kern(a, b, idx_a, idx_b)), dtype_name="f32",
          margin=1e-4)


def test_brgemm_trans_b():
    br, m, n, k = 3, 8, 10, 6
    a, b = _rand((br, m, k)), _rand((br, n, k))
    kern = xt.dispatch_brgemm(
        GemmShape(m, n, k), GemmFlags.BETA_0 | GemmFlags.TRANS_B,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br))
    ref = np.einsum("bmk,bnk->mn", a, b)
    check(ref, np.asarray(kern(a, b)), dtype_name="f32", margin=1e-4)


# ---------------------------------------------------------------------------
# BRGEMM-ext fused epilogues
# ---------------------------------------------------------------------------

def test_brgemm_ext_relu_bias():
    br, m, n, k = 2, 16, 8, 8
    a, b = _rand((br, m, k)), _rand((br, k, n))
    d = _rand((m, n))
    kern = xt.dispatch_brgemm_ext(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br),
        argops=UnaryArgops(cp_type=UnaryType.RELU),
        postops=BinaryPostops(d_type=BinaryType.ADD))
    ref = np.maximum(np.einsum("bmk,bkn->mn", a, b) + d, 0.0)
    check(ref, np.asarray(kern(a, b, d)), dtype_name="f32", margin=1e-4)


def test_brgemm_ext_argop_on_a():
    br, m, n, k = 2, 8, 8, 8
    a, b = _rand((br, m, k)), _rand((br, k, n))
    kern = xt.dispatch_brgemm_ext(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br),
        argops=UnaryArgops(ap_type=UnaryType.X2))
    ref = np.einsum("bmk,bkn->mn", a * a, b)
    check(ref, np.asarray(kern(a, b)), dtype_name="f32", margin=1e-4)


# ---------------------------------------------------------------------------
# batched independent GEMMs (Pallas path in interpret mode on CPU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch,m,n,k", [(4, 32, 32, 32), (7, 13, 5, 7),
                                         (16, 8, 8, 8), (3, 64, 48, 16)])
def test_gemm_batched(batch, m, n, k):
    a, b = _rand((batch, m, k)), _rand((batch, k, n))
    kern = xt.dispatch_gemm_batched(GemmShape(m, n, k), GemmFlags.BETA_0)
    ref = np.einsum("bmk,bkn->bmn", a, b)
    check(ref, np.asarray(kern(a, b)), dtype_name="f32", margin=1e-4)


def test_gemm_batched_beta1():
    batch, m, n, k = 5, 16, 16, 16
    a, b, c = _rand((batch, m, k)), _rand((batch, k, n)), _rand((batch, m, n))
    kern = xt.dispatch_gemm_batched(GemmShape(m, n, k))
    ref = np.einsum("bmk,bkn->bmn", a, b) + c
    check(ref, np.asarray(kern(a, b, c)), dtype_name="f32", margin=1e-4)


# ---------------------------------------------------------------------------
# BLAS-style wrappers
# ---------------------------------------------------------------------------

def test_sgemm_wrapper():
    a, b = _rand((6, 4)), _rand((4, 9))
    check(a @ b, np.asarray(xt.sgemm(a, b)), dtype_name="f32")


def test_dgemm_wrapper():
    a = _rand((5, 3), np.float64)
    b = _rand((3, 7), np.float64)
    c = _rand((5, 7), np.float64)
    check(a @ b + c, np.asarray(xt.dgemm(a, b, c)), dtype_name="f64")


def test_gemm_vnni_layout_flags():
    import jax.numpy as jnp
    from libxsmm_tpu.ops.gemm import _to_vnni
    m, n, k = 16, 8, 32
    a = jnp.asarray(_rand((m, k)), jnp.bfloat16)      # NORM
    b = jnp.asarray(_rand((k, n)), jnp.bfloat16)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.BF16)
    # pack operands the way TRANSFORM_NORM_TO_VNNI2 would
    a_v = _to_vnni(a, Datatype.BF16)
    b_v = _to_vnni(b, Datatype.BF16)
    kern = xt.dispatch_gemm(
        shape, GemmFlags.BETA_0 | GemmFlags.VNNI_A | GemmFlags.VNNI_B
        | GemmFlags.VNNI_C)
    out_v = kern(a_v, b_v)
    assert out_v.shape == (m // 2, n * 2)             # C emitted in VNNI
    # unpack C and compare
    from libxsmm_tpu.ops.gemm import _undo_vnni
    out = np.asarray(_undo_vnni(out_v, Datatype.BF16), np.float32)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    check(ref, out, dtype_name="bf16")


def test_brgemm_vnni_a():
    import jax.numpy as jnp
    from libxsmm_tpu.ops.gemm import _to_vnni
    br, m, n, k = 3, 8, 8, 16
    a = jnp.asarray(_rand((br, m, k)), jnp.bfloat16)
    b = jnp.asarray(_rand((br, k, n)), jnp.bfloat16)
    a_v = _to_vnni(a, Datatype.BF16)                  # (br, m//2, k*2)
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    kern = xt.dispatch_brgemm(
        shape, GemmFlags.BETA_0 | GemmFlags.VNNI_A,
        BatchReduceConfig(BatchReduceType.STRIDE, br))
    ref = np.einsum("bmk,bkn->mn", np.asarray(a, np.float32),
                    np.asarray(b, np.float32))
    check(ref, np.asarray(kern(a_v, b)), dtype_name="bf16")


def test_gemm_batched_tuned():
    batch, m, n, k = 8, 16, 16, 16
    a, b = _rand((batch, m, k)), _rand((batch, k, n))
    kern = xt.dispatch_gemm_batched(GemmShape(m, n, k), GemmFlags.BETA_0,
                                    tune=True)
    ref = np.einsum("bmk,bkn->bmn", a, b)
    check(ref, np.asarray(kern(a, b)), dtype_name="f32", margin=1e-4)
    # second call reuses the tuned pick
    check(ref, np.asarray(kern(a, b)), dtype_name="f32", margin=1e-4)


def test_brgemm_ext_relu_bitmask():
    from libxsmm_tpu.descriptor import UnaryFlags
    br, m, n, k = 2, 8, 8, 8
    a, b = _rand((br, m, k)), _rand((br, k, n))
    kern = xt.dispatch_brgemm_ext(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br),
        argops=UnaryArgops(cp_type=UnaryType.RELU,
                           cp_flags=UnaryFlags.BITMASK_2BYTEMULT))
    out, extra = kern(a, b)
    ref = np.einsum("bmk,bkn->mn", a, b)
    check(np.maximum(ref, 0), np.asarray(out), margin=1e-4)
    # the bitmask extra is in the reference PACKED bit layout
    np.testing.assert_array_equal(
        np.asarray(xt.unpack_bitmask(extra["cp_bitmask"], m, n)), ref > 0)


def test_brgemm_ext_stochastic_round_store():
    br, m, n, k = 2, 16, 16, 8
    a, b = _rand((br, m, k)), _rand((br, k, n))
    kern = xt.dispatch_brgemm_ext(
        GemmShape(m, n, k, out_type=Datatype.BF16), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=br),
        argops=UnaryArgops(cp_type=UnaryType.STOCHASTIC_ROUND))
    out = np.asarray(kern(a, b, seed=5), np.float32)
    ref = np.einsum("bmk,bkn->mn", a, b)
    # SR result within one bf16 ulp of the exact value
    check(ref, out, dtype_name="bf16", margin=2 ** -7)


def test_kernels_are_differentiable():
    """Dispatched kernels are jnp-composed, so jax.grad flows through —
    the library works as a building block for training code."""
    import jax
    import jax.numpy as jnp
    m, n, k = 8, 6, 4
    kern = xt.dispatch_gemm(GemmShape(m, n, k), GemmFlags.BETA_0)

    def loss(a, b):
        return jnp.sum(kern(a, b) ** 2)

    a, b = jnp.asarray(_rand((m, k))), jnp.asarray(_rand((k, n)))
    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    c = np.asarray(kern(a, b))
    np.testing.assert_allclose(np.asarray(ga), 2 * c @ np.asarray(b).T,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(a).T @ (2 * c),
                               rtol=1e-4)


def test_threadsafe_dispatch_real_kernels():
    """tests/threadsafety.c parity with REAL kernels: concurrent dispatch
    of identical and distinct GEMM descriptors returns consistent kernels
    and correct results."""
    import concurrent.futures
    shapes = [GemmShape(8 + i % 3, 8, 8) for i in range(64)]

    def work(s):
        kern = xt.dispatch_gemm(s, GemmFlags.BETA_0)
        a, b = _rand((s.m, s.k)), _rand((s.k, s.n))
        out = np.asarray(kern(a, b))
        return kern, float(np.abs(out - a @ b).max())

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(work, shapes))
    by_shape = {}
    for s, (kern, err) in zip(shapes, results):
        assert err < 1e-4
        by_shape.setdefault(s, kern)
        assert by_shape[s] is kern   # same descriptor -> same kernel object


@pytest.mark.parametrize("n,batch,mdim", [(32, 64, 32), (16, 24, 40),
                                          (64, 8, 16)])
def test_gemm_batched_packed(n, batch, mdim):
    # lane-packed SMM: pack -> kernel -> unpack == per-item matmul
    k = n
    p = xt.smm_pack_factor(GemmShape(mdim, n, k))
    assert p == 128 // n
    a = RNG.standard_normal((batch, mdim, k)).astype(np.float32)
    b = RNG.standard_normal((batch, k, n)).astype(np.float32)
    kern = xt.dispatch_gemm_batched_packed(GemmShape(mdim, n, k),
                                           GemmFlags.BETA_0)
    out = xt.unpack_batched(kern(xt.pack_batched(a, p),
                                 xt.pack_batched(b, p)), p)
    check(np.einsum("bmk,bkn->bmn", a, b), np.asarray(out), margin=1e-5)


def test_gemm_batched_packed_beta1():
    m = n = k = 32
    batch, p = 16, 4
    a = RNG.standard_normal((batch, m, k)).astype(np.float32)
    b = RNG.standard_normal((batch, k, n)).astype(np.float32)
    c = RNG.standard_normal((batch, m, n)).astype(np.float32)
    kern = xt.dispatch_gemm_batched_packed(GemmShape(m, n, k))
    out = xt.unpack_batched(
        kern(xt.pack_batched(a, p), xt.pack_batched(b, p),
             xt.pack_batched(c, p)), p)
    check(np.einsum("bmk,bkn->bmn", a, b) + c, np.asarray(out), margin=1e-5)


def test_gemm_batched_packed_bf16():
    import jax.numpy as jnp
    m = n = k = 32
    batch, p = 12, 4
    shape = GemmShape(m, n, k, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32)
    a = jnp.asarray(RNG.standard_normal((batch, m, k)), jnp.bfloat16)
    b = jnp.asarray(RNG.standard_normal((batch, k, n)), jnp.bfloat16)
    kern = xt.dispatch_gemm_batched_packed(shape, GemmFlags.BETA_0)
    out = xt.unpack_batched(kern(xt.pack_batched(a, p),
                                 xt.pack_batched(b, p)), p)
    want = np.einsum("bmk,bkn->bmn", np.asarray(a, np.float32),
                     np.asarray(b, np.float32))
    check(want, np.asarray(out), margin=3e-2)


def test_gemm_batched_packed_rejects():
    with pytest.raises(ValueError):
        xt.dispatch_gemm_batched_packed(GemmShape(32, 32, 16))  # k != n
    with pytest.raises(ValueError):
        xt.dispatch_gemm_batched_packed(GemmShape(32, 48, 48))  # 48 !| 128
    with pytest.raises(ValueError):
        xt.pack_batched(np.zeros((10, 4, 4), np.float32), 4)  # 10 % 4


def test_pack_unpack_roundtrip():
    x = RNG.standard_normal((24, 8, 16)).astype(np.float32)
    p = 8
    packed = xt.pack_batched(x, p)
    assert packed.shape == (3, 8, 128)
    np.testing.assert_array_equal(np.asarray(xt.unpack_batched(packed, p)), x)


@pytest.mark.parametrize("k,br", [(64, 8), (32, 16), (128, 4)])
def test_brgemm_packed(k, br):
    import jax.numpy as jnp
    m, n = 32, 64
    q = xt.brgemm_pack_factor(GemmShape(m, n, k))
    assert q == 128 // k
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br))
    got = np.asarray(kern(xt.pack_batched(a, q), jnp.asarray(b)))
    want = np.einsum("bmk,bkn->mn", a, b)
    check(want, got, margin=1e-5)


def test_brgemm_packed_beta1_and_reject():
    import jax.numpy as jnp
    m, n, k, br = 16, 32, 64, 4
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    c = RNG.standard_normal((m, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_packed(
        GemmShape(m, n, k), GemmFlags.NONE,
        BatchReduceConfig(BatchReduceType.STRIDE, br))
    got = np.asarray(kern(xt.pack_batched(a, 2), jnp.asarray(b),
                          jnp.asarray(c)))
    check(np.einsum("bmk,bkn->mn", a, b) + c, got, margin=1e-5)
    with pytest.raises(ValueError):
        xt.dispatch_brgemm_packed(GemmShape(16, 16, 48))   # 48 !| 128
    with pytest.raises(ValueError):
        kern(xt.pack_batched(a, 2)[:1], jnp.asarray(b)[:3])  # br % q


def test_gemm_batched_packed_fused_epilogue():
    from libxsmm_tpu.descriptor import UnaryType
    m = n = k = 32
    batch, p = 16, 4
    a = RNG.standard_normal((batch, m, k)).astype(np.float32)
    b = RNG.standard_normal((batch, k, n)).astype(np.float32)
    kern = xt.dispatch_gemm_batched_packed(GemmShape(m, n, k),
                                           GemmFlags.BETA_0,
                                           cp_type=UnaryType.RELU)
    out = xt.unpack_batched(kern(xt.pack_batched(a, p),
                                 xt.pack_batched(b, p)), p)
    want = np.maximum(np.einsum("bmk,bkn->bmn", a, b), 0.0)
    check(want, np.asarray(out), margin=1e-5)
    with pytest.raises(ValueError):
        xt.dispatch_gemm_batched_packed(GemmShape(m, n, k),
                                        cp_type=UnaryType.DROPOUT)


def test_gemm_batched_packed_int8():
    import jax.numpy as jnp
    m = n = k = 32
    batch, p = 12, 4
    shape = GemmShape(m, n, k, a_in_type=Datatype.I8,
                      b_in_type=Datatype.I8, out_type=Datatype.I32)
    a = RNG.integers(-50, 50, (batch, m, k)).astype(np.int8)
    b = RNG.integers(-50, 50, (batch, k, n)).astype(np.int8)
    kern = xt.dispatch_gemm_batched_packed(shape, GemmFlags.BETA_0)
    out = xt.unpack_batched(kern(xt.pack_batched(jnp.asarray(a), p),
                                 xt.pack_batched(jnp.asarray(b), p)), p)
    want = np.einsum("bmk,bkn->bmn", a.astype(np.int32),
                     b.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(out), want)
    from libxsmm_tpu.descriptor import UnaryType
    with pytest.raises(ValueError):
        xt.dispatch_gemm_batched_packed(shape, cp_type=UnaryType.GELU)


def test_brgemm_packed_nondivisible_groups():
    # groups % gg != 0: the trailing grid step's Pallas padding must NOT be
    # accumulated into the shared C (review finding: undefined-data sum)
    import jax.numpy as jnp
    m = n = 64
    k, br = 64, 20            # q=2 -> groups=10, gg=8 -> steps=2, tail=6
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br))
    got = np.asarray(kern(xt.pack_batched(a, 2), jnp.asarray(b)))
    check(np.einsum("bmk,bkn->mn", a, b), got, margin=1e-4)


def test_gemm_batched_empty_batch():
    # a zero-length batch must return an empty result, not divide by zero
    # inside the Pallas builder (review finding)
    import jax.numpy as jnp
    shape = GemmShape(32, 32, 32)
    kern = xt.dispatch_gemm_batched(shape, GemmFlags.BETA_0)
    out = np.asarray(kern(jnp.zeros((0, 32, 32), jnp.float32),
                          jnp.zeros((0, 32, 32), jnp.float32)))
    assert out.shape == (0, 32, 32)
    kp = xt.dispatch_gemm_batched_packed(shape, GemmFlags.BETA_0)
    outp = np.asarray(kp(jnp.zeros((0, 32, 4 * 32), jnp.float32),
                         jnp.zeros((0, 32, 4 * 32), jnp.float32)))
    assert outp.shape == (0, 32, 4 * 32)


def test_dropout_p_domain():
    # p=1.0 previously escaped as a bare ZeroDivisionError from inside the
    # kernel; the entry points must reject the domain clearly
    import jax.numpy as jnp

    from libxsmm_tpu.kernels import eltwise_pallas
    x = jnp.ones((8, 16), jnp.float32)
    with pytest.raises(ValueError, match="dropout probability"):
        eltwise_pallas.dropout(x, 0, 1.0)
    with pytest.raises(ValueError, match="dropout probability"):
        eltwise_pallas.dropout_inv(x, jnp.ones((8, 16), jnp.uint8), 1.0)


def test_gemm_batched_beta0_rejects_c():
    # BETA_0 + c would silently diverge between the Pallas and XLA
    # candidates; the dispatcher must reject it instead
    kern = xt.dispatch_gemm_batched(GemmShape(16, 16, 16), GemmFlags.BETA_0)
    a = RNG.standard_normal((4, 16, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        kern(a, a, a)


def test_gemm_batched_packed_grad():
    # packed SMM is differentiable via its custom VJP (XLA-math backward)
    import jax
    import jax.numpy as jnp
    m = n = k = 32
    batch, p = 8, 4
    a = jnp.asarray(RNG.standard_normal((batch, m, k)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((batch, k, n)), jnp.float32)
    kern = xt.dispatch_gemm_batched_packed(GemmShape(m, n, k),
                                           GemmFlags.BETA_0)
    ap, bp = xt.pack_batched(a, p), xt.pack_batched(b, p)

    def loss(ap_, bp_):
        return jnp.sum(kern(ap_, bp_) ** 2)

    da_p, db_p = jax.grad(loss, argnums=(0, 1))(ap, bp)
    # oracle: d/dA sum((AB)^2) = 2 (AB) B^T ; d/dB = 2 A^T (AB)
    ab = np.einsum("bmk,bkn->bmn", np.asarray(a), np.asarray(b))
    want_da = 2 * np.einsum("bmn,bkn->bmk", ab, np.asarray(b))
    want_db = 2 * np.einsum("bmk,bmn->bkn", np.asarray(a), ab)
    check(want_da, np.asarray(xt.unpack_batched(da_p, p)), margin=1e-3)
    check(want_db, np.asarray(xt.unpack_batched(db_p, p)), margin=1e-3)


def test_brgemm_packed_grad():
    import jax
    import jax.numpy as jnp
    m, n, k, br, q = 16, 32, 64, 8, 2
    a = jnp.asarray(RNG.standard_normal((br, m, k)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((br, k, n)), jnp.float32)
    kern = xt.dispatch_brgemm_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br))
    ap = xt.pack_batched(a, q)

    def loss(ap_, b_):
        return jnp.sum(kern(ap_, b_) ** 2)

    da_p, db = jax.grad(loss, argnums=(0, 1))(ap, b)
    cc = np.einsum("bmk,bkn->mn", np.asarray(a), np.asarray(b))
    want_da = 2 * np.einsum("mn,bkn->bmk", cc, np.asarray(b))
    want_db = 2 * np.einsum("bmk,mn->bkn", np.asarray(a), cc)
    check(want_da, np.asarray(xt.unpack_batched(da_p, q)), margin=1e-3)
    check(want_db, np.asarray(db), margin=1e-3)


def test_gemm_batched_packed_tuned():
    # tune=True: compile-variant autotune picks a step size and stays correct
    a = RNG.standard_normal((16, 32, 32)).astype(np.float32)
    b = RNG.standard_normal((16, 32, 32)).astype(np.float32)
    kern = xt.dispatch_gemm_batched_packed(GemmShape(32, 32, 32),
                                           GemmFlags.BETA_0, tune=True)
    out = xt.unpack_batched(kern(xt.pack_batched(a, 4),
                                 xt.pack_batched(b, 4)), 4)
    check(np.einsum("bmk,bkn->bmn", a, b), np.asarray(out), margin=1e-5)


# ---------------------------------------------------------------------------
# MX microscaling + sub-byte GEMM dtypes (reference gating
# include/libxsmm_typedefs.h:218-246, generator_gemm.c:41-57, 272-296)
# ---------------------------------------------------------------------------

from libxsmm_tpu import quant as q_


def _mx_pair_a(m, k, fmt):
    a = (RNG.standard_normal((m, k)) * 3).astype(np.float32)
    # normalize each 32-block's amax to a power of two so the e5m2 payload
    # cannot overflow to inf (the reference's MXBF8 quant overflows for
    # block mantissas > 1.875 — faithful, but it would poison the matmul
    # comparison with inf-inf)
    ab = a.reshape(m, k // 32, 32).astype(np.float64)
    amax = np.abs(ab).max(-1, keepdims=True)
    # float64 throughout: f32 log2 rounds values like 3.9999998 up to
    # exactly 2.0, which would leave the block un-normalized
    a = (ab * (np.exp2(np.floor(np.log2(amax))) / amax)
         ).reshape(m, k).astype(np.float32)
    quantize = {Datatype.MXFP4X2: q_.mxfp4_quantize_blocks,
                Datatype.NVFP4X2: q_.nvfp4_quantize_blocks,
                Datatype.MXBF8: q_.mxbf8_quantize_blocks,
                Datatype.MXBF6: lambda x: q_.mxfp6_quantize_blocks(x, "e3m2"),
                Datatype.MXHF6: lambda x: q_.mxfp6_quantize_blocks(x, "e2m3"),
                }[fmt]
    dequantize = {Datatype.MXFP4X2: q_.mxfp4_dequantize_blocks,
                  Datatype.NVFP4X2: q_.nvfp4_dequantize_blocks,
                  Datatype.MXBF8: q_.mxbf8_dequantize_blocks,
                  Datatype.MXBF6: lambda p, s: q_.mxfp6_dequantize_blocks(
                      p, s, "e3m2"),
                  Datatype.MXHF6: lambda p, s: q_.mxfp6_dequantize_blocks(
                      p, s, "e2m3"),
                  }[fmt]
    payload, scales = quantize(a)
    adec = np.asarray(dequantize(payload, scales))
    return (payload, scales), adec


@pytest.mark.parametrize("fmt", [Datatype.MXFP4X2, Datatype.NVFP4X2,
                                 Datatype.MXBF8, Datatype.MXBF6,
                                 Datatype.MXHF6],
                         ids=lambda d: d.value)
def test_gemm_mx_a(fmt):
    """MX A operand as a (payload, scales) pair; result must equal the
    decoded-operand matmul exactly (decode is exact in bf16)."""
    m, n, k = 16, 64, 64
    pair, adec = _mx_pair_a(m, k, fmt)
    b = (RNG.standard_normal((k, n))).astype(np.float32)
    kern = xt.dispatch_gemm(
        GemmShape(m, n, k, a_in_type=fmt, b_in_type=Datatype.BF16,
                  out_type=Datatype.F32),
        GemmFlags.BETA_0 | GemmFlags.VNNI_A)
    import jax.numpy as jnp
    got = np.asarray(kern(pair, jnp.asarray(b, jnp.bfloat16)))
    want = adec.astype(np.float32) @ np.asarray(
        jnp.asarray(b, jnp.bfloat16), np.float32)
    check(want, got, margin=2e-2 * max(1.0, np.abs(want).max()))


def test_brgemm_ext_mx_a_decodes():
    """MX packed operands through the EXT entry: the (payload, scales) pair
    must decode inside the kernel like _build_gemm's path does (review
    finding: ext previously crashed deep in _gemm_core), and a/b argops on
    packed operands are cleanly rejected."""
    import jax.numpy as jnp

    from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                        BinaryPostops, UnaryArgops)
    m, n, k = 16, 64, 64
    fmt = Datatype.MXBF8
    pair, adec = _mx_pair_a(m, k, fmt)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    shape = GemmShape(m, n, k, a_in_type=fmt, b_in_type=Datatype.BF16,
                      out_type=Datatype.F32)
    kern = xt.dispatch_brgemm_ext(
        shape, GemmFlags.BETA_0 | GemmFlags.VNNI_A,
        BatchReduceConfig(BatchReduceType.NONE),
        argops=UnaryArgops(cp_type=UnaryType.RELU))
    got = np.asarray(kern(pair, jnp.asarray(b, jnp.bfloat16)))
    want = np.maximum(adec.astype(np.float32)
                      @ np.asarray(jnp.asarray(b, jnp.bfloat16), np.float32),
                      0.0)
    check(want, got, margin=2e-2 * max(1.0, np.abs(want).max()))
    with pytest.raises(ValueError, match="argops"):
        xt.dispatch_brgemm_ext(
            shape, GemmFlags.BETA_0 | GemmFlags.VNNI_A,
            BatchReduceConfig(BatchReduceType.NONE),
            argops=UnaryArgops(ap_type=UnaryType.X2))


def test_batched_beta1_requires_c():
    # beta=1 without the C operand silently computed the beta=0 result
    # (review finding); all batched/packed entries must reject it
    import jax.numpy as jnp
    a = jnp.asarray(RNG.standard_normal((4, 32, 32)), jnp.float32)
    kern = xt.dispatch_gemm_batched(GemmShape(32, 32, 32), GemmFlags.NONE)
    with pytest.raises(ValueError, match="needs the C operand"):
        kern(a, a)
    kp = xt.dispatch_gemm_batched_packed(GemmShape(32, 32, 32),
                                         GemmFlags.NONE)
    ap = jnp.asarray(RNG.standard_normal((4, 32, 128)), jnp.float32)
    with pytest.raises(ValueError, match="needs the C operand"):
        kp(ap, ap)
    from libxsmm_tpu.descriptor import BatchReduceConfig, BatchReduceType
    kb = xt.dispatch_brgemm_packed(
        GemmShape(32, 32, 32), GemmFlags.NONE,
        BatchReduceConfig(BatchReduceType.STRIDE, 4))
    b4 = jnp.asarray(RNG.standard_normal((4, 32, 32)), jnp.float32)
    with pytest.raises(ValueError, match="needs the C operand"):
        kb(xt.pack_batched(np.asarray(b4), 4), b4)


def test_batched_rejects_vnni_flags():
    # the batched/packed entries contract NORM layout only; VNNI flags
    # must be rejected at dispatch, not silently mis-contracted
    with pytest.raises(ValueError, match="VNNI"):
        xt.dispatch_gemm_batched(
            GemmShape(32, 32, 32, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32),
            GemmFlags.BETA_0 | GemmFlags.VNNI_A)
    with pytest.raises(ValueError, match="VNNI"):
        xt.dispatch_gemm_batched_packed(
            GemmShape(32, 32, 32, a_in_type=Datatype.BF16,
                      b_in_type=Datatype.BF16, out_type=Datatype.F32),
            GemmFlags.BETA_0 | GemmFlags.VNNI_A)


def test_gemm_mx_a_and_b():
    """MXFP4 x MXFP4 (reference combo generator_gemm.c:276-277)."""
    m, n, k = 16, 32, 64
    pair_a, adec = _mx_pair_a(m, k, Datatype.MXFP4X2)
    bt = (RNG.standard_normal((n, k)) * 2).astype(np.float32)
    pb, sb = q_.mxfp4_quantize_blocks(bt)       # quantized along k
    bdec = np.asarray(q_.mxfp4_dequantize_blocks(pb, sb)).T   # (k, n)
    pair_b = (np.asarray(pb).T, np.asarray(sb).T)  # payload (k/2,n), scales (k/32,n)
    kern = xt.dispatch_gemm(
        GemmShape(m, n, k, a_in_type=Datatype.MXFP4X2,
                  b_in_type=Datatype.MXFP4X2, out_type=Datatype.F32),
        GemmFlags.BETA_0)
    got = np.asarray(kern(pair_a, pair_b))
    want = adec.astype(np.float32) @ bdec.astype(np.float32)
    check(want, got, margin=1e-3 * max(1.0, np.abs(want).max()))


def test_brgemm_mx_a_stride():
    m, n, k, br = 8, 32, 64, 4
    a = (RNG.standard_normal((br, m, k)) * 2).astype(np.float32)
    payload, scales = q_.mxfp4_quantize_blocks(a)
    adec = np.asarray(q_.mxfp4_dequantize_blocks(payload, scales))
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    import jax.numpy as jnp
    bb = jnp.asarray(b, jnp.bfloat16)
    kern = xt.dispatch_brgemm(
        GemmShape(m, n, k, a_in_type=Datatype.MXFP4X2,
                  b_in_type=Datatype.BF16, out_type=Datatype.F32),
        GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br))
    got = np.asarray(kern((payload, scales), bb))
    want = np.einsum("bmk,bkn->mn", adec.astype(np.float32),
                     np.asarray(bb, np.float32))
    check(want, got, margin=5e-2 * max(1.0, np.abs(want).max()))


@pytest.mark.parametrize("a_dt", [Datatype.I4X2, Datatype.U4X2,
                                  Datatype.I2X4, Datatype.I1X8],
                         ids=lambda d: d.value)
def test_gemm_subbyte_int(a_dt):
    """Sub-byte integer A x I8 B -> exact I32 (value semantics from
    generator_gemm_reference_impl.c: sign-extended nibbles / ternary 2-bit
    LUT / +-1 bits)."""
    m, n, k = 16, 32, 64
    if a_dt in (Datatype.I4X2, Datatype.U4X2):
        lo, hi = (0, 15) if a_dt == Datatype.U4X2 else (-8, 7)
        vals = RNG.integers(lo, hi + 1, (m, k)).astype(np.int32)
    elif a_dt == Datatype.I2X4:
        vals = RNG.integers(-1, 2, (m, k)).astype(np.int32)
    else:
        vals = RNG.choice([-1, 1], (m, k)).astype(np.int32)
    packed = np.asarray(q_.pack_subbyte_gemm(a_dt, vals))
    bsigned = RNG.integers(-128, 128, (k, n)).astype(np.int8)
    kern = xt.dispatch_gemm(
        GemmShape(m, n, k, a_in_type=a_dt, b_in_type=Datatype.I8,
                  out_type=Datatype.I32),
        GemmFlags.BETA_0 | GemmFlags.VNNI_A)
    got = np.asarray(kern(packed, bsigned))
    want = vals.astype(np.int64) @ bsigned.astype(np.int64)
    np.testing.assert_array_equal(got, want.astype(np.int32))
    # round-trip of the packer itself
    np.testing.assert_array_equal(
        np.asarray(q_.unpack_subbyte_gemm(a_dt, packed)), vals)


def test_gemm_i4_f16():
    """I4X2 x F16 dequant GEMM (generator_gemm.c:52-57)."""
    m, n, k = 8, 32, 32
    vals = RNG.integers(-8, 8, (m, k)).astype(np.int32)
    packed = np.asarray(q_.pack_subbyte_gemm(Datatype.I4X2, vals))
    b = (RNG.standard_normal((k, n))).astype(np.float16)
    kern = xt.dispatch_gemm(
        GemmShape(m, n, k, a_in_type=Datatype.I4X2, b_in_type=Datatype.F16,
                  out_type=Datatype.F32),
        GemmFlags.BETA_0 | GemmFlags.VNNI_A)
    got = np.asarray(kern(packed, b))
    want = vals.astype(np.float32) @ b.astype(np.float32)
    check(want, got, margin=1e-1 * max(1.0, np.abs(want).max()))


def test_gemm_packed_combo_rejection():
    with pytest.raises(ValueError):
        xt.dispatch_gemm(GemmShape(8, 8, 64, a_in_type=Datatype.I2X4,
                                   b_in_type=Datatype.F32,
                                   out_type=Datatype.F32), GemmFlags.BETA_0)
    with pytest.raises(ValueError):
        xt.dispatch_gemm(GemmShape(8, 8, 64, a_in_type=Datatype.MXFP4X2,
                                   b_in_type=Datatype.BF16,
                                   out_type=Datatype.F32),
                         GemmFlags.BETA_0 | GemmFlags.TRANS_B)
    with pytest.raises(ValueError):
        xt.dispatch_gemm(GemmShape(8, 8, 64, a_in_type=Datatype.MXFP4X2,
                                   b_in_type=Datatype.BF16,
                                   out_type=Datatype.MXFP4X2),
                         GemmFlags.BETA_0)


def test_brgemm_ext_packed_fused():
    """Fused relu+bias BRGEMM on the lane-packed Pallas path matches the
    XLA ext path (reference fused AMX epilogue analogue)."""
    from libxsmm_tpu.descriptor import BinaryPostops, BinaryType
    m, n, k, br, q = 16, 32, 64, 8, 2
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    bias = RNG.standard_normal((1, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_ext_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br),
        argops=UnaryArgops(cp_type=UnaryType.RELU),
        postops=BinaryPostops(d_type=BinaryType.ADD))
    ap = xt.pack_batched(a, q)
    got = np.asarray(kern(ap, b, d_op=bias))
    want = np.maximum(np.einsum("bmk,bkn->mn", a, b) + bias, 0.0)
    check(want, got, margin=1e-3)


def test_brgemm_ext_packed_beta1_gelu():
    from libxsmm_tpu.descriptor import BinaryPostops, BinaryType
    import scipy.special
    m, n, k, br, q = 16, 32, 64, 8, 2
    a = (RNG.standard_normal((br, m, k)) * 0.2).astype(np.float32)
    b = (RNG.standard_normal((br, k, n)) * 0.2).astype(np.float32)
    c = RNG.standard_normal((m, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_ext_packed(
        GemmShape(m, n, k), GemmFlags.NONE,
        BatchReduceConfig(BatchReduceType.STRIDE, br),
        argops=UnaryArgops(cp_type=UnaryType.GELU))
    ap = xt.pack_batched(a, q)
    got = np.asarray(kern(ap, b, c))
    acc = np.einsum("bmk,bkn->mn", a, b) + c
    want = 0.5 * acc * (1 + scipy.special.erf(acc / np.sqrt(2)))
    check(want, got, margin=1e-3)


def test_brgemm_ext_packed_rejects():
    from libxsmm_tpu.descriptor import BinaryPostops, BinaryType
    with pytest.raises(ValueError):
        xt.dispatch_brgemm_ext_packed(
            GemmShape(16, 32, 64), GemmFlags.BETA_0,
            argops=UnaryArgops(cp_type=UnaryType.SQRT))
    with pytest.raises(ValueError):
        xt.dispatch_brgemm_ext_packed(
            GemmShape(16, 32, 64), GemmFlags.BETA_0,
            postops=BinaryPostops(d_type=BinaryType.MUL))
    with pytest.raises(ValueError):
        xt.dispatch_brgemm_ext_packed(
            GemmShape(16, 32, 63), GemmFlags.BETA_0)


def test_bcsc_union_strategy():
    from libxsmm_tpu.descriptor import SpgemmConfig
    from libxsmm_tpu.ops.sparse import BcscMatrix, create_packed_spgemm_bcsc
    rng = np.random.default_rng(5)
    m, k, n, bk, bn = 64, 256, 256, 32, 32
    bmat = rng.standard_normal((k, n)).astype(np.float32)
    keep = rng.random((k // bk, n // bn)) < 0.25
    bmat *= np.kron(keep, np.ones((bk, bn), np.float32))
    bcsc = BcscMatrix.from_dense(bmat, bk, bn)
    kern = create_packed_spgemm_bcsc(
        GemmShape(m, n, k), GemmFlags.BETA_0, SpgemmConfig(1, bk, bn),
        bcsc.indptr, bcsc.indices, strategy="union")
    assert "union" in kern.name
    a = rng.standard_normal((m, k)).astype(np.float32)
    got = np.asarray(kern(a, bcsc.data))
    check(a @ bmat, got, margin=1e-4)
    # beta=1 path
    c = rng.standard_normal((m, n)).astype(np.float32)
    check(a @ bmat + c, np.asarray(kern(a, bcsc.data, c)), margin=1e-4)


def test_gemm_mx_a_f32_b():
    """MX A with a native F32 B: decode target follows the partner dtype
    (mixed bf16/f32 dot_general operands would be rejected)."""
    m, n, k = 16, 32, 64
    pair, adec = _mx_pair_a(m, k, Datatype.MXFP4X2)
    b = RNG.standard_normal((k, n)).astype(np.float32)
    kern = xt.dispatch_gemm(
        GemmShape(m, n, k, a_in_type=Datatype.MXFP4X2,
                  b_in_type=Datatype.F32, out_type=Datatype.F32),
        GemmFlags.BETA_0)
    got = np.asarray(kern(pair, b))
    want = adec.astype(np.float32) @ b
    check(want, got, margin=1e-2 * max(1.0, np.abs(want).max()))
    with pytest.raises(ValueError):
        xt.dispatch_gemm(GemmShape(m, n, k, a_in_type=Datatype.MXFP4X2,
                                   b_in_type=Datatype.F16,
                                   out_type=Datatype.F32), GemmFlags.BETA_0)


def test_gemm_bf32_comp():
    """BF32 comp_type: f32 storage with the tf32-like bf16x3 MXU pass
    (matmul_precision -> HIGH); accuracy between bf16 and f32."""
    m, n, k = 32, 32, 64
    a, b = _rand((m, k)), _rand((k, n))
    shape = GemmShape(m, n, k, comp_type=Datatype.BF32)
    kern = xt.dispatch_gemm(shape, GemmFlags.BETA_0)
    got = np.asarray(kern(a, b))
    want = a.astype(np.float64) @ b.astype(np.float64)
    info_err = np.abs(got - want).max() / np.abs(want).max()
    assert info_err < 2e-3        # far better than raw bf16 (~1e-2)


@pytest.mark.parametrize("mult,sg", [(4, 2), (8, 1), (8, 4)])
def test_brgemm_packed_deep_pack(mult, sg):
    """pack_q deep-contraction variant: pack_q batch items fold into ONE
    (m, q*k)x(q*k, n) dot per group. Numerics must match the default-pack
    kernel and the oracle (only the accumulation grouping changes); the
    gradient (custom VJP) must follow the layout."""
    import jax.numpy as jnp
    m, n, k, br = 16, 32, 64, 32
    q = xt.brgemm_pack_factor(GemmShape(m, n, k)) * mult
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br),
        step_groups=sg, pack_q=q)
    a_p = xt.pack_batched(a, q)
    got = np.asarray(kern(a_p, jnp.asarray(b)))
    want = np.einsum("bmk,bkn->mn", a, b)
    check(want, got, margin=1e-5)
    # gradient through the deep layout
    import jax
    ga, gb = jax.grad(lambda ap, bb: jnp.sum(kern(ap, bb) ** 2),
                      argnums=(0, 1))(a_p, jnp.asarray(b))
    gan, gbn = jax.grad(
        lambda aa, bb: jnp.sum(jnp.einsum("bmk,bkn->mn", aa, bb,
                                          precision="highest") ** 2),
        argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    check(np.asarray(xt.pack_batched(gan, q)), np.asarray(ga), margin=1e-4)
    check(np.asarray(gbn), np.asarray(gb), margin=1e-4)


def test_brgemm_packed_deep_pack_rejects():
    # pack_q must be a multiple of 128//k and divide br
    m, n, k, br = 16, 32, 64, 12
    kern = xt.dispatch_brgemm_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br), pack_q=3)
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    with pytest.raises(ValueError, match="pack"):
        kern(xt.pack_batched(a, 3), b)   # q=3 not a multiple of 2


def test_brgemm_ext_packed_deep_pack():
    """Fused epilogue on the deep-pack layout (bench sweeps both axes)."""
    import jax.numpy as jnp
    from libxsmm_tpu.descriptor import (BinaryPostops, BinaryType,
                                        UnaryArgops, UnaryType)
    m, n, k, br = 16, 32, 64, 16
    q = xt.brgemm_pack_factor(GemmShape(m, n, k)) * 4
    a = RNG.standard_normal((br, m, k)).astype(np.float32)
    b = RNG.standard_normal((br, k, n)).astype(np.float32)
    bias = RNG.standard_normal((1, n)).astype(np.float32)
    kern = xt.dispatch_brgemm_ext_packed(
        GemmShape(m, n, k), GemmFlags.BETA_0,
        BatchReduceConfig(BatchReduceType.STRIDE, br),
        argops=UnaryArgops(cp_type=UnaryType.RELU),
        postops=BinaryPostops(d_type=BinaryType.ADD), pack_q=q)
    got = np.asarray(kern(xt.pack_batched(a, q), jnp.asarray(b),
                          d_op=jnp.asarray(bias)))
    want = np.maximum(np.einsum("bmk,bkn->mn", a, b) + bias, 0.0)
    check(want, got, margin=1e-5)


def test_brgemm_packed_acc_scratch_matches():
    """acc_scratch=True (the VERDICT r2/r3 scratch-accumulator schedule)
    is numerically identical to the default output-block accumulation,
    across beta and fused-epilogue variants."""
    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import (BatchReduceConfig, BatchReduceType,
                                        BinaryPostops, BinaryType,
                                        GemmFlags, GemmShape, UnaryArgops,
                                        UnaryType)
    from libxsmm_tpu.dtypes import Datatype

    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    br, m, n, k = 24, 32, 64, 32
    shape = GemmShape(m, n, k)
    a = jnp.asarray(rng.standard_normal((br, m, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((br, k, n)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
    cfg = BatchReduceConfig(BatchReduceType.STRIDE, br)
    q = xt.brgemm_pack_factor(shape)
    a_p = xt.pack_batched(a, q)
    # step_groups=5 forces a RAGGED final step (groups=6) in both variants
    base = xt.dispatch_brgemm_packed(shape, GemmFlags.BETA_0, cfg,
                                     step_groups=5)
    scr = xt.dispatch_brgemm_packed(shape, GemmFlags.BETA_0, cfg,
                                    step_groups=5, acc_scratch=True)
    np.testing.assert_allclose(np.asarray(base(a_p, b)),
                               np.asarray(scr(a_p, b)), rtol=1e-6)
    ref = np.einsum("bmk,bkn->mn", np.asarray(a, np.float64),
                    np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(scr(a_p, b)), ref,
                               rtol=1e-4, atol=1e-4)
    # fused relu+bias pair
    fb = xt.dispatch_brgemm_ext_packed(
        shape, GemmFlags.BETA_0, cfg,
        argops=UnaryArgops(cp_type=UnaryType.RELU),
        postops=BinaryPostops(d_type=BinaryType.ADD), step_groups=5)
    fs = xt.dispatch_brgemm_ext_packed(
        shape, GemmFlags.BETA_0, cfg,
        argops=UnaryArgops(cp_type=UnaryType.RELU),
        postops=BinaryPostops(d_type=BinaryType.ADD), step_groups=5,
        acc_scratch=True)
    np.testing.assert_allclose(np.asarray(fb(a_p, b, d_op=bias)),
                               np.asarray(fs(a_p, b, d_op=bias)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fs(a_p, b, d_op=bias)),
                               np.maximum(ref + np.asarray(bias), 0.0),
                               rtol=1e-4, atol=1e-4)
