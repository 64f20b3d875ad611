"""Public-API parity tail: L0 math/memory/string utilities, struct-based
equation builder, typed fsspmdm wrappers, archid get/set, xmmdispatch.

Oracles are independent NumPy/Python computations of the reference
contracts (include/libxsmm_math.h, include/libxsmm_memory.h,
include/libxsmm.h:150-162, include/libxsmm_fsspmdm.h).
"""

import math

import numpy as np
import pytest

import libxsmm_tpu as x
from libxsmm_tpu.utils import mathx, memutil


# ---------------------------------------------------------------------------
# math utils
# ---------------------------------------------------------------------------

def test_isqrt_family():
    for v in (0, 1, 2, 3, 4, 15, 16, 17, 2**31, 2**32 - 1):
        assert x.isqrt_u32(v & 0xFFFFFFFF) == math.isqrt(v & 0xFFFFFFFF)
        assert x.isqrt_u64(v) == math.isqrt(v)
    # isqrt2_u32: largest FACTOR <= sqrt
    assert x.isqrt2_u32(12) == 3      # sqrt(12)=3.46; divisors<=3: 1,2,3
    assert x.isqrt2_u32(36) == 6
    assert x.isqrt2_u32(17) == 1      # prime: only 1 <= sqrt


def test_primes_u32():
    assert x.primes_u32(360) == [2, 2, 2, 3, 3, 5]
    assert x.primes_u32(17) == []     # reference: lone prime yields count 0
    assert x.primes_u32(2) == [2]
    assert x.primes_u32(1) == []
    assert x.primes_u32(0) == []


def test_primes_contract_even_and_composite():
    # product of returned factors reconstructs the number when non-empty
    for v in (4, 6, 12, 1024, 9973 * 2, 123456):
        f = x.primes_u32(v)
        if f:
            assert int(np.prod(f)) == v


def test_product_limit_upper():
    # largest divisor <= limit
    assert x.product_limit(12, 5) == 4
    assert x.product_limit(12, 6) == 6
    assert x.product_limit(17, 4) == 1
    assert x.product_limit(8, 100) == 8     # capped at product
    assert x.product_limit(0, 7) == 0


def test_product_limit_lower():
    # smallest valid blocking >= limit (reference is_lower contract)
    assert x.product_limit(12, 5, True) in (6, 12)  # >= 5
    assert x.product_limit(12, 5, True) >= 5
    assert x.product_limit(17, 5, True) == 17       # prime: only product
    # limit >= product: round limit up to a multiple of product
    assert x.product_limit(4, 10, True) == 12


def test_coprime():
    for n in (7, 12, 100, 101, 4096):
        for minco in (1, 3, int(math.isqrt(n))):
            r = x.coprime(n, minco)
            assert 0 < r < n
            assert math.gcd(r, n) == 1
    assert x.coprime(0, 5) == 0
    assert x.coprime(1, 5) == 0
    r = x.coprime2(100)
    assert math.gcd(r, 100) == 1 and r <= 10


def test_remainder_reference_example():
    # documented example: libxsmm_remainder(23, 8) => 184
    assert x.remainder(23, 8) == 184
    # with a remainder target, any multiple with remainder <= target stops
    r = x.remainder(23, 8, remainder_target=2)
    assert r % 8 == 0 and r % 23 <= 2


def test_kahan_sum():
    # ten 0.1s: naive float summation gives 0.9999999999999999, compensated
    # summation lands exactly on 1.0 (like math.fsum)
    acc, comp = 0.0, 0.0
    naive = 0.0
    for _ in range(10):
        acc, comp = x.kahan_sum(0.1, acc, comp)
        naive += 0.1
    assert acc == 1.0
    assert naive != 1.0


def test_scalar_math():
    assert x.dsqrt(2.0) == math.sqrt(2.0)
    assert x.ssqrt(2.0) == float(np.float32(math.sqrt(np.float32(2.0))))
    assert x.nearbyint(2.5) == 2.0   # round-half-even
    assert x.nearbyint(3.5) == 4.0
    assert x.nearbyintf(-2.5) == -2.0


# ---------------------------------------------------------------------------
# memory/hash/string utils
# ---------------------------------------------------------------------------

def test_hash_crc32c_known_vector():
    # the INTERNAL primitive keeps the canonical Castagnoli convention
    # (~seed in / ~crc out; check value 0xE3069283) — it addresses the
    # native KV/table and is self-consistent.
    assert memutil._crc32c_py(b"123456789", 0) == 0xE3069283
    nat = __import__("libxsmm_tpu.native_bridge", fromlist=["crc32"]).crc32(
        b"123456789", 0)
    if nat is not None:
        assert nat == 0xE3069283
    # the PUBLIC libxsmm_hash analogue is value-identical to the
    # reference's RAW crc32 (no pre/post complement — the SSE4.2
    # instruction path, src/libxsmm_hash.c): raw("123456789", 0) ==
    # 0x58E3FA20, independently cross-checked against a table-driven
    # raw CRC32C.
    assert x.hash(b"123456789", seed=0) == 0x58E3FA20
    # raw(seed, d) == ~canonical(~seed, d)
    assert x.hash(b"abc", seed=7) == \
        (~memutil._crc32c_py(b"abc", (~7) & 0xFFFFFFFF)) & 0xFFFFFFFF


def _raw_crc32c_oracle(data, seed=0):
    # independent table-driven raw CRC32C (reference convention)
    t = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
        t.append(c)
    crc = seed
    for b in data:
        crc = t[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc & 0xFFFFFFFF


def test_hash_folds_reference_values():
    # libxsmm_hash16(v) = raw_crc(seed=v>>16, low 16 LE bytes) & 0xFFFF
    v = 0xDEADBEEF
    want16 = _raw_crc32c_oracle((v & 0xFFFF).to_bytes(2, "little"),
                                v >> 16) & 0xFFFF
    assert x.hash16(v) == want16
    # libxsmm_hash8(v) folds hash16 through a 1-byte raw crc seeded v>>8
    want8 = _raw_crc32c_oracle(bytes([want16 & 0xFF]), v >> 8) & 0xFF
    assert x.hash8(v) == want8
    v64 = 0xDEADBEEFCAFEBABE
    want32 = _raw_crc32c_oracle((v64 & 0xFFFFFFFF).to_bytes(4, "little"),
                                v64 >> 32)
    assert x.hash32(v64) == want32


def test_hash_folds():
    assert 0 <= x.hash8(0xDEADBEEF) <= 0xFF
    assert 0 <= x.hash16(0xDEADBEEF) <= 0xFFFF
    assert 0 <= x.hash32(0xDEADBEEFCAFEBABE) <= 0xFFFFFFFF
    # deterministic
    assert x.hash8(123) == x.hash8(123)
    assert x.hash16(123) != x.hash16(124)


def test_hash_string():
    # <= 8 chars reinterpret directly (little-endian, zero-padded)
    assert x.hash_string("a") == ord("a")
    assert x.hash_string("ab") == ord("a") | (ord("b") << 8)
    assert x.hash_string("") == 0
    assert x.hash_string(None) == 0
    long_h = x.hash_string("a longer string than eight")
    assert long_h != 0 and long_h == x.hash_string("a longer string than eight")
    assert long_h != x.hash_string("a longer string than eighT")


def test_diff_and_diff_n():
    assert x.diff(b"abc", b"abc") == 0
    assert x.diff(b"abc", b"abd") != 0
    assert x.memcmp(np.arange(4), np.arange(4)) == 0
    # strided element search with wrap-around from hint
    bn = np.array([10, 20, 30, 40], np.int32).tobytes()
    a = np.int32(30).tobytes()
    assert x.diff_n(a, bn, 4, 4, 0, 4) == 2
    assert x.diff_n(a, bn, 4, 4, 3, 4) == 2     # wraps
    assert x.diff_n(np.int32(99).tobytes(), bn, 4, 4, 0, 4) == 4  # miss


def test_stristr_strimatch():
    assert x.stristr("Hello World", "WORLD") == 6
    assert x.stristr("Hello", "xyz") is None
    assert x.stristrn("abcdef", "CDX", 2) == 2   # only first 2 chars of b
    assert x.strimatch("alpha beta gamma", "BETA gamma") == 2
    assert x.strimatch("a b", "c d") == 0
    assert x.strimatch(None, "x") == -1
    # symmetry
    assert (x.strimatch("one two", "two three")
            == x.strimatch("two three", "one two"))


def test_aligned_malloc():
    buf = x.aligned_malloc(1000, 128)
    ok, align = x.aligned(buf)
    assert ok and align >= 64
    assert buf.ctypes.data % 128 == 0
    info = x.get_malloc_info(buf)
    assert info["size"] == 1000 and info["alignment"] >= 64
    buf[:4] = [1, 2, 3, 4]
    buf2 = x.realloc(buf, 2000)
    assert list(buf2[:4]) == [1, 2, 3, 4]
    assert buf2.ctypes.data % 128 == 0
    x.free(buf)


# ---------------------------------------------------------------------------
# scalar converts
# ---------------------------------------------------------------------------

def test_convert_aliases():
    import jax.numpy as jnp
    v = jnp.float32(1.00390625)  # between bf16 grid points
    bf_rne = x.rne_convert_fp32_bf16(v)
    bf_rnaz = x.rnaz_convert_fp32_bf16(v)
    assert bf_rne.dtype == jnp.bfloat16
    # the tie rounds differently: RNE to even mantissa, RNAZ away from zero
    assert float(x.convert_bf16_fp32(bf_rnaz)) >= float(
        x.convert_bf16_fp32(bf_rne))
    h = x.convert_fp32_f16(jnp.float32(0.1))
    assert h.dtype == jnp.float16
    assert abs(float(x.convert_f16_fp32(h)) - 0.1) < 1e-3
    e = x.rne_convert_f16_hf8(h)
    assert str(e.dtype) == "float8_e4m3fn"
    s = x.stochastic_convert_fp32_bf8(jnp.full((8, 128), 0.1, jnp.float32),
                                      seed=7)
    assert str(s.dtype) == "float8_e5m2"


# ---------------------------------------------------------------------------
# archid, registry iteration, xmmdispatch
# ---------------------------------------------------------------------------

def test_archid_get_set():
    from libxsmm_tpu.device import ARCHIDS
    orig = x.get_target_archid()
    try:
        x.set_target_archid(ARCHIDS["v5p"])
        assert x.get_target_archid() == ARCHIDS["v5p"]
        assert x.get_geometry().name == "v5p"
        with pytest.raises(ValueError):
            x.set_target_archid(31337)
    finally:
        x.set_target_archid(0)  # restore auto-detect
    assert x.get_target_archid() == orig


def test_registry_begin_next():
    x.xregister(b"parity-key", 42)
    try:
        it = x.get_registry_begin()
        found = False
        entry = x.get_registry_next(it)
        while entry is not None:
            if entry[0] == b"parity-key":
                assert entry[1] == 42
                found = True
            entry = x.get_registry_next(it)
        assert found
    finally:
        x.xrelease(b"parity-key")


def test_xmmdispatch_descriptor():
    import jax.numpy as jnp
    from libxsmm_tpu.descriptor import (GemmDescriptor, GemmFlags, GemmShape)
    shape = GemmShape(8, 8, 8)
    desc = GemmDescriptor(shape=shape, flags=GemmFlags.BETA_0)
    k = x.xmmdispatch(desc)
    # identical descriptor -> identical cached kernel (registry contract)
    assert x.xmmdispatch(GemmDescriptor(shape=shape,
                                        flags=GemmFlags.BETA_0)) is k
    a = jnp.ones((8, 8), jnp.float32)
    out = k(a, a)
    np.testing.assert_allclose(np.asarray(out), np.full((8, 8), 8.0),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# struct-based equation API
# ---------------------------------------------------------------------------

def test_meqn_struct_api():
    from libxsmm_tpu.descriptor import BinaryType, UnaryType
    from libxsmm_tpu.dtypes import Datatype

    idx = x.meqn_create()
    op_md = x.create_meqn_op_metadata(idx)
    x.meqn_push_back_binary_op(op_md, BinaryType.ADD)
    x.meqn_push_back_unary_op(x.create_meqn_op_metadata(idx), UnaryType.X2)
    x.meqn_push_back_arg(x.create_meqn_arg_metadata(idx, 0),
                         x.create_meqn_arg_shape(4, 8, 8, Datatype.F32),
                         x.create_matrix_arg_attributes())
    x.meqn_push_back_arg(x.create_meqn_arg_metadata(idx, 1),
                         x.create_meqn_arg_shape(4, 8, 8, Datatype.F32))
    fn = x.dispatch_meqn(idx, x.create_meqn_arg_shape(4, 8, 8, Datatype.F32))
    a = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((4, 8)).astype(np.float32)
    out = np.asarray(fn(a, b))
    np.testing.assert_allclose(out, a * a + b, rtol=1e-5)
    x.meqn_destroy(idx)


def test_meqn_desc_dispatch():
    from libxsmm_tpu.descriptor import BinaryType
    from libxsmm_tpu.dtypes import Datatype

    idx = x.meqn_create()
    x.meqn_push_back_binary_op(idx, BinaryType.MUL)
    x.meqn_push_back_arg(idx, 4, 4, 0)
    x.meqn_push_back_arg(idx, 4, 4, 1)
    desc = x.MeqnDescriptor(m=4, n=4, ldo=4, datatype=Datatype.F32,
                            eqn_idx=idx)
    fn = x.dispatch_meqn_desc(desc)
    a = np.full((4, 4), 3.0, np.float32)
    np.testing.assert_allclose(np.asarray(fn(a, a)), np.full((4, 4), 9.0))
    with pytest.raises(ValueError):
        x.dispatch_meqn_desc(x.MeqnDescriptor(4, 4, 7, Datatype.F32, idx))
    x.meqn_destroy(idx)


def test_meqn_set_args_accepted():
    # MATRIX_ARG_TYPE_SET args are supported (stacked (count, m, n) array
    # contract; see tests/test_equation.py::test_equation_set_args_brgemm
    # for the BRGEMM semantics) — only an unknown set_type rejects.
    idx = x.meqn_create()
    from libxsmm_tpu.descriptor import BinaryType
    x.meqn_push_back_binary_op(idx, BinaryType.BRGEMM)
    x.meqn_push_back_arg(
        x.create_meqn_arg_metadata(idx, 0),
        x.create_meqn_arg_shape(4, 4, 4),
        x.create_matrix_arg_attributes(arg_type=1, set_type=2,
                                       set_cardinality_hint=3))
    with pytest.raises(ValueError):
        x.meqn_push_back_arg(
            x.create_meqn_arg_metadata(idx, 1),
            x.create_meqn_arg_shape(4, 4, 4),
            x.create_matrix_arg_attributes(arg_type=1, set_type=7))
    x.meqn_destroy(idx)


# ---------------------------------------------------------------------------
# typed fsspmdm wrappers
# ---------------------------------------------------------------------------

def _sparse_a(m, k, dtype, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, k)).astype(dtype)
    a[rng.random((m, k)) > density] = 0
    return a


def test_sfsspmdm_roundtrip():
    a = _sparse_a(16, 32, np.float32)
    h = x.sfsspmdm_create(n=64, a_dense=a, alpha=2.0, beta=0)
    b = np.random.default_rng(1).standard_normal((32, 64)).astype(np.float32)
    out = np.asarray(x.sfsspmdm_execute(h, b))
    np.testing.assert_allclose(out, 2.0 * (a @ b), rtol=2e-5, atol=2e-5)
    x.sfsspmdm_destroy(h)


def test_dfsspmdm_roundtrip():
    a = _sparse_a(8, 16, np.float64)
    h = x.dfsspmdm_create(n=32, a_dense=a, alpha=1.0, beta=1)
    b = np.random.default_rng(2).standard_normal((16, 32))
    c = np.random.default_rng(3).standard_normal((8, 32))
    out = np.asarray(x.dfsspmdm_execute(h, b, c))
    np.testing.assert_allclose(out, a @ b + c, rtol=1e-12, atol=1e-12)
    x.dfsspmdm_destroy(h)


def test_rng_u32():
    x.rng_set_seed(7)
    v = x.rng_u32()
    assert 0 <= v < 2**32
    assert isinstance(v, int)


# ---------------------------------------------------------------------------
# shape/config constructors + offset + rng extstate
# ---------------------------------------------------------------------------

def test_create_gemm_shape_and_dispatch():
    import jax.numpy as jnp
    from libxsmm_tpu.dtypes import Datatype
    s = x.create_gemm_shape(8, 16, 32, 32, 16, 16,
                            Datatype.F32, Datatype.F32, Datatype.F32)
    assert (s.m, s.n, s.k) == (8, 16, 32)
    k = x.dispatch_gemm(s, x.GemmFlags.BETA_0)
    a = jnp.ones((8, 32), jnp.float32)
    b = jnp.ones((32, 16), jnp.float32)
    assert float(np.asarray(k(a, b))[0, 0]) == 32.0
    with pytest.raises(ValueError):
        x.create_gemm_shape(8, 16, 32, lda=99)  # row-major ld contract


def test_create_batch_reduce_config():
    from libxsmm_tpu.descriptor import BatchReduceType
    cfg = x.create_gemm_batch_reduce_config(BatchReduceType.STRIDE, 0, 0, 4)
    assert cfg.br_type == BatchReduceType.STRIDE
    assert cfg.br_count_hint == 4


def test_create_ext_argops_postops():
    from libxsmm_tpu.descriptor import BinaryType, UnaryType
    ao = x.create_gemm_ext_unary_argops(
        None, UnaryType.NONE, x.UnaryFlags.NONE, False,
        None, UnaryType.NONE, x.UnaryFlags.NONE, False,
        None, UnaryType.RELU, x.UnaryFlags.NONE, False)
    assert ao.cp_type == UnaryType.RELU
    po = x.create_gemm_ext_binary_postops(None, x.Datatype.F32,
                                          BinaryType.ADD)
    assert po.d_type == BinaryType.ADD


def test_meltw_shape_dispatch():
    import jax.numpy as jnp
    from libxsmm_tpu.descriptor import BinaryType, UnaryType
    from libxsmm_tpu.ops.eltwise import (dispatch_meltw_binary,
                                         dispatch_meltw_unary)
    us = x.create_meltw_unary_shape(4, 8, 8, 8)
    k = dispatch_meltw_unary(UnaryType.RELU, us)
    v = jnp.array([[-1.0, 2.0] * 4] * 4, jnp.float32)
    out = np.asarray(k(v))
    assert out.min() == 0.0 and out.max() == 2.0
    bs = x.create_meltw_binary_shape(4, 8)
    kb = dispatch_meltw_binary(BinaryType.ADD, bs)
    np.testing.assert_allclose(np.asarray(kb(v, v)), np.asarray(v) * 2)
    with pytest.raises(ValueError):
        x.create_meltw_unary_shape(4, 8, ldi=5)


def test_offset():
    # reference semantics: first dim fastest; dims beyond the first are
    # 1-based (offset[i]-1 scaled), zeros contribute nothing
    lin, size = x.offset([2, 0, 0], [4, 5, 6])
    assert (lin, size) == (2, 120)
    lin, _ = x.offset([1, 2, 1], [4, 5, 6])
    assert lin == 1 + (2 - 1) * 4 + 0  # third index 1 -> (1-1)*20 = 0
    lin, size = x.offset(None, [3, 3])
    assert (lin, size) == (0, 9)


def test_rng_extstate():
    st = x.rng_create_extstate(123)
    v1 = x.rng_u32(st)
    v2 = x.rng_u32(st)
    assert v1 != v2  # state advances
    assert x.rng_get_extstate_size() == 8
    x.rng_destroy_extstate(st)
    # same seed reproduces the stream
    st2 = x.rng_create_extstate(123)
    assert x.rng_u32(st2) == v1


# ---------------------------------------------------------------------------
# L0 tail round 2: icbrt/sexp2/stanh/widen, lsfr/rng_seq, sync/barrier,
# timer info, cpuid helpers, descriptor_init constructors
# (include/utils/libxsmm_math.h, src/libxsmm_utils.c, src/libxsmm_sync.c,
# include/utils/libxsmm_barrier.h, include/libxsmm_generator.h:40-75)
# ---------------------------------------------------------------------------

def test_icbrt_family():
    for v in (0, 1, 7, 8, 26, 27, 63, 64, 2**30, 2**32 - 1):
        r = x.icbrt_u32(v)
        assert r**3 <= v < (r + 1)**3
    for v in (0, 2**40, 2**60, 2**64 - 1):
        r = x.icbrt_u64(v)
        assert r**3 <= v < (r + 1)**3


def test_sexp2_family():
    assert x.sexp2_u8(0) == 1.0 and x.sexp2_u8(10) == 1024.0
    assert x.sexp2_u8(200) == float("inf")     # beyond f32 range
    assert x.sexp2_i8(-3) == 0.125 and x.sexp2_i8(4) == 16.0
    assert x.sexp2_i8i(-126) == 2.0**-126      # smallest f32 normal
    with pytest.raises(ValueError):
        x.sexp2_i8i(128)
    with pytest.raises(ValueError):
        x.sexp2_u8(-1)


def test_stanh_pade78():
    # accurate region: matches tanh to ~1e-4; Pade 7/8 contract
    for v in (-3.0, -1.0, -0.25, 0.0, 0.5, 2.0, 4.0):
        assert abs(x.stanh_pade78(v) - math.tanh(v)) < 5e-4
    # vectorized path
    arr = np.linspace(-4, 4, 33, dtype=np.float32)
    out = x.stanh_pade78(arr)
    assert np.allclose(out, np.tanh(arr), atol=5e-4)


def test_widen_u32():
    assert x.widen_u32u64(0xFFFFFFFF) == 0xFFFFFFFF
    assert x.widen_u32i64(0x80000000) == 0x80000000   # stays unsigned
    assert x.widen_u32u64(2**32 + 5) == 5             # masked to u32


def test_lsfr_i32_recurrence():
    # independent xoshiro128+ oracle over the strided state block
    state = np.arange(64, dtype=np.uint32) + 1
    s = [int(state[i * 16]) for i in range(4)]
    M = 0xFFFFFFFF

    def rotl(v, r):
        return ((v << r) | (v >> (32 - r))) & M

    expect = (rotl((s[0] + s[3]) & M, 7) + s[0]) & M
    got = x.lsfr_i32(state, 0)
    assert got == expect
    # state must advance exactly like the reference recurrence
    t = (s[1] << 9) & M
    s2 = s[2] ^ s[0]
    s3 = s[3] ^ s[1]
    s1 = s[1] ^ s2
    s0 = s[0] ^ s3
    s2 ^= t
    s3 = rotl(s3, 11)
    assert [int(state[i * 16]) for i in range(4)] == [s0, s1, s2, s3]
    # other lanes untouched
    assert state[1] == 2 and state[17] == 18


def test_rng_seq_f64():
    b = x.rng_seq(13)
    assert isinstance(b, bytes) and len(b) == 13
    assert x.rng_seq(0) == b""
    v = x.rng_f64()
    assert 0.0 <= v < 1.0


def test_sync_pid_tid_stdio():
    assert x.get_pid() > 0
    t0 = x.get_tid()
    assert 0 <= t0 < 1024 and x.get_tid() == t0   # stable per thread
    x.stdio_acquire()
    x.stdio_acquire()       # reentrant
    x.stdio_release()
    x.stdio_release()


def test_barrier_team():
    import threading
    b = x.barrier_create(2, 2)
    hits = []
    lock = threading.Lock()

    def worker(tid):
        x.barrier_init(b, tid)
        x.barrier_wait(b, tid)
        with lock:
            hits.append(tid)
        x.barrier_wait(b, tid)

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(5)
    assert sorted(hits) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        x.barrier_wait(b, 4)
    x.barrier_destroy(b)
    with pytest.raises(ValueError):
        x.barrier_create(0, 1)


def test_timer_info():
    info = x.get_timer_info()
    assert info.tsc == 0                 # host path is the OS clock
    t0 = x.timer_tickint()
    t1 = x.timer_tickint()
    assert x.timer_ncycles(t0, t1) >= 0


def test_cpuid_helpers():
    assert x.cpuid_name(x.cpuid_id("v5e")) == "v5e"
    assert x.cpuid_id("nosucharch") == 0
    with pytest.raises(ValueError):
        x.cpuid_name(99999)
    assert x.cpuid_dot_pack_factor(x.Datatype.F32) == 1
    assert x.cpuid_dot_pack_factor(x.Datatype.BF16) == 2
    assert x.cpuid_dot_pack_factor(x.Datatype.I8) == 4
    assert x.cpuid_dot_pack_factor(np.float16) == 2
    assert x.cpuid_vlen32() == 128


def test_descriptor_init_family():
    d = x.gemm_descriptor_init(x.Datatype.BF16, x.Datatype.BF16,
                               x.Datatype.F32, x.Datatype.F32,
                               16, 8, 32, flags=x.GemmFlags.BETA_0)
    assert d.shape.m == 16 and d.beta == 0
    assert d.shape.a_in_type == x.Datatype.BF16
    shape = x.create_gemm_shape(8, 8, 8)
    d2 = x.gemm_descriptor_init_gemm(shape, x.GemmFlags.BETA_0)
    k = x.xmmdispatch(d2)
    a = np.ones((8, 8), np.float32)
    assert np.allclose(np.asarray(k(a, a)), a @ a)
    br = x.create_gemm_batch_reduce_config(x.BatchReduceType.STRIDE,
                                           br_unroll_hint=4)
    d3 = x.gemm_descriptor_init_brgemm(shape, x.GemmFlags.BETA_0, br)
    assert d3.br.br_type == x.BatchReduceType.STRIDE
    d4 = x.gemm_descriptor_init_brgemm_ext(shape, x.GemmFlags.BETA_0, br)
    assert d4.base.br.br_count_hint == 4
    m1 = x.meltw_descriptor_init(x.Datatype.F32, x.Datatype.F32, 8, 16,
                                 op_type=x.UnaryType.RELU)
    assert m1.operation == "unary" and m1.op_type == x.UnaryType.RELU
    m2 = x.meltw_descriptor_init2(
        x.Datatype.F32, x.Datatype.F32, None, x.Datatype.F32,
        x.Datatype.F32, 8, 16, op_type=x.BinaryType.ADD,
        operation="binary")
    assert m2.in1_type == x.Datatype.F32
    with pytest.raises(ValueError):
        x.meltw_descriptor_init2(x.Datatype.F32, None, None,
                                 x.Datatype.F32, x.Datatype.F32, 8, 16,
                                 op_type=x.UnaryType.RELU, operation="bad")
    q = x.meqn_descriptor_init(x.Datatype.F32, 4, 8, eqn_idx=3)
    assert q == (3, 4, 8, x.Datatype.F32)


# ---------------------------------------------------------------------------
# full public-symbol sweep vs the reference headers
# ---------------------------------------------------------------------------

_REF_HEADERS = [
    "/root/reference/include/libxsmm.h",
    "/root/reference/include/libxsmm_fsspmdm.h",
    "/root/reference/include/libxsmm_math.h",
    "/root/reference/include/libxsmm_malloc.h",
    "/root/reference/include/libxsmm_memory.h",
    "/root/reference/include/libxsmm_generator.h",
    "/root/reference/include/libxsmm_cpuid.h",
    "/root/reference/include/libxsmm_sync.h",
    "/root/reference/include/libxsmm_macros.h",
    "/root/reference/include/utils/libxsmm_barrier.h",
    "/root/reference/include/utils/libxsmm_lpflt_quant.h",
    "/root/reference/include/utils/libxsmm_math.h",
    "/root/reference/include/utils/libxsmm_timer.h",
]

# Documented N/A (docs/PARITY.md): per-ISA JIT tuning knobs whose subject
# matter (x86 AMX/ACE prefetch + blocking, ARM bfdot/i8dot/MMLA stack
# packing, RV64 prefetch strides) does not exist on TPU — the analogous
# per-generation knobs live in device.TpuGeometry / config env tiers —
# plus a C const-laundering helper with no Python meaning.
_KNOWN_NA = {
    "libxsmm_cpuid_arm_mmla_gemm_pack_b_to_vnnit_on_stack",
    "libxsmm_cpuid_arm_use_bfdot",
    "libxsmm_cpuid_arm_use_i8dot",
    "libxsmm_cpuid_rv64_gemm_m_prefetch_stride",
    "libxsmm_cpuid_rv64_gemm_prefetch_a",
    "libxsmm_cpuid_rv64_gemm_prefetch_b",
    "libxsmm_cpuid_rv64_gemm_prefetch_reuse_a",
    "libxsmm_cpuid_rv64_gemm_prefetch_reuse_b",
    "libxsmm_cpuid_rv64_gemm_prefetch_reuse_c",
    "libxsmm_cpuid_x86_amx_gemm_enforce_mx1_tile_blocking",
    "libxsmm_cpuid_x86_amx_gemm_panel_sw_pipeline_granularity",
    "libxsmm_cpuid_x86_srf_gemm_set_n_max_blocking",
    "libxsmm_cpuid_x86_use_ace_disable_inline_transform",
    "libxsmm_cpuid_x86_use_ace_disable_swpf_a",
    "libxsmm_cpuid_x86_use_ace_disable_swpf_b",
    "libxsmm_cpuid_x86_use_high_prec_eltwise_approx",
    "libxsmm_nonconst_int",
}


@pytest.mark.skipif(not all(map(__import__("os").path.isfile, _REF_HEADERS)),
                    reason="reference headers not present")
def test_reference_symbol_sweep():
    """Every LIBXSMM_API function in the reference's primary public headers
    must resolve to a same-name attribute on the package (the libxsmm_
    prefix becomes the module namespace). This is the machine-checked form
    of docs/PARITY.md's symbol table: a reference user porting code finds
    every entry point by its own name."""
    import re

    syms = set()
    for path in _REF_HEADERS:
        with open(path) as f:
            text = f.read()
        syms.update(re.findall(
            r"LIBXSMM_API[A-Z_]*\s+[A-Za-z_*][A-Za-z0-9_* ]*?"
            r"\b(libxsmm_[a-z0-9_]+)\(", text))
    assert len(syms) > 150          # the sweep found the real surface
    missing = sorted(s for s in syms
                     if s not in _KNOWN_NA
                     and not hasattr(x, s[len("libxsmm_"):])
                     and not hasattr(x, s))
    assert not missing, f"no same-name analogue for: {missing}"


def test_dispatch_meltw_generic_router():
    """libxsmm_dispatch_meltw (src/libxsmm_main.c:3449): dispatch from a
    descriptor routes on operation arity and executes correctly."""
    rng = np.random.default_rng(5)
    a = rng.standard_normal((8, 16)).astype(np.float32)
    b = rng.standard_normal((8, 16)).astype(np.float32)
    c = rng.standard_normal((8, 16)).astype(np.float32)

    du = x.meltw_descriptor_init(x.Datatype.F32, x.Datatype.F32, 8, 16,
                                 op_type=x.UnaryType.RELU)
    ku = x.dispatch_meltw(du)
    np.testing.assert_allclose(np.asarray(ku(a)), np.maximum(a, 0.0),
                               rtol=1e-6)

    db = x.meltw_descriptor_init2(
        x.Datatype.F32, x.Datatype.F32, None, x.Datatype.F32,
        x.Datatype.F32, 8, 16, op_type=x.BinaryType.ADD, operation="binary")
    kb = x.dispatch_meltw(db)
    np.testing.assert_allclose(np.asarray(kb(a, b)), a + b, rtol=1e-6)

    dt = x.meltw_descriptor_init2(
        x.Datatype.F32, x.Datatype.F32, x.Datatype.F32, x.Datatype.F32,
        x.Datatype.F32, 8, 16, op_type=x.TernaryType.MULADD,
        operation="ternary")
    kt = x.dispatch_meltw(dt)
    np.testing.assert_allclose(np.asarray(kt(a, b, c)), a * b + c,
                               rtol=1e-5, atol=1e-5)

    bad = x.meltw_descriptor_init(x.Datatype.F32, x.Datatype.F32, 8, 16,
                                  op_type=x.UnaryType.RELU)
    object.__setattr__(bad, "operation", "quaternary")
    with pytest.raises(ValueError):
        x.dispatch_meltw(bad)


def test_convert_to_f32_aliases_and_malloc():
    """Exact-name aliases from the reference headers: the _to_ converter
    spellings (include/libxsmm.h) and plain malloc (libxsmm_malloc.h)."""
    import jax.numpy as jnp

    v = np.asarray([1.0, -2.5, 0.0, 3.25], np.float32)
    bf = jnp.asarray(v, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(x.convert_bf16_to_f32(bf)),
                               np.asarray(bf, np.float32))
    f16 = jnp.asarray(v, jnp.float16)
    np.testing.assert_allclose(np.asarray(x.convert_f16_to_f32(f16)),
                               np.asarray(f16, np.float32))
    buf = x.malloc(100)
    assert buf.size >= 100
    x.free(buf)


def test_stanh_pade78_clamps_on_x():
    # the clamp compares |x| (like the reference's vectorized kernels),
    # not the Pade ratio (the scalar header's dead-clamp quirk): large
    # inputs must return +-1, not the decaying rational
    import math
    assert x.stanh_pade78(20.0) == 1.0
    assert x.stanh_pade78(-50.0) == -1.0
    assert abs(x.stanh_pade78(1.0) - math.tanh(1.0)) < 1e-4
    assert abs(x.stanh_pade78(3.0) - math.tanh(3.0)) < 1e-3
