"""Native C++ runtime tests (registry hash table + persistent KV log)."""

import os

import numpy as np
import pytest

from libxsmm_tpu import native_bridge

pytestmark = pytest.mark.skipif(native_bridge.load() is None,
                                reason="native toolchain unavailable")


def test_crc32_stability():
    a = native_bridge.crc32(b"hello world")
    b = native_bridge.crc32(b"hello world")
    c = native_bridge.crc32(b"hello worle")
    assert a == b
    assert a != c
    assert native_bridge.crc32(b"x", seed=1) != native_bridge.crc32(b"x")


def test_registry_insert_find():
    reg = native_bridge.NativeRegistry()
    assert reg.find(b"key") is None
    assert reg.insert(b"key", 42) == 0
    assert reg.find(b"key") == 42
    # duplicate insert: first build wins (rc=1)
    assert reg.insert(b"key", 99) == 1
    assert reg.find(b"key") == 42
    stats = reg.stats()
    assert stats["nentries"] == 1
    assert stats["capacity"] == 131072


def test_registry_many_keys():
    reg = native_bridge.NativeRegistry()
    rng = np.random.default_rng(3)
    keys = [rng.bytes(48) for _ in range(5000)]
    for i, k in enumerate(keys):
        assert reg.insert(k, i) == 0
    for i, k in enumerate(keys):
        assert reg.find(k) == i
    assert reg.stats()["nentries"] == 5000


def test_registry_threaded():
    import concurrent.futures
    reg = native_bridge.NativeRegistry()
    keys = [f"desc-{i % 64}".encode() for i in range(2048)]

    def work(k):
        reg.insert(k, hash(k) & 0xFFFFFFFF)
        return reg.find(k)

    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(work, keys))
    for k, v in zip(keys, results):
        assert v == hash(k) & 0xFFFFFFFF


def test_registry_key_limits():
    reg = native_bridge.NativeRegistry()
    assert reg.insert(b"", 1) == -1            # empty key rejected
    assert reg.insert(b"x" * 96, 7) == 0       # max descriptor size OK
    assert reg.insert(b"x" * 97, 7) == -1      # over the 96B contract


def test_registry_canary_detects_damage():
    """SURVEY.md §5.2 sanitizer-class check: every published slot carries a
    crc32c(key || value) canary (the reference's checksummed allocator-info
    analogue, src/libxsmm_malloc.c:710). A damaged slot must (a) fail the
    verify() sweep, (b) read back as a MISS — never as a wrong handle —
    and (c) count in the ncorrupt stat."""
    reg = native_bridge.NativeRegistry()
    for i in range(32):
        assert reg.insert(f"desc-{i}".encode(), 1000 + i) == 0
    assert reg.verify() == 0
    assert reg.stats()["ncorrupt"] == 0
    assert reg._poison(b"desc-7")              # flip a value bit, no canary
    assert reg.verify() == 1
    assert reg.find(b"desc-7") is None         # detected -> miss, not 1007^bit
    assert reg.stats()["ncorrupt"] >= 2        # sweep + the failed find
    assert reg.find(b"desc-8") == 1008         # neighbors unaffected


def test_kv_roundtrip(tmp_path):
    kv = native_bridge.PersistentKv(tmp_path / "cache.xkv")
    assert kv.get(b"k") is None
    assert kv.put(b"k", b"value-1")
    assert kv.get(b"k") == b"value-1"
    # later records win (re-tuning overrides)
    assert kv.put(b"k", b"value-2")
    assert kv.get(b"k") == b"value-2"
    assert kv.put(b"other", bytes(range(256)))
    assert kv.get(b"other") == bytes(range(256))


def test_kv_survives_corrupt_tail(tmp_path):
    path = tmp_path / "cache.xkv"
    kv = native_bridge.PersistentKv(path)
    kv.put(b"good", b"data")
    with open(path, "ab") as f:
        f.write(b"\x00garbage-partial-record")
    assert kv.get(b"good") == b"data"


def test_kv_persists_across_instances(tmp_path):
    path = tmp_path / "c.xkv"
    native_bridge.PersistentKv(path).put(b"a", b"1")
    assert native_bridge.PersistentKv(path).get(b"a") == b"1"


def test_kv_concurrent_appends(tmp_path):
    # each record must land via ONE O_APPEND write() — interleaved
    # buffered fwrites from parallel processes corrupted the log and
    # masked every later record (review finding). 4 processes x 25
    # multi-KB appends; every record must be readable afterwards.
    import subprocess
    import sys

    path = str(tmp_path / "conc.xkv")
    code = """
import os, sys
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")   # package import must not probe
from libxsmm_tpu import native_bridge       # the (possibly dead) TPU tunnel
kv = native_bridge.PersistentKv(sys.argv[1])
w = int(sys.argv[2])
for i in range(25):
    assert kv.put(b"w%d-k%d" % (w, i), bytes([w] * (8192 + i)))
"""
    procs = [subprocess.Popen([sys.executable, "-c", code, path, str(w)],
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))))
             for w in range(4)]
    assert all(p.wait() == 0 for p in procs)
    kv = native_bridge.PersistentKv(path)
    for w in range(4):
        for i in range(25):
            assert kv.get(b"w%d-k%d" % (w, i)) == bytes([w] * (8192 + i))


def test_aot_export_load(tmp_path):
    # AOT executables bind the device topology they were compiled for
    # (like the reference's ISA-specific binary exports), so run the
    # round-trip in a clean 1-device process — the suite's 8-virtual-device
    # topology would not match itself on reload.
    import subprocess
    import sys

    code = f"""
import os
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import libxsmm_tpu as xt
from libxsmm_tpu import aot, native_bridge
from libxsmm_tpu.descriptor import GemmFlags, GemmShape

kern = xt.dispatch_gemm(GemmShape(8, 8, 8), GemmFlags.BETA_0)
a = jnp.ones((8, 8), jnp.float32)
store = native_bridge.PersistentKv(r"{tmp_path / 'aot.xkv'}")
key = aot.export_kernel(kern, (a, a), store)
assert store.get(key) is not None
loaded = aot.load_kernel(store, key)
assert loaded is not None
np.testing.assert_allclose(np.asarray(loaded(a, a)),
                           np.full((8, 8), 8.0), rtol=1e-6)
assert aot.load_kernel(store, b"missing") is None
print("AOT-OK")
"""
    env = dict(**__import__("os").environ)
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=300,
                            cwd=str(__import__("pathlib").Path(
                                __file__).resolve().parents[1]))
    assert "AOT-OK" in result.stdout, result.stderr[-2000:]


# ---------------------------------------------------------------------------
# native MatrixMarket reader (xsmm_mtx_open; the counterpart of the
# reference's generator_spgemm_{csr,csc}_reader.c)
# ---------------------------------------------------------------------------

def _native_or_skip():
    if native_bridge.load() is None:
        pytest.skip("native toolchain unavailable")


def test_mtx_native_roundtrip(tmp_path):
    _native_or_skip()
    from libxsmm_tpu.utils.mtx import read_mtx, write_mtx
    rng = np.random.default_rng(5)
    a = rng.standard_normal((29, 31))
    a[rng.random(a.shape) > 0.3] = 0.0
    p = str(tmp_path / "t.mtx")
    write_mtx(p, a)
    np.testing.assert_allclose(read_mtx(p), a, rtol=1e-12)
    m, n, rows, cols, vals = native_bridge.read_mtx_coo(p)
    assert (m, n) == a.shape
    assert len(vals) == np.count_nonzero(a)
    assert rows.dtype == np.int32 and vals.dtype == np.float64


def test_mtx_native_symmetric_pattern_array(tmp_path):
    _native_or_skip()
    from libxsmm_tpu.utils.mtx import read_mtx
    sym = tmp_path / "s.mtx"
    sym.write_text("%%MatrixMarket matrix coordinate real symmetric\n"
                   "% comment\n3 3 4\n1 1 2.0\n2 1 -1.5\n3 2 4.0\n3 3 1\n")
    np.testing.assert_allclose(
        read_mtx(str(sym)),
        [[2, -1.5, 0], [-1.5, 0, 4], [0, 4, 1.0]])
    pat = tmp_path / "p.mtx"
    pat.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                   "2 2 2\n1 2\n2 1\n")
    np.testing.assert_allclose(read_mtx(str(pat)), [[0, 1], [1, 0]])
    arr = tmp_path / "a.mtx"
    arr.write_text("%%MatrixMarket matrix array real general\n"
                   "2 3\n1\n2\n3\n4\n5\n6\n")   # column-major per spec
    np.testing.assert_allclose(read_mtx(str(arr)), [[1, 3, 5], [2, 4, 6]])
    skw = tmp_path / "k.mtx"
    skw.write_text("%%MatrixMarket matrix coordinate real skew-symmetric\n"
                   "3 3 2\n2 1 5.0\n3 1 -2.0\n")
    np.testing.assert_allclose(
        read_mtx(str(skw)), [[0, -5, 2], [5, 0, 0], [-2, 0, 0]])


def test_mtx_native_skew_array(tmp_path):
    # MM spec: skew-symmetric ARRAY format stores strictly-below-diagonal
    # entries only (no zero diagonal in the file) — the reader previously
    # consumed a phantom diagonal value per column (review finding)
    _native_or_skip()
    from libxsmm_tpu.utils.mtx import read_mtx
    skw = tmp_path / "ka.mtx"
    # 3x3 skew array: column-major strictly-lower = (2,1) (3,1) (3,2)
    skw.write_text("%%MatrixMarket matrix array real skew-symmetric\n"
                   "3 3\n5.0\n-2.0\n7.0\n")
    np.testing.assert_allclose(
        read_mtx(str(skw)), [[0, -5, 2], [5, 0, -7], [-2, 7, 0]])
    sym = tmp_path / "sa.mtx"
    # symmetric array includes the diagonal: (1,1)(2,1)(3,1) (2,2)(3,2) (3,3)
    sym.write_text("%%MatrixMarket matrix array real symmetric\n"
                   "3 3\n1\n2\n3\n4\n5\n6\n")
    np.testing.assert_allclose(
        read_mtx(str(sym)), [[1, 2, 3], [2, 4, 5], [3, 5, 6]])


def test_aot_key_binds_device_generation():
    # serialized executables are generation-specific: the key must carry
    # device_kind, and key computation must not upload args to the device
    from libxsmm_tpu import aot
    import jax
    key = aot.default_key("k", (np.zeros((4, 8), np.float32),))
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    assert kind.encode() in key and b"float32[4, 8]" in key


def test_mtx_native_errors(tmp_path):
    _native_or_skip()
    with pytest.raises(FileNotFoundError):
        native_bridge.read_mtx_coo(str(tmp_path / "missing.mtx"))
    bad = tmp_path / "bad.mtx"
    bad.write_text("not a matrix market file\n1 1 1\n")
    assert native_bridge.read_mtx_coo(str(bad)) is None
    trunc = tmp_path / "tr.mtx"
    trunc.write_text("%%MatrixMarket matrix coordinate real general\n"
                     "3 3 5\n1 1 2.0\n")       # declares 5, has 1
    assert native_bridge.read_mtx_coo(str(trunc)) is None


def test_mtx_native_matches_reference_matrix():
    _native_or_skip()
    path = ("/root/reference/samples/xgemm_sparse_Ainregs/mats/p4/hex/"
            "m0-sp.mtx")
    if not os.path.exists(path):
        pytest.skip("reference mats not present")
    from libxsmm_tpu.utils.mtx import read_mtx
    nat = read_mtx(path)
    try:
        from scipy.io import mmread
    except ImportError:
        pytest.skip("scipy unavailable")
    np.testing.assert_allclose(nat, np.asarray(mmread(path).todense()))


def test_mtx_pure_python_fallback_symmetry_duplicates(tmp_path, monkeypatch):
    """The dependency-free fallback (no native lib, no scipy) must expand
    symmetric/skew qualifiers and ACCUMULATE duplicate entries exactly like
    the native and scipy paths — a host without either must not silently
    read half the operator (review finding)."""
    import builtins
    import libxsmm_tpu.native_bridge as nb
    from libxsmm_tpu.utils.mtx import read_mtx

    monkeypatch.setattr(nb, "read_mtx_coo",
                        lambda p: (_ for _ in ()).throw(RuntimeError("off")))
    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError("scipy disabled for this test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_scipy)

    sym = tmp_path / "s.mtx"
    sym.write_text("%%MatrixMarket matrix coordinate real symmetric\n"
                   "% comment\n3 3 4\n1 1 2.0\n2 1 -1.5\n3 2 4.0\n3 3 1\n")
    np.testing.assert_allclose(
        read_mtx(str(sym)),
        [[2, -1.5, 0], [-1.5, 0, 4], [0, 4, 1.0]])
    skw = tmp_path / "k.mtx"
    skw.write_text("%%MatrixMarket matrix coordinate real skew-symmetric\n"
                   "3 3 2\n2 1 5.0\n3 1 -2.0\n")
    np.testing.assert_allclose(
        read_mtx(str(skw)), [[0, -5, 2], [5, 0, 0], [-2, 0, 0]])
    dup = tmp_path / "d.mtx"
    dup.write_text("%%MatrixMarket matrix coordinate real general\n"
                   "2 2 3\n1 1 1.0\n1 1 2.5\n2 2 4.0\n")
    np.testing.assert_allclose(read_mtx(str(dup)), [[3.5, 0], [0, 4.0]])
    pat = tmp_path / "p.mtx"
    pat.write_text("%%MatrixMarket matrix coordinate pattern symmetric\n"
                   "2 2 1\n2 1\n")
    np.testing.assert_allclose(read_mtx(str(pat)), [[0, 1], [1, 0]])
