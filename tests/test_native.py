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
