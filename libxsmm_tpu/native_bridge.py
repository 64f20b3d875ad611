"""ctypes bridge to the native host runtime (native/xsmm_native.cpp).

Provides the C++ descriptor registry (CRC32-hashed open-addressed table,
mirroring the reference's code registry natively) and the persistent KV
store used for autotune decisions and serialized executables. Auto-builds
the shared library on first use (g++ is in the image; pybind11 is not, so
the ABI is plain C via ctypes).

Everything degrades gracefully: if the toolchain is unavailable the Python
fallbacks in registry.py / autotune_cache.py take over.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

_REPO = pathlib.Path(__file__).resolve().parents[1]
_SRC = _REPO / "native" / "xsmm_native.cpp"
_SO = _REPO / "native" / "libxsmm_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_SRC.parent)], check=True,
                       capture_output=True, timeout=120)
        return _SO.exists()
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # a prebuilt .so without the C++ source (deploy image) is fine —
        # only rebuild when the source is PRESENT and newer
        stale = (_SRC.exists()
                 and (not _SO.exists()
                      or _SO.stat().st_mtime < _SRC.stat().st_mtime))
        if not _SO.exists() or stale:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.xsmm_crc32.restype = ctypes.c_uint32
        lib.xsmm_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_uint32]
        lib.xsmm_registry_create.restype = ctypes.c_void_p
        lib.xsmm_registry_destroy.argtypes = [ctypes.c_void_p]
        lib.xsmm_registry_insert.restype = ctypes.c_int
        lib.xsmm_registry_insert.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_uint64]
        lib.xsmm_registry_find.restype = ctypes.c_int
        lib.xsmm_registry_find.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64)]
        lib.xsmm_registry_stats.argtypes = [
            ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_uint64)] * 4
        lib.xsmm_registry_verify.restype = ctypes.c_uint64
        lib.xsmm_registry_verify.argtypes = [ctypes.c_void_p]
        lib.xsmm_registry_ncorrupt.restype = ctypes.c_uint64
        lib.xsmm_registry_ncorrupt.argtypes = [ctypes.c_void_p]
        lib.xsmm_registry_poison.restype = ctypes.c_int
        lib.xsmm_registry_poison.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
        lib.xsmm_kv_append.restype = ctypes.c_int
        lib.xsmm_kv_append.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64]
        lib.xsmm_kv_lookup.restype = ctypes.c_int64
        lib.xsmm_kv_lookup.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64]
        lib.xsmm_mtx_open.restype = ctypes.c_int
        lib.xsmm_mtx_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.xsmm_mtx_fill.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_void_p]
        lib.xsmm_mtx_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def crc32(data: bytes, seed: int = 0) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(data, len(data))
    return int(lib.xsmm_crc32(ctypes.cast(buf, ctypes.c_void_p),
                              len(data), seed))


class NativeRegistry:
    """Descriptor-blob -> uint64 handle table backed by the C++ registry."""

    def __init__(self):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._ptr = self._lib.xsmm_registry_create()

    def __del__(self):
        lib = getattr(self, "_lib", None)
        ptr = getattr(self, "_ptr", None)
        if lib is not None and ptr:
            lib.xsmm_registry_destroy(ptr)

    def insert(self, key: bytes, value: int) -> int:
        buf = ctypes.create_string_buffer(key, len(key))
        return self._lib.xsmm_registry_insert(
            self._ptr, ctypes.cast(buf, ctypes.c_void_p), len(key), value)

    def find(self, key: bytes) -> Optional[int]:
        out = ctypes.c_uint64()
        buf = ctypes.create_string_buffer(key, len(key))
        hit = self._lib.xsmm_registry_find(
            self._ptr, ctypes.cast(buf, ctypes.c_void_p), len(key),
            ctypes.byref(out))
        return int(out.value) if hit else None

    def stats(self) -> dict:
        vals = [ctypes.c_uint64() for _ in range(4)]
        self._lib.xsmm_registry_stats(self._ptr, *[ctypes.byref(v)
                                                   for v in vals])
        return {"nentries": vals[0].value, "nhits": vals[1].value,
                "ncollisions": vals[2].value, "capacity": vals[3].value,
                "ncorrupt": int(self._lib.xsmm_registry_ncorrupt(self._ptr))}

    def verify(self) -> int:
        """Full-table canary sweep (SURVEY.md §5.2): every published slot
        carries crc32c(key || value) written at publish; a torn write or
        stray-pointer damage shows up here (and as a find() miss) instead
        of a silently wrong handle. Returns the number of corrupt slots."""
        return int(self._lib.xsmm_registry_verify(self._ptr))

    def _poison(self, key: bytes) -> bool:
        """TEST-ONLY: damage key's stored value without refreshing the
        canary, so tests can prove the detection path works."""
        buf = ctypes.create_string_buffer(key, len(key))
        return bool(self._lib.xsmm_registry_poison(
            self._ptr, ctypes.cast(buf, ctypes.c_void_p), len(key)))


class PersistentKv:
    """File-backed KV log (autotune decisions, serialized executables)."""

    def __init__(self, path: str):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.path = os.fsencode(str(path))

    def put(self, key: bytes, value: bytes) -> bool:
        kbuf = ctypes.create_string_buffer(key, len(key))
        vbuf = ctypes.create_string_buffer(value, len(value))
        rc = self._lib.xsmm_kv_append(
            self.path, ctypes.cast(kbuf, ctypes.c_void_p), len(key),
            ctypes.cast(vbuf, ctypes.c_void_p), len(value))
        return rc == 0

    def get(self, key: bytes) -> Optional[bytes]:
        kbuf = ctypes.create_string_buffer(key, len(key))
        n = self._lib.xsmm_kv_lookup(
            self.path, ctypes.cast(kbuf, ctypes.c_void_p), len(key),
            None, 0)
        # the size probe and the fill are two scans of a log other
        # processes may append to between them (later-record-wins): retry
        # until the fill sees the same length, so a record that grew
        # between the calls is never returned truncated
        for _ in range(4):
            if n < 0:
                return None
            out = ctypes.create_string_buffer(int(n))
            m = self._lib.xsmm_kv_lookup(
                self.path, ctypes.cast(kbuf, ctypes.c_void_p), len(key),
                ctypes.cast(out, ctypes.c_void_p), int(n))
            if m == n:
                return out.raw
            n = m
        return None


def read_mtx_coo(path: str):
    """Parse a MatrixMarket file with the native reader (the counterpart of
    the reference's generator_spgemm_{csr,csc}_reader.c). Returns
    (m, n, rows, cols, vals) COO arrays (0-based, symmetric/pattern storage
    expanded) or None when the native library is unavailable or the format
    needs the Python fallback (complex fields, malformed files)."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    handle = ctypes.c_void_p()
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.xsmm_mtx_open(os.fsencode(str(path)), ctypes.byref(handle),
                           ctypes.byref(m), ctypes.byref(n),
                           ctypes.byref(nnz))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc != 0:
        return None
    try:
        rows = np.empty(nnz.value, np.int32)
        cols = np.empty(nnz.value, np.int32)
        vals = np.empty(nnz.value, np.float64)
        if nnz.value:
            lib.xsmm_mtx_fill(
                handle, rows.ctypes.data_as(ctypes.c_void_p),
                cols.ctypes.data_as(ctypes.c_void_p),
                vals.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.xsmm_mtx_close(handle)
    return int(m.value), int(n.value), rows, cols, vals
