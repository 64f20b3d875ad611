"""AOT kernel export/import: serialized XLA executables in the native KV.

Parity with the reference's binary-export tool + static-kernel registration
(/root/reference/src/libxsmm_binaryexport_generator.c,
samples/static_codegen, internal_register_static_code
src/libxsmm_main.c:622-666): compiled kernels are serialized
(jax.experimental.serialize_executable) and persisted in the native
append-only KV log, so later processes load ready-to-run executables
without re-tracing or re-compiling.

Keys incorporate the kernel name, argument avals and the backend platform;
executables are only portable to matching hardware (exactly like the
reference's exported binaries are ISA-specific).
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional, Sequence

import jax

from .native_bridge import PersistentKv


def _aval_sig(args) -> str:
    import numpy as np

    # dtype/shape only — np.asarray never uploads to the device (keys for
    # large host operands must not cost a transfer)
    def sig(a):
        if not (hasattr(a, "dtype") and hasattr(a, "shape")):
            a = np.asarray(a)
        return f"{a.dtype}{list(a.shape)}"

    return ",".join(sig(a) for a in args)


def default_key(name: str, args) -> bytes:
    # device_kind (e.g. 'TPU v5e'), not just the platform: serialized
    # executables are generation-specific exactly like the reference's
    # exported binaries are ISA-specific
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    # the jax version binds the serialized-executable FORMAT: a blob
    # exported under one jax/XLA build is not loadable under another, so
    # a version bump must be a key MISS (rebuild + re-export), never a
    # deserialize crash
    return (f"aot:{jax.__version__}:{dev.platform}:{kind}:{name}:"
            f"{_aval_sig(args)}").encode()


def export_kernel(kernel_or_fn, args: Sequence, store: PersistentKv,
                  key: Optional[bytes] = None) -> bytes:
    """Compile for `args` and persist the executable; returns the key."""
    from jax.experimental.serialize_executable import serialize

    fn = getattr(kernel_or_fn, "fn", kernel_or_fn)
    name = getattr(kernel_or_fn, "name", getattr(fn, "__name__", "kernel"))
    if key is None:
        key = default_key(name, args)
    compiled = jax.jit(fn).lower(*args).compile()
    blob, in_tree, out_tree = serialize(compiled)
    payload = pickle.dumps((blob, in_tree, out_tree))
    if not store.put(key, payload):
        raise IOError("failed to persist AOT executable")
    return key


def load_kernel(store: PersistentKv, key: bytes) -> Optional[Callable]:
    """Load a persisted executable; None when absent. The returned callable
    accepts exactly the arg structure it was exported with."""
    from jax.experimental.serialize_executable import deserialize_and_load

    payload = store.get(key)
    if payload is None:
        return None
    try:
        blob, in_tree, out_tree = pickle.loads(payload)
        return deserialize_and_load(blob, in_tree, out_tree)
    except Exception as e:                       # stale/incompatible blob
        # a corrupt or version-incompatible executable must behave like a
        # MISS (the caller rebuilds and re-exports), not kill the caller —
        # the same graceful-degradation contract as the registry's KV
        import warnings
        warnings.warn(f"discarding unloadable AOT executable for key "
                      f"{key!r}: {e}")
        return None
