"""Profiling / tracing helpers.

Parity with the reference's profiler integration (§5.1: VTune JIT API and
perf jitdump hooks, src/libxsmm_malloc.c:65-70, src/libxsmm_perf.c): every
kernel in this library already carries its descriptor-encoded name into
XProf via jax.named_scope (the analogue of the reference's jit_name
scheme); this module adds the capture entry points.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XProf trace of the enclosed block:

        with trace("/tmp/xprof"):
            kernel(a, b)

    View with tensorboard/xprof; kernel names appear as
    xsmm_<kind>_<dtypes>_<shape>_... scopes.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """User-level named region (shows up alongside kernel scopes)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> Optional[dict]:
    """Live device memory stats where the backend exposes them (the
    registry-memory-report analogue, src/libxsmm_main.c:860-895)."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
