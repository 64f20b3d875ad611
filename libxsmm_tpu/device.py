"""TPU device model: generation detection + geometry table.

TPU-native replacement for the reference's CPUID layer
(/root/reference/src/libxsmm_cpuid_x86.c, include/libxsmm_cpuid.h:23-59):
instead of ISA ids and vector lengths, we expose per-TPU-generation geometry
(MXU shape, VPU shape, VMEM size, HBM bandwidth, peak FLOP/s) that the kernel
builders use for tiling decisions — the analogue of `libxsmm_cpuid_vlen32`
(include/libxsmm_cpuid.h:123) feeding blocking in generator_gemm_common.c.

Retargeting: XSMM_TPU_TARGET / config.set_target override detection, like
LIBXSMM_TARGET retargets the JIT (include/libxsmm.h:84-85). The "cpu" target
maps to interpret-friendly geometry used by the CPU test harness.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from .config import CONFIG


@dataclasses.dataclass(frozen=True)
class TpuGeometry:
    """Per-generation hardware model (public numbers)."""

    name: str
    mxu: Tuple[int, int] = (128, 128)      # systolic array shape
    vpu: Tuple[int, int] = (8, 128)        # vector unit (sublanes, lanes)
    vmem_bytes: int = 16 * 2**20           # per-core VMEM
    hbm_gbps: float = 819.0                # HBM bandwidth GB/s
    peak_bf16_tflops: float = 197.0        # MXU peak, bf16 inputs
    peak_f32_tflops: float = 49.0          # MXU peak, f32 inputs
    num_cores: int = 1                     # TensorCores per chip
    # ICI: one-way bandwidth per link (GB/s) and links per chip (public
    # numbers per the scaling-book/spec tables; used ONLY by the labeled
    # projected-efficiency model in parallel/spmm_dist.py — never by
    # kernel tiling).
    ici_link_gbps: float = 45.0
    ici_links: int = 4
    # Minimum tile (sublane) per dtype itemsize; lane dim is always 128.
    # f32 -> 8, bf16 -> 16, int8/fp8 -> 32 (pallas_guide tiling constraints).

    def min_sublane(self, itemsize: int) -> int:
        return {4: 8, 2: 16, 1: 32}.get(itemsize, 8)

    def roofline_tflops(self, flops: int, bytes_moved: int,
                        dtype_peak: Optional[float] = None) -> float:
        """Attainable TFLOP/s for a kernel with the given totals."""
        peak = dtype_peak if dtype_peak is not None else self.peak_f32_tflops
        if flops <= 0:
            return 0.0
        intensity = flops / max(bytes_moved, 1)  # FLOP/byte
        return min(peak, intensity * self.hbm_gbps / 1000.0)


# Public-spec geometry table; the per-arch tuning-knob analogue of
# include/libxsmm_cpuid.h:74-151.
GEOMETRY_TABLE = {
    "v4": TpuGeometry("v4", vmem_bytes=16 * 2**20, hbm_gbps=1228.0,
                      peak_bf16_tflops=275.0, peak_f32_tflops=68.0,
                      num_cores=2, ici_link_gbps=45.0, ici_links=6),
    "v5e": TpuGeometry("v5e", vmem_bytes=16 * 2**20, hbm_gbps=819.0,
                       peak_bf16_tflops=197.0, peak_f32_tflops=49.0,
                       num_cores=1, ici_link_gbps=45.0, ici_links=4),
    "v5p": TpuGeometry("v5p", vmem_bytes=16 * 2**20, hbm_gbps=2765.0,
                       peak_bf16_tflops=459.0, peak_f32_tflops=114.0,
                       num_cores=2, ici_link_gbps=90.0, ici_links=6),
    "v6e": TpuGeometry("v6e", vmem_bytes=32 * 2**20, hbm_gbps=1638.0,
                       peak_bf16_tflops=918.0, peak_f32_tflops=229.0,
                       num_cores=1, ici_link_gbps=90.0, ici_links=4),
    # CPU fallback geometry for interpret-mode tests: keep MXU-like tiling so
    # kernels compile identically, but don't promise bandwidth.
    "cpu": TpuGeometry("cpu", vmem_bytes=16 * 2**20, hbm_gbps=50.0,
                       peak_bf16_tflops=1.0, peak_f32_tflops=1.0,
                       ici_link_gbps=1.0, ici_links=1),
}


def _detect_generation() -> str:
    try:
        dev = jax.devices()[0]
    except Exception:
        return "cpu"
    kind = getattr(dev, "device_kind", "").lower()
    plat = getattr(dev, "platform", "").lower()
    if plat not in ("tpu", "axon") and "tpu" not in kind:
        return "cpu"
    for key in ("v6e", "v6", "v5p", "v5 lite", "v5e", "v5", "v4"):
        if key in kind:
            return {"v6": "v6e", "v5 lite": "v5e", "v5": "v5e"}.get(key, key)
    return "v5e"


_cache: dict = {}


def invalidate_geometry_cache() -> None:
    _cache.clear()


def get_geometry() -> TpuGeometry:
    """Detected (or overridden) geometry for the current process."""
    key = CONFIG.target or "auto"
    if key not in _cache:
        if CONFIG.target:
            # an explicit override must be EXACT: a typo silently feeding
            # v5e rooflines into every tiling decision is a misconfig the
            # user cannot see (review finding)
            name = str(CONFIG.target).lower()
            if name not in GEOMETRY_TABLE:
                raise ValueError(
                    f"unknown XSMM_TPU_TARGET {CONFIG.target!r} "
                    f"(known: {sorted(GEOMETRY_TABLE)})")
        else:
            name = _detect_generation()
        _cache[key] = GEOMETRY_TABLE.get(name, GEOMETRY_TABLE["v5e"])
    return _cache[key]


# Numeric arch ids, the libxsmm_get/set_target_archid analogue
# (include/libxsmm_cpuid.h:23-59 numbers its ISAs; TPU generations here).
ARCHID_CPU = 0
ARCHIDS = {"cpu": ARCHID_CPU, "v4": 1040, "v5e": 1050, "v5p": 1051,
           "v6e": 1060}
_ARCHID_NAMES = {v: k for k, v in ARCHIDS.items()}


def get_target_archid() -> int:
    """libxsmm_get_target_archid analogue (include/libxsmm.h:72-79)."""
    return ARCHIDS.get(get_geometry().name, ARCHID_CPU)


def set_target_archid(archid: int) -> None:
    """libxsmm_set_target_archid analogue: retarget the geometry table by
    numeric id (None/0 restores auto-detect, like LIBXSMM_TARGET)."""
    from .config import set_target
    if archid in (None, 0):
        set_target(None)
        return
    name = _ARCHID_NAMES.get(int(archid))
    if name is None:
        raise ValueError(f"unknown archid {archid}; known: {ARCHIDS}")
    set_target(name)


def cpuid_name(archid: int) -> str:
    """libxsmm_cpuid_name analogue (src/libxsmm_cpuid_x86.c:443): numeric
    target id -> generation name string."""
    name = _ARCHID_NAMES.get(int(archid))
    if name is None:
        raise ValueError(f"unknown archid {archid}; known: {ARCHIDS}")
    return name


def cpuid_id(arch: str) -> int:
    """libxsmm_cpuid_id analogue (src/libxsmm_cpuid_x86.c:552): generation
    name -> numeric target id (0 == unknown, like the reference's
    LIBXSMM_TARGET_ARCH_UNKNOWN)."""
    return ARCHIDS.get(str(arch).lower(), 0)


def cpuid_dot_pack_factor(itemsize_or_dtype) -> int:
    """libxsmm_cpuid_dot_pack_factor analogue (src/libxsmm_cpuid_x86.c:775):
    elements of the given dtype packed per 32-bit contraction lane. On x86
    this is the VNNI pack factor; on TPU it is the sublane packing the MXU
    applies to narrow inputs (f32 -> 1, bf16/f16 -> 2, 8-bit -> 4), the
    same quantity min_sublane() scales tiles by. Accepts an itemsize, a
    numpy/jnp dtype, or a Datatype enum member."""
    item = itemsize_or_dtype
    if hasattr(item, "value") and isinstance(getattr(item, "value"), str):
        from .dtypes import to_jnp
        item = to_jnp(item)
    if not isinstance(item, int):
        import numpy as np
        item = np.dtype(item).itemsize
    return {4: 1, 2: 2, 1: 4}.get(item, 1)


def cpuid_x86(info=None) -> int:
    """libxsmm_cpuid_x86 analogue (include/libxsmm_cpuid.h:71): the host
    here is never an x86 JIT target — returns 0 (the reference's
    LIBXSMM_TARGET_ARCH_UNKNOWN for a non-matching ISA family). The
    conceptually arch-neutral probe is cpuid()/get_target_archid()."""
    del info
    return 0


def cpuid_arm(info=None) -> int:
    """libxsmm_cpuid_arm analogue (include/libxsmm_cpuid.h:72): see
    cpuid_x86 — not an AArch64 JIT target, returns 0."""
    del info
    return 0


def cpuid_rv64(info=None) -> int:
    """libxsmm_cpuid_rv64 analogue (include/libxsmm_cpuid.h:132): see
    cpuid_x86 — not an RV64 JIT target, returns 0."""
    del info
    return 0


def cpuid_vlen32(archid: Optional[int] = None) -> int:
    """libxsmm_cpuid_vlen32 analogue (include/libxsmm_cpuid.h:123): 32-bit
    elements per vector register -> per VPU lane row here (always 128
    lanes; archid accepted for signature parity)."""
    del archid
    return get_geometry().vpu[1]


def on_tpu() -> bool:
    """True when the default JAX backend is real TPU hardware."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ("tpu", "axon")


def use_interpret() -> bool:
    """Whether Pallas kernels should run in interpret mode.

    The no-hardware analogue of the reference-kernel oracle
    (/root/reference/src/libxsmm_main.c:2198-2216): on CPU backends every
    Pallas kernel still yields a runnable callable via the interpreter.
    """
    if CONFIG.interpret:
        return True
    return not on_tpu()
