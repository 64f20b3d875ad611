"""Runtime configuration for libxsmm_tpu.

TPU-native analogue of the reference's three-tier flag system
(env vars read in /root/reference/src/libxsmm_main.c:1089-1107 and the
per-arch tuning knobs behind /root/reference/include/libxsmm_cpuid.h:74-151).

One typed config object, populated from environment variables at import, with
programmatic overrides (mirrors libxsmm_set_verbosity / libxsmm_set_target_arch,
/root/reference/include/libxsmm.h:74-93).

Environment variables (all prefixed XSMM_TPU_):
  XSMM_TPU_VERBOSE     int  verbosity level; >=1 summary stats at exit,
                            >=2 per-dispatch logging, >=3 kernel build logging.
  XSMM_TPU_TARGET      str  override detected TPU generation ("v4","v5e","v5p",
                            "v6e","cpu"); like LIBXSMM_TARGET retargeting.
  XSMM_TPU_CACHE       int  0 disables the dispatch cache (always rebuild);
                            like LIBXSMM_CACHE.
  XSMM_TPU_INTERPRET   int  1 forces Pallas interpret mode (no-hardware mode;
                            the analogue of running reference kernels).
  XSMM_TPU_FALLBACK    int  0 disables the XLA/jnp reference fallback when a
                            Pallas builder rejects a descriptor (analogue of
                            LIBXSMM_DISABLE_*_REFERENCE_FALLBACK).
  XSMM_TPU_FSSPMDM_HINT       int  0 auto, 1 force sparse, 2 force dense
                                   (LIBXSMM_FSSPMDM_HINT).
  XSMM_TPU_FSSPMDM_DENSE_BIAS float  dense-kernel selection bias, default 0.1
                                   (LIBXSMM_FSSPMDM_DENSE_BIAS).
  XSMM_TPU_FSSPMDM_NTUNE      int  autotune reps, default 250.
  XSMM_TPU_DUMP        str  directory to dump lowered kernels (LIBXSMM_DUMP).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


@dataclasses.dataclass
class Config:
    verbose: int = 0
    target: Optional[str] = None          # TPU generation override
    cache_enabled: bool = True
    interpret: bool = False               # force Pallas interpret mode
    fallback_enabled: bool = True         # jnp/XLA reference fallback allowed
    fsspmdm_hint: int = 0                 # 0 auto | 1 sparse | 2 dense
    fsspmdm_dense_bias: float = 0.1
    fsspmdm_ntune: int = 250   # reference LIBXSMM_FSSPMDM_NTUNE default (:19-21)
    dump_dir: Optional[str] = None
    autotune_cache_path: Optional[str] = None   # persistent autotune KV log
    compilation_cache_dir: Optional[str] = None  # JAX persistent compile cache
    registry_capacity: int = 131072   # LIBXSMM_CAPACITY_REGISTRY analogue
    registry_evict: bool = False      # LRU eviction at capacity (opt-in; the
                                      # reference warns-and-keeps, main.c:2902)

    @staticmethod
    def from_env() -> "Config":
        return Config(
            verbose=_env_int("XSMM_TPU_VERBOSE", 0),
            target=os.environ.get("XSMM_TPU_TARGET") or None,
            cache_enabled=_env_int("XSMM_TPU_CACHE", 1) != 0,
            interpret=_env_int("XSMM_TPU_INTERPRET", 0) != 0,
            fallback_enabled=_env_int("XSMM_TPU_FALLBACK", 1) != 0,
            fsspmdm_hint=_env_int("XSMM_TPU_FSSPMDM_HINT", 0),
            fsspmdm_dense_bias=_env_float("XSMM_TPU_FSSPMDM_DENSE_BIAS", 0.1),
            fsspmdm_ntune=_env_int("XSMM_TPU_FSSPMDM_NTUNE", 250),
            dump_dir=os.environ.get("XSMM_TPU_DUMP") or None,
            autotune_cache_path=os.environ.get("XSMM_TPU_AUTOTUNE_CACHE")
            or None,
            compilation_cache_dir=os.environ.get(
                "XSMM_TPU_COMPILATION_CACHE") or None,
            registry_capacity=_env_int("XSMM_TPU_REGISTRY_CAPACITY", 131072),
            registry_evict=_env_int("XSMM_TPU_REGISTRY_EVICT", 0) != 0,
        )


CONFIG = Config.from_env()


def get_config() -> Config:
    return CONFIG


def set_verbosity(level: int) -> int:
    """Programmatic verbosity override (libxsmm_set_verbosity analogue)."""
    prev = CONFIG.verbose
    CONFIG.verbose = int(level)
    return prev


def set_target(target: Optional[str]) -> None:
    """Override the detected TPU generation (libxsmm_set_target_arch analogue).

    Invalidates the device-geometry cache so subsequent dispatches re-tile.
    """
    from . import device

    CONFIG.target = target
    device.invalidate_geometry_cache()
