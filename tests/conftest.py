"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the no-hardware mode from
SURVEY.md §4: Pallas interpret=True plays the reference-kernel oracle, and
multi-chip sharding is validated on a virtual device mesh, analogous to the
reference's LIBXSMM_TARGET retargeting below the host CPUID).
"""

import os

# must run before jax initializes a backend. Set XSMM_TESTS_TPU=1 to run the
# suite on real TPU hardware instead (developer validation of Mosaic paths).
if os.environ.get("XSMM_TESTS_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

if os.environ.get("XSMM_TESTS_TPU", "0") != "1":
    # the axon TPU plugin ignores the env var; force via config
    import jax
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
