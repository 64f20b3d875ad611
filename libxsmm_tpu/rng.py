"""RNG utilities.

API-shape port of /root/reference/src/libxsmm_rng.c (xoshiro128+ scalar and
vectorized float sequences with external-state variants, :123-239) onto
TPU-native generators: jax.random (threefry) for traced code and the Pallas
per-core PRNG for in-kernel streams (kernels/eltwise_pallas.py). Sequences
are NOT bit-identical to xoshiro — like the reference, which itself ships
distinct scalar vs AVX-512 streams, only the distribution is contractual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class RngState:
    """libxsmm_rng_create_extstate analogue: an explicit, advanceable
    state handle for reproducible float sequences."""

    def __init__(self, seed: int):
        self.key = jax.random.PRNGKey(seed)

    def split(self) -> "RngState":
        self.key, sub = jax.random.split(self.key)
        out = RngState.__new__(RngState)
        out.key = sub
        return out


def set_seed(seed: int) -> RngState:
    """libxsmm_rng_set_seed analogue: returns the process-default state."""
    global _default_state
    _default_state = RngState(seed)
    return _default_state


_default_state = RngState(25071975)


def f32_seq(shape, state: RngState = None):
    """libxsmm_rng_f32_seq: uniform [0,1) float32 of the given shape."""
    st = state or _default_state
    sub = st.split()
    return jax.random.uniform(sub.key, shape, jnp.float32)


def u32_seq(shape, state: RngState = None):
    st = state or _default_state
    sub = st.split()
    return jax.random.bits(sub.key, shape, jnp.uint32)


def rand_u32(state: RngState = None) -> int:
    """libxsmm_rng_u32-style scalar draw in [0, 2^32)."""
    st = state or _default_state
    sub = st.split()
    return int(jax.random.bits(sub.key, (), jnp.uint32))


def rand_u64(state: RngState = None) -> int:
    """libxsmm_rng_u64-ish scalar draw (host convenience)."""
    st = state or _default_state
    sub = st.split()
    return int(jax.random.bits(sub.key, (), jnp.uint32)) << 32 | int(
        jax.random.bits(sub.split().key, (), jnp.uint32))


def create_extstate(seed: int) -> RngState:
    """libxsmm_rng_create_extstate (src/libxsmm_rng.c:172-189): an explicit
    state handle independent of the process-default stream."""
    return RngState(seed)


def get_extstate_size() -> int:
    """libxsmm_rng_get_extstate_size: bytes of the external state (the
    threefry key is 2 x u32; the reference's AVX-512 xoshiro state is
    16 x 4 x u32 — size reflects OUR state, not the reference's)."""
    return 8


def destroy_extstate(state: RngState) -> None:
    """libxsmm_rng_destroy_extstate: GC-managed; kept for API parity."""
    state.key = None
