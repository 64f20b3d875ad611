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


# The default state is created LAZILY: RngState calls jax.random.PRNGKey,
# which initializes the JAX backend — at import time that would commit the
# backend before the user can run jax.config.update("jax_platforms", ...)
# (and hangs indefinitely on a dead device tunnel).
_default_state = None


def _default():
    global _default_state
    if _default_state is None:
        _default_state = RngState(25071975)
    return _default_state


def f32_seq(shape, state: RngState = None):
    """libxsmm_rng_f32_seq: uniform [0,1) float32 of the given shape."""
    st = state or _default()
    sub = st.split()
    return jax.random.uniform(sub.key, shape, jnp.float32)


def u32_seq(shape, state: RngState = None):
    st = state or _default()
    sub = st.split()
    return jax.random.bits(sub.key, shape, jnp.uint32)


def rand_u32(state: RngState = None) -> int:
    """libxsmm_rng_u32-style scalar draw in [0, 2^32)."""
    st = state or _default()
    sub = st.split()
    return int(jax.random.bits(sub.key, (), jnp.uint32))


def rand_u64(state: RngState = None) -> int:
    """libxsmm_rng_u64-ish scalar draw (host convenience). The two 32-bit
    halves come from two FRESH split outputs — drawing from a key and then
    splitting the same key is the key-reuse pattern JAX flags (correlated
    streams under jax_debug_key_reuse)."""
    st = state or _default()
    hi, lo = st.split(), st.split()
    return int(jax.random.bits(hi.key, (), jnp.uint32)) << 32 | int(
        jax.random.bits(lo.key, (), jnp.uint32))


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


def rng_f64(state: RngState = None) -> float:
    """libxsmm_rng_f64 (src/libxsmm_utils.c:76): one uniform double in
    [0,1). Drawn from the same stream machinery as f32_seq."""
    st = state or _default()
    sub = st.split()
    return float(jax.random.uniform(sub.key, (), jnp.float64
                                    if jax.config.jax_enable_x64
                                    else jnp.float32))


def rng_seq(nbytes: int, state: RngState = None) -> bytes:
    """libxsmm_rng_seq (src/libxsmm_utils.c:50): nbytes of pseudo-random
    bytes (returned, not written through a pointer — Python contract)."""
    if nbytes <= 0:
        return b""
    st = state or _default()
    sub = st.split()
    words = (nbytes + 3) // 4
    buf = np.asarray(jax.random.bits(sub.key, (words,), jnp.uint32))
    return buf.tobytes()[:nbytes]


def lsfr_i32(rng_state: np.ndarray, seed_idx: int = 0):
    """libxsmm_lsfr_i32 (src/libxsmm_lpflt_quant.c:303): one xoshiro128+
    step over the reference's 16-lane strided state block (4 state words at
    stride 16 starting at seed_idx). Mutates rng_state IN PLACE and returns
    the u32 draw — bit-exact to the reference recurrence; this is the host
    oracle for the stochastic-rounding kernels' PRNG contract."""
    s = np.asarray(rng_state, np.uint32)
    ld = 16
    s0, s1, s2, s3 = (s[seed_idx + 0 * ld], s[seed_idx + 1 * ld],
                      s[seed_idx + 2 * ld], s[seed_idx + 3 * ld])
    with np.errstate(over="ignore"):
        t = np.uint32(s0 + s3)
        out = np.uint32(((t << np.uint32(7)) | (t >> np.uint32(25))) + s0)
        t1 = np.uint32(s1 << np.uint32(9))
        s2 ^= s0
        s3 ^= s1
        s1 ^= s2
        s0 ^= s3
        s2 ^= t1
        s3 = np.uint32((s3 << np.uint32(11)) | (s3 >> np.uint32(21)))
    rng_state[seed_idx + 0 * ld] = s0
    rng_state[seed_idx + 1 * ld] = s1
    rng_state[seed_idx + 2 * ld] = s2
    rng_state[seed_idx + 3 * ld] = s3
    return int(out)
