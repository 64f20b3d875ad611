"""Fused attention Pallas kernel: scores never touch HBM.

The library's attention composition (models/tpp_attention.py, the TPP
paper's flagship workload) lowers naively to three HBM-visible tensors per
(batch, head): scores (s, s), probs (s, s), context (s, hd). At serving
sequence lengths the (s, s) intermediates dominate traffic: the naive path
moves ~2 * s*s * 4 B per head through HBM that a fused kernel keeps in
VMEM. This kernel is the fusion — the same role the reference's
matrix-equation JIT plays for its fused eltwise trees
(/root/reference/src/libxsmm_matrixeqn.c): one kernel, no intermediate
stores.

Design (VMEM-resident K/V variant, not online-softmax flash):
  * grid = (batch*heads, s // block_q); K^T and V for the whole sequence
    stay VMEM-resident per grid row while query blocks stream. For the
    supported envelope (s <= 4096, hd <= 256) K+V+scores fit comfortably
    in the ~16 MB VMEM quota, so the online-softmax recurrence would only
    add VPU work — a full-row softmax on the materialized (block_q, s)
    panel is both simpler and faster. The scores panel lives in registers
    /VMEM values, never in HBM.
  * Both matmuls run on the MXU with f32 accumulators (Mosaic requires
    32-bit accumulation; bf16 inputs use default passes, f32 inputs use
    Precision.HIGHEST per the library policy, ops/gemm.matmul_precision).
  * K arrives pre-transposed (bh, hd, s): the dispatch entry folds the
    transpose into XLA's layout of the preceding projection, so the
    kernel's LHS/RHS are both in natural MXU orientation.
  * Causal masking is an in-kernel iota compare (2-D broadcasted_iota;
    Mosaic has no 1-D iota), adding zero HBM traffic.

Index maps derive zeros from the grid index (``i - i``) — a literal 0
traces as i64 when some earlier dispatch flipped jax_enable_x64, which
Mosaic cannot legalize (CLAUDE.md x64 hazards).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .. import device

# VMEM envelope for the resident-K/V schedule (f32 worst case):
# kT + v + q_blk + scores + out ~= (2*s*hd + bq*hd*2 + bq*s) * 4 B.
_MAX_SEQ = 4096
_MAX_HEAD = 256


def supported(s: int, hd: int, dtype) -> bool:
    """Shapes the fused kernel serves; others take the XLA path."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if s % 128 != 0 or s > _MAX_SEQ:
        return False
    if hd % 8 != 0 or hd > _MAX_HEAD:
        return False
    return True


def _block_q(s: int) -> int:
    for bq in (512, 256, 128):
        if s % bq == 0:
            return bq
    return 128


def build_flash_attention(bh: int, s: int, hd: int, dtype,
                          causal: bool = False,
                          scale: Optional[float] = None) -> Callable:
    """Return fn(q, kT, v) -> out for q/v:(bh, s, hd), kT:(bh, hd, s)."""
    from jax.experimental import pallas as pl

    if not supported(s, hd, dtype):
        raise ValueError(f"unsupported flash shape s={s} hd={hd} {dtype}")
    bq = _block_q(s)
    sc = float(scale) if scale is not None else float(hd) ** -0.5
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    import numpy as np
    neg = float(np.finfo(np.float32).min)   # plain float: a jnp scalar here
                                            # would be a captured constant

    def kernel(q_ref, kT_ref, v_ref, o_ref):
        i = pl.program_id(1)
        # operands stay in the storage dtype: bf16 inputs use native bf16
        # MXU passes (upcasting would force 4x-slower f32 passes); the
        # ACCUMULATOR is always f32 (Mosaic requires 32-bit accumulation)
        scores = jax.lax.dot(q_ref[0], kT_ref[0],
                             preferred_element_type=jnp.float32,
                             precision=precision) * sc
        if causal:
            row = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
            scores = jnp.where(col <= row, scores, neg)
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        ctx = jax.lax.dot(probs, v_ref[0],
                          preferred_element_type=jnp.float32,
                          precision=precision)
        o_ref[0] = ctx.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bh, s // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, b - b)),
            pl.BlockSpec((1, hd, s), lambda b, i: (b, i - i, i - i)),
            pl.BlockSpec((1, s, hd), lambda b, i: (b, i - i, i - i)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, b - b)),
        out_shape=jax.ShapeDtypeStruct((bh, s, hd), dtype),
        interpret=device.use_interpret(),
    )
