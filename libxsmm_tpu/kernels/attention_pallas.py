"""Fused attention Pallas kernels: scores never touch HBM (v2, online).

The library's attention composition (models/tpp_attention.py, the TPP
paper's flagship workload) lowers naively to three HBM-visible tensors per
(batch, head): scores (s, s), probs (s, s), context (s, hd). At serving
sequence lengths the (s, s) intermediates dominate traffic. These kernels
are the fusion — the same role the reference's matrix-equation JIT plays
for its fused eltwise trees (/root/reference/src/libxsmm_matrixeqn.c):
one kernel, no intermediate stores.

v2 design (online softmax; replaces the r3 resident-panel kernel):
  * grid = (bh, s/bq, s/bk) with the K axis innermost. Running max m,
    denominator l and the f32 context accumulator live in VMEM scratch
    across K steps (the standard flash recurrence). When bk == s the
    schedule degenerates to the r3 resident-panel design — one K step,
    K/V fetched once per (batch, head) row and reused across all query
    blocks — so small sequences keep the v1 performance while the s cap
    is lifted (r3 capped s at 4096; v2 serves any s % 128 == 0 that fits
    HBM).
  * Block geometry is chosen from the VMEM footprint FORMULA (operands
    double-buffered + f32 score panel + scratch), not a fixed table —
    the r3 advisor found the fixed bq admitted an f32 corner (s=4096,
    hd=256) that oversubscribed VMEM.
  * Fused extras: additive bias (streamed (bq, bk) blocks), dropout on
    the probabilities via a COUNTER-BASED hash of the global (batch,
    row, col) position (splitmix-style u32 avalanche, lanewise VPU ops)
    so the backward REPLAYS the identical mask with zero state — the
    reference's DROPOUT/DROPOUT_INV bitmask pairing
    (generator_mateltwise_*_avx512.c dropout path) without materializing
    the mask. A position hash, unlike pltpu.prng_*, runs identically in
    interpret mode (CPU tests validate the replay bit-exactly) and is
    independent of block geometry. Causal masking SKIPS whole blocks
    above the diagonal (the useful-flops halving the reference accounts
    for masked GEMMs).
  * Both matmuls run on the MXU in the storage dtype with f32
    accumulators (Mosaic requires 32-bit accumulation; bf16 inputs use
    native bf16 passes, f32 uses Precision.HIGHEST per ops/gemm policy).
  * K arrives pre-transposed (bh, hd, s): the dispatch entry folds the
    transpose into XLA's layout of the preceding projection.
  * Optional LSE output (bh, s, 128) — the per-row log-sum-exp statistic
    lane-BROADCAST across 128 columns (the official TPU flash layout: a
    (1, bq) block of a (bh, s) array violates Mosaic's last-two-dims
    rule; readers recover the column with a lane reduce). It makes
    partial attention results combinable — the backward and the
    sequence-parallel ring (parallel/ring_attention.py) both consume it.

The backward is two Pallas kernels (the standard flash split):
  * dkv: grid (bh, s/bk, s/bq), Q streams innermost; accumulates dK^T
    and dV for one K block in VMEM scratch, probs recomputed from Q, K
    and the saved LSE (the flash recompute trade — the forward never
    stored them).
  * dq: grid (bh, s/bq, s/bk), K streams innermost; accumulates dQ.
Both replay the dropout mask bit-exactly from the position hash (any
tiling). delta = rowsum(dout * out) is precomputed by XLA (cheap,
HBM-linear).

Index maps derive zeros from the grid index (``i - i``) — a literal 0
traces as i64 when some earlier dispatch flipped jax_enable_x64, which
Mosaic cannot legalize (CLAUDE.md x64 hazards).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import device

_NEG = float(np.finfo(np.float32).min)
# VMEM working-set budget for block selection: ~16 MB per core minus
# headroom for Mosaic's own temporaries and the double-buffer slack.
_VMEM_BUDGET = 11 * 2 ** 20


def _itemsize(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def _fwd_vmem(bq, bk, s, hd, item, has_bias) -> int:
    """Forward working set: double-buffered operand blocks + f32 score
    panel (x2 for exp temp) + acc/m/l scratch + out block."""
    operands = (bq * hd + hd * bk + bk * hd
                + (bq * bk if has_bias else 0)) * item * 2
    panel = 2 * bq * bk * 4
    scratch = bq * hd * 4 + 2 * bq * 128 * 4
    out = bq * hd * item * 2
    return operands + panel + scratch + out


def _bwd_vmem(bq, bk, s, hd, item, has_bias) -> int:
    operands = (2 * bq * hd + hd * bk + bk * hd
                + (bq * bk if has_bias else 0)) * item * 2 \
        + 2 * bq * 4 * 2
    panel = 3 * bq * bk * 4
    scratch = 2 * bk * hd * 4 + bq * hd * 4
    out = (hd * bk + bk * hd + bq * hd) * item * 2
    return operands + panel + scratch + out


def _blocks(s: int, hd: int, dtype, has_bias: bool = False,
            mode: str = "fwd"):
    """Largest (bq, bk) whose working set fits the VMEM budget (advisor
    r3: the fixed-table bq admitted an f32 s=4096, hd=256 corner that
    oversubscribed VMEM and would fail the deferred Mosaic compile at
    first call). mode selects the footprint formula — forward and
    backward pick their blocks INDEPENDENTLY (the position-hash dropout
    mask depends only on global coordinates, so the tilings need not
    match)."""
    item = _itemsize(dtype)
    fit = _bwd_vmem if mode == "bwd" else _fwd_vmem
    for bk in (s, 2048, 1024, 512, 256, 128):
        if bk > s or s % bk:
            continue
        for bq in (512, 256, 128):
            if bq > s or s % bq:
                continue
            if fit(bq, bk, s, hd, item, has_bias) <= _VMEM_BUDGET:
                return bq, bk
    return None


def supported(s: int, hd: int, dtype) -> bool:
    """Shapes the fused kernels serve; others take the XLA path."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if s % 128 != 0:
        return False
    if hd % 8 != 0 or hd > 256:
        return False
    return (_blocks(s, hd, dtype, mode="fwd") is not None
            and _blocks(s, hd, dtype, mode="bwd") is not None)


def _dropout_threshold(p: float):
    """keep iff u32_bits >= thr — pure integer compare, no u32->f32 cast
    (Mosaic gap, CLAUDE.md). A NUMPY scalar: a jnp scalar would be a
    captured constant inside Pallas kernel closures."""
    return np.uint32(min(int(p * 2.0 ** 32), 2 ** 32 - 1))


def _rand_bits(seed, b, row, col):
    """Counter-based u32 hash of (seed, batch, global row, global col):
    a splitmix32-style avalanche over lanewise iota counters. Stateless —
    forward and backward recompute the same bits from position alone, in
    any block tiling, on Mosaic AND in interpret mode (pltpu.prng_* has
    no CPU lowering). Quality: two multiply-xorshift rounds, ample for a
    dropout mask."""
    u = jnp.uint32
    h = (row.astype(u) * u(0x9E3779B1)) ^ (col.astype(u) * u(0x85EBCA77))
    h = h ^ (seed.astype(u) + b.astype(u) * u(0xC2B2AE3D))
    h = (h ^ (h >> 15)) * u(0x2C1B3C6D)
    h = (h ^ (h >> 12)) * u(0x297A2D39)
    return h ^ (h >> 15)


def build_flash_attention(bh: int, s: int, hd: int, dtype,
                          causal: bool = False,
                          scale: Optional[float] = None,
                          bias_bh: int = 0,
                          dropout_p: float = 0.0,
                          return_lse: bool = False,
                          block_override=None) -> Callable:
    """Forward kernel factory.

    Returns fn(seed_i32, q, kT, v[, bias]) -> out or (out, lse) for
    q/v:(bh, s, hd), kT:(bh, hd, s), bias:(bias_bh, s, s) with
    bias_bh in {0 (none), 1 (broadcast), bh}. seed is a traced int32
    scalar (ignored when dropout_p == 0, but always part of the ABI so
    forward/backward share plumbing).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not supported(s, hd, dtype):
        raise ValueError(f"unsupported flash shape s={s} hd={hd} {dtype}")
    if not 0.0 <= dropout_p < 1.0:
        raise ValueError(f"dropout_p must be in [0, 1), got {dropout_p}")
    has_bias = bias_bh > 0
    # block_override=(bq, bk): tests force the multi-K-block online
    # recurrence on shapes where the formula would pick bk == s
    bq, bk = block_override or _blocks(s, hd, dtype, has_bias, mode="fwd")
    nq, nk = s // bq, s // bk
    sc = float(scale) if scale is not None else float(hd) ** -0.5
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    thr = _dropout_threshold(dropout_p) if dropout_p > 0.0 else None
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0

    def kernel(seed_ref, *refs):
        if has_bias:
            q_ref, kT_ref, v_ref, bias_ref = refs[:4]
            orefs = refs[4:]
        else:
            q_ref, kT_ref, v_ref = refs[:3]
            orefs = refs[3:]
        if return_lse:
            o_ref, lse_ref = orefs[:2]
            acc, m_s, l_s = orefs[2:]
        else:
            o_ref = orefs[0]
            acc, m_s, l_s = orefs[1:]
        b = pl.program_id(0)
        qi = pl.program_id(1)
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_s[...] = jnp.full((bq, 128), _NEG, jnp.float32)
            l_s[...] = jnp.zeros((bq, 128), jnp.float32)
            acc[...] = jnp.zeros((bq, hd), jnp.float32)

        def compute():
            s_blk = jax.lax.dot(q_ref[0], kT_ref[0],
                                preferred_element_type=jnp.float32,
                                precision=precision) * sc
            if has_bias:
                s_blk = s_blk + bias_ref[0].astype(jnp.float32)
            if causal or dropout_p > 0.0:
                row = qi * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 0)
                col = ki * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 1)
            if causal:
                s_blk = jnp.where(col <= row, s_blk, _NEG)
            # running stats are stored lane-broadcast (bq, 128); a full
            # reduce recovers the (bq, 1) value without lane slicing
            m_prev = jnp.max(m_s[...], axis=-1, keepdims=True)
            l_prev = jnp.max(l_s[...], axis=-1, keepdims=True)
            m_cur = jnp.max(s_blk, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(s_blk - m_new)
            l_new = l_prev * alpha + jnp.sum(e, axis=-1, keepdims=True)
            if dropout_p > 0.0:
                # position-hash mask: the backward recomputes identical
                # bits from (seed, b, global row, global col)
                bits = _rand_bits(seed_ref[0], b, row, col)
                e_use = jnp.where(bits >= thr, e * inv_keep, 0.0)
            else:
                e_use = e
            acc[...] = acc[...] * alpha + jax.lax.dot(
                e_use.astype(dtype), v_ref[0],
                preferred_element_type=jnp.float32, precision=precision)
            m_s[...] = jnp.broadcast_to(m_new, (bq, 128))
            l_s[...] = jnp.broadcast_to(l_new, (bq, 128))

        if causal:
            # whole blocks strictly above the diagonal are SKIPPED — the
            # masked-GEMM flops halving the reference accounts for
            pl.when(ki * bk <= qi * bq + (bq - 1))(compute)
        else:
            compute()

        @pl.when(ki == nk - 1)
        def _():
            l = jnp.max(l_s[...], axis=-1, keepdims=True)
            o_ref[0] = (acc[...] / l).astype(o_ref.dtype)
            if return_lse:
                # lane-broadcast (bq, 128) stat layout (the official TPU
                # flash convention): a (1, bq) block of a (bh, s) array
                # is not Mosaic-legal (last-two-dims rule), and readers
                # recover the (bq, 1) value with a plain lane reduce
                lse_ref[0] = jnp.broadcast_to(
                    jnp.max(m_s[...], axis=-1, keepdims=True)
                    + jnp.log(l), (bq, 128))

    in_specs = [
        pl.BlockSpec((1, bq, hd), lambda b, i, j, *_: (b, i, b - b)),
        pl.BlockSpec((1, hd, bk), lambda b, i, j, *_: (b, b - b, j)),
        pl.BlockSpec((1, bk, hd), lambda b, i, j, *_: (b, j, b - b)),
    ]
    if has_bias:
        if bias_bh == bh:
            in_specs.append(pl.BlockSpec((1, bq, bk),
                                         lambda b, i, j, *_: (b, i, j)))
        else:
            in_specs.append(pl.BlockSpec((1, bq, bk),
                                         lambda b, i, j, *_: (b - b, i, j)))
    out_specs = [pl.BlockSpec((1, bq, hd), lambda b, i, j, *_: (b, i, b - b))]
    out_shape = [jax.ShapeDtypeStruct((bh, s, hd), dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, bq, 128),
                                      lambda b, i, j, *_: (b, i, b - b)))
        out_shape.append(jax.ShapeDtypeStruct((bh, s, 128), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * hd // (2 if causal else 1),
            bytes_accessed=bh * s * hd * _itemsize(dtype) * 3,
            transcendentals=bh * s * s),
    )

    def fn(seed, q, kT, v, bias=None):
        seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
        args = (seed_arr, q, kT, v) + ((bias,) if has_bias else ())
        out = call(*args)
        if return_lse:
            return out[0], out[1]
        return out[0]

    fn.block_q, fn.block_k = bq, bk
    return fn


def build_flash_attention_bwd(bh: int, s: int, hd: int, dtype,
                              causal: bool = False,
                              scale: Optional[float] = None,
                              bias_bh: int = 0,
                              dropout_p: float = 0.0,
                              bias_grad: bool = False,
                              block_override=None):
    """Backward kernel factory (dkv + dq Pallas kernels).

    Returns fn(seed, q, kT, v, dout, lse, delta[, bias]) ->
    (dq, dkT, dv[, dbias]). Block geometry is chosen independently of the
    forward's (the position-hash dropout mask depends only on GLOBAL
    coordinates, so replay survives any tiling). bias_grad=True additionally
    emits dbias (only valid for bias_bh == bh: the broadcast (1, s, s)
    case would need a cross-batch reduction the grid order cannot
    express race-free; ops/attention sums it outside for that case or
    forbids it).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not supported(s, hd, dtype):
        raise ValueError(f"unsupported flash shape s={s} hd={hd} {dtype}")
    has_bias = bias_bh > 0
    if bias_grad and bias_bh != bh:
        raise ValueError("bias_grad requires a per-(batch*head) bias")
    bq, bk = block_override or _blocks(s, hd, dtype, has_bias, mode="bwd")
    nq, nk = s // bq, s // bk
    sc = float(scale) if scale is not None else float(hd) ** -0.5
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    thr = _dropout_threshold(dropout_p) if dropout_p > 0.0 else None
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0

    def recompute(seed_ref, q_ref, kT_ref, v_ref, do_ref, lse_ref,
                  delta_ref, bias_ref, b, qi, ki):
        """Shared block math: probs (with replayed dropout), dsoftmax."""
        s_blk = jax.lax.dot(q_ref[0], kT_ref[0],
                            preferred_element_type=jnp.float32,
                            precision=precision) * sc
        if has_bias:
            s_blk = s_blk + bias_ref[0].astype(jnp.float32)
        if causal or dropout_p > 0.0:
            row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if causal:
            s_blk = jnp.where(col <= row, s_blk, _NEG)
        # stats arrive lane-broadcast (bq, 128): a lane reduce recovers
        # the column without any (bq,) -> (bq, 1) relayout
        lse_col = jnp.max(lse_ref[0], axis=-1, keepdims=True)   # (bq, 1)
        p = jnp.exp(s_blk - lse_col)                        # (bq, bk) f32
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if dropout_p > 0.0:
            keep = _rand_bits(seed_ref[0], b, row, col) >= thr
            p_drop = jnp.where(keep, p * inv_keep, 0.0)
            dp_use = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            p_drop, dp_use = p, dp
        delta_col = jnp.max(delta_ref[0], axis=-1, keepdims=True)
        ds = p * (dp_use - delta_col)                       # (bq, bk) f32
        return p_drop, ds

    # ---------------- dkv kernel: grid (bh, nk, nq), Q innermost -------
    def dkv_kernel(seed_ref, *refs):
        if has_bias:
            (q_ref, kT_ref, v_ref, do_ref, lse_ref, delta_ref,
             bias_ref) = refs[:7]
            rest = refs[7:]
        else:
            q_ref, kT_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
            bias_ref = None
            rest = refs[6:]
        if bias_grad:
            dkT_ref, dv_ref, dbias_ref = rest[:3]
            dk_acc, dv_acc = rest[3:]
        else:
            dkT_ref, dv_ref = rest[:2]
            dk_acc, dv_acc = rest[2:]
        b = pl.program_id(0)
        ki = pl.program_id(1)
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _():
            dk_acc[...] = jnp.zeros((hd, bk), jnp.float32)
            dv_acc[...] = jnp.zeros((bk, hd), jnp.float32)

        def compute():
            p_drop, ds = recompute(seed_ref, q_ref, kT_ref, v_ref, do_ref,
                                   lse_ref, delta_ref, bias_ref, b, qi, ki)
            # dv_j += p~_ij^T dout_i : contract the q dim of both
            dv_acc[...] += jax.lax.dot_general(
                p_drop.astype(dtype), do_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            # dkT_j += q_i^T ds_ij : (hd, bk), matching kT's layout
            dk_acc[...] += jax.lax.dot_general(
                q_ref[0], ds.astype(dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            if bias_grad:
                dbias_ref[0] = ds.astype(dbias_ref.dtype)

        if causal:
            # q blocks entirely above this k block contribute nothing
            run = qi * bq + (bq - 1) >= ki * bk
            pl.when(run)(compute)
            if bias_grad:
                @pl.when(jnp.logical_not(run))
                def _():
                    dbias_ref[0] = jnp.zeros((bq, bk), dbias_ref.dtype)
        else:
            compute()

        @pl.when(qi == nq - 1)
        def _():
            dkT_ref[0] = (dk_acc[...] * sc).astype(dkT_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    dkv_in = [
        pl.BlockSpec((1, bq, hd), lambda b, j, i, *_: (b, i, b - b)),
        pl.BlockSpec((1, hd, bk), lambda b, j, i, *_: (b, b - b, j)),
        pl.BlockSpec((1, bk, hd), lambda b, j, i, *_: (b, j, b - b)),
        pl.BlockSpec((1, bq, hd), lambda b, j, i, *_: (b, i, b - b)),
        pl.BlockSpec((1, bq, 128), lambda b, j, i, *_: (b, i, b - b)),
        pl.BlockSpec((1, bq, 128), lambda b, j, i, *_: (b, i, b - b)),
    ]
    if has_bias:
        if bias_bh == bh:
            dkv_in.append(pl.BlockSpec((1, bq, bk),
                                       lambda b, j, i, *_: (b, i, j)))
        else:
            dkv_in.append(pl.BlockSpec((1, bq, bk),
                                       lambda b, j, i, *_: (b - b, i, j)))
    dkv_out = [
        pl.BlockSpec((1, hd, bk), lambda b, j, i, *_: (b, b - b, j)),
        pl.BlockSpec((1, bk, hd), lambda b, j, i, *_: (b, j, b - b)),
    ]
    dkv_oshape = [jax.ShapeDtypeStruct((bh, hd, s), dtype),
                  jax.ShapeDtypeStruct((bh, s, hd), dtype)]
    if bias_grad:
        dkv_out.append(pl.BlockSpec((1, bq, bk),
                                    lambda b, j, i, *_: (b, i, j)))
        dkv_oshape.append(jax.ShapeDtypeStruct((bh, s, s), jnp.float32))

    dkv_call = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nk, nq),
            in_specs=dkv_in,
            out_specs=dkv_out,
            scratch_shapes=[pltpu.VMEM((hd, bk), jnp.float32),
                            pltpu.VMEM((bk, hd), jnp.float32)]),
        out_shape=dkv_oshape,
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * s * s * hd // (2 if causal else 1),
            bytes_accessed=bh * s * hd * _itemsize(dtype) * 5,
            transcendentals=bh * s * s),
    )

    # ---------------- dq kernel: grid (bh, nq, nk), K innermost --------
    def dq_kernel(seed_ref, *refs):
        if has_bias:
            (q_ref, kT_ref, v_ref, do_ref, lse_ref, delta_ref,
             bias_ref) = refs[:7]
            rest = refs[7:]
        else:
            q_ref, kT_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
            bias_ref = None
            rest = refs[6:]
        dq_ref, dq_acc = rest
        b = pl.program_id(0)
        qi = pl.program_id(1)
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            dq_acc[...] = jnp.zeros((bq, hd), jnp.float32)

        def compute():
            _, ds = recompute(seed_ref, q_ref, kT_ref, v_ref, do_ref,
                              lse_ref, delta_ref, bias_ref, b, qi, ki)
            # dq_i += ds_ij k_j : contract the k dim (kT is (hd, bk))
            dq_acc[...] += jax.lax.dot_general(
                ds.astype(dtype), kT_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        if causal:
            pl.when(ki * bk <= qi * bq + (bq - 1))(compute)
        else:
            compute()

        @pl.when(ki == nk - 1)
        def _():
            dq_ref[0] = (dq_acc[...] * sc).astype(dq_ref.dtype)

    dq_in = [
        pl.BlockSpec((1, bq, hd), lambda b, i, j, *_: (b, i, b - b)),
        pl.BlockSpec((1, hd, bk), lambda b, i, j, *_: (b, b - b, j)),
        pl.BlockSpec((1, bk, hd), lambda b, i, j, *_: (b, j, b - b)),
        pl.BlockSpec((1, bq, hd), lambda b, i, j, *_: (b, i, b - b)),
        pl.BlockSpec((1, bq, 128), lambda b, i, j, *_: (b, i, b - b)),
        pl.BlockSpec((1, bq, 128), lambda b, i, j, *_: (b, i, b - b)),
    ]
    if has_bias:
        if bias_bh == bh:
            dq_in.append(pl.BlockSpec((1, bq, bk),
                                      lambda b, i, j, *_: (b, i, j)))
        else:
            dq_in.append(pl.BlockSpec((1, bq, bk),
                                      lambda b, i, j, *_: (b - b, i, j)))

    dq_call = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nq, nk),
            in_specs=dq_in,
            out_specs=pl.BlockSpec((1, bq, hd),
                                   lambda b, i, j, *_: (b, i, b - b)),
            scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((bh, s, hd), dtype),
        interpret=device.use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * hd // (2 if causal else 1),
            bytes_accessed=bh * s * hd * _itemsize(dtype) * 4,
            transcendentals=bh * s * s),
    )

    def fn(seed, q, kT, v, dout, lse, delta, bias=None):
        seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
        extra = (bias,) if has_bias else ()
        dkv = dkv_call(seed_arr, q, kT, v, dout, lse, delta, *extra)
        dq = dq_call(seed_arr, q, kT, v, dout, lse, delta, *extra)
        if bias_grad:
            dkT, dv, dbias = dkv
            return dq, dkT, dv, dbias
        dkT, dv = dkv
        return dq, dkT, dv

    fn.block_q, fn.block_k = bq, bk
    return fn
