"""Ring (sequence-parallel / context-parallel) attention over a mesh axis.

The reference has no attention and no distributed layer at all
(SURVEY.md §2.6/§5.7 — verified absent); this is the NEW-AXIS component
the blueprint maps onto the reference's only "long context" notion (the
fsspmdm N-chunking, /root/reference/src/libxsmm_fsspmdm.c:508-513),
built the TPU way: `shard_map` over a mesh axis, K/V segments rotating
on a double-buffered `ppermute` ring over ICI (the same prefetch
pattern as parallel/spmm_dist._build_ring2) while every device folds
each incoming segment into its query block's ONLINE-SOFTMAX state.

The per-segment math is the fused flash kernel
(kernels/attention_pallas.py) asked for its LSE output; partial results
combine with the standard log-sum-exp weighting:

    m   = max(lse_a, lse_b)
    sa, sb = exp(lse_a - m), exp(lse_b - m)
    out = (out_a * sa + out_b * sb) / (sa + sb)
    lse = m + log(sa + sb)

Causality is handled CHUNK-WISE, with no in-kernel offset plumbing:
the resident (diagonal) chunk uses the causal kernel; rotated-in chunks
are either fully visible (source index < own index — the plain kernel)
or fully masked (sb forced to 0 in the combine). Compute for masked
chunks still runs (every device executes the same program — the
SPMD-uniformity trade); the useful-work ceiling is the same triangle
the single-chip causal kernel skips blocks for.

Differentiable end-to-end via a custom VJP over the WHOLE ring: the
forward saves the final global LSE; the backward runs a SECOND ring
pass in which every (q_i, kv_j) segment pair's gradient contribution is
computed by the Pallas flash backward kernels fed the GLOBAL lse/delta
— p_ij = exp(s_ij - lse_global_i) is already the exact global softmax,
so the segmentwise backward decomposes exactly like the single-device
flash backward over K blocks. dK/dV accumulators travel WITH their
segment around the ring and arrive home after the final rotation.

Comm model (per device, per call): (P-1) rotations of the local K^T and
V segments -> (P-1) * 2 * bh * s_loc * hd * itemsize bytes. Asserted
against the lowered HLO in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_comm_bytes_per_device(bh: int, s: int, hd: int, ndev: int,
                               dtype) -> int:
    """Analytic per-device comm volume: (P-1) hops x (kT + v) segment."""
    isz = jnp.dtype(dtype).itemsize
    seg = bh * (s // ndev) * hd * isz
    return (ndev - 1) * 2 * seg


def _combine(out, lse, o_t, lse_t, include=None):
    """Log-sum-exp weighted merge of two normalized partial results.
    out/o_t: (bh, s_loc, hd) f32; lse/lse_t: (bh, s_loc) f32."""
    m = jnp.maximum(lse, lse_t)
    sa = jnp.exp(lse - m)
    sb = jnp.exp(lse_t - m)
    if include is not None:
        sb = jnp.where(include, sb, 0.0)
    denom = sa + sb
    out = (out * sa[..., None] + o_t * sb[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)


def make_ring_attention(mesh: Mesh, axis: str, bh: int, s: int, hd: int,
                        dtype=jnp.bfloat16, causal: bool = False,
                        scale: Optional[float] = None):
    """Build a jitted sequence-parallel attention fn over `mesh[axis]`.

    Returns (fn, shardings) where fn(q, kT, v) -> out for GLOBAL arrays
    q/v: (bh, s, hd), kT: (bh, hd, s); `shardings` is the dict of
    NamedShardings to device_put the operands with (sequence axis over
    `axis`). The result matches single-device attention on the full
    sequence (tests pin this on the 8-device CPU mesh).
    """
    from ..kernels.attention_pallas import (build_flash_attention,
                                            build_flash_attention_bwd,
                                            supported)

    ndev = mesh.shape[axis]
    if s % ndev:
        raise ValueError(f"s={s} must divide over {ndev} devices")
    s_loc = s // ndev
    sc = float(scale) if scale is not None else float(hd) ** -0.5
    jdt = jnp.dtype(dtype)
    if not supported(s_loc, hd, jdt):
        raise ValueError(f"local shard s_loc={s_loc} hd={hd} outside the "
                         f"fused kernel envelope")
    kern_full = build_flash_attention(bh, s_loc, hd, jdt, causal=False,
                                      scale=sc, return_lse=True)
    bwd_full = build_flash_attention_bwd(bh, s_loc, hd, jdt, causal=False,
                                         scale=sc)
    if causal:
        kern_diag = build_flash_attention(bh, s_loc, hd, jdt, causal=True,
                                          scale=sc, return_lse=True)
        bwd_diag = build_flash_attention_bwd(bh, s_loc, hd, jdt,
                                             causal=True, scale=sc)
    else:
        kern_diag, bwd_diag = kern_full, bwd_full
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def _src(idx, t):
        """After t forward rotations the resident segment originated at
        device (idx - t) mod ndev. Typed i32 constants: under a global
        jax_enable_x64 flip (any F64 dispatch sets it) bare Python ints
        trace as i64 and lax.rem rejects the mixed dtypes (CLAUDE.md x64
        hazards)."""
        return jax.lax.rem(idx - jnp.int32(t) + jnp.int32(ndev),
                           jnp.int32(ndev))

    def _fwd_ring(q, kT, v):
        idx = jax.lax.axis_index(axis)
        # t = 0: the resident (diagonal) chunk — causal kernel when causal
        o0, lse0 = kern_diag(0, q, kT, v)
        out = o0.astype(jnp.float32)
        lse = lse0[..., 0]
        cur = (kT, v)
        fly = (jax.lax.ppermute(kT, axis, perm=perm),
               jax.lax.ppermute(v, axis, perm=perm)) if ndev > 1 else None
        for t in range(1, ndev):
            cur = fly
            if t < ndev - 1:
                # next segment starts moving BEFORE this step's compute
                # consumes `cur` — independent dataflow, ICI/compute
                # overlap by construction (the spmm_dist ring2 pattern)
                fly = (jax.lax.ppermute(cur[0], axis, perm=perm),
                       jax.lax.ppermute(cur[1], axis, perm=perm))
            o_t, lse_t = kern_full(0, q, cur[0], cur[1])
            include = (_src(idx, t) < idx) if causal else None
            out, lse = _combine(out, lse, o_t.astype(jnp.float32),
                                lse_t[..., 0], include)
        return out.astype(q.dtype), lse

    @jax.custom_vjp
    def local_core(q, kT, v):
        return _fwd_ring(q, kT, v)[0]

    def core_fwd(q, kT, v):
        out, lse = _fwd_ring(q, kT, v)
        return out, (q, kT, v, out, lse)

    def core_bwd(res, g):
        """Second ring pass: every (q_i, kv_j) pair's contribution from
        the Pallas flash backward fed the GLOBAL lse/delta (exact — the
        global softmax probabilities are exp(s - lse_global)). dK^T/dV
        accumulators ride the ring with their segment and arrive home on
        the final rotation."""
        q, kT, v, out, lse = res
        idx = jax.lax.axis_index(axis)
        g_ = g.astype(jdt)
        delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)
        lse128 = jnp.broadcast_to(lse[..., None], lse.shape + (128,))
        d128 = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
        dq0, dkT0, dv0 = bwd_diag(0, q, kT, v, g_, lse128, d128)
        dq_acc = dq0.astype(jnp.float32)
        # (segment, its grad accumulators) travel together
        cur = (kT, v, dkT0.astype(jnp.float32), dv0.astype(jnp.float32))
        for t in range(1, ndev):
            cur = tuple(jax.lax.ppermute(x, axis, perm=perm) for x in cur)
            kT_t, v_t, dkT_a, dv_a = cur
            dq_t, dkT_t, dv_t = bwd_full(0, q, kT_t, v_t, g_, lse128, d128)
            if causal:
                include = _src(idx, t) < idx
                dq_t = jnp.where(include, dq_t, 0)
                dkT_t = jnp.where(include, dkT_t, 0)
                dv_t = jnp.where(include, dv_t, 0)
            dq_acc = dq_acc + dq_t.astype(jnp.float32)
            cur = (kT_t, v_t, dkT_a + dkT_t.astype(jnp.float32),
                   dv_a + dv_t.astype(jnp.float32))
        # ndev-1 rotations so far: one more brings each segment's grads
        # back to its home device
        dkT_home = jax.lax.ppermute(cur[2], axis, perm=perm)
        dv_home = jax.lax.ppermute(cur[3], axis, perm=perm)
        return (dq_acc.astype(q.dtype), dkT_home.astype(kT.dtype),
                dv_home.astype(v.dtype))

    local_core.defvjp(core_fwd, core_bwd)

    def local_fn(q, kT, v):
        return local_core(q, kT, v)

    shmapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, axis),
                  P(None, axis, None)),
        out_specs=P(None, axis, None),
        # pallas_call out_shapes carry no varying-mesh-axes annotation;
        # correctness is pinned by the full-sequence parity tests
        check_vma=False)
    fn = jax.jit(shmapped)
    shardings = {
        "q": NamedSharding(mesh, P(None, axis, None)),
        "kT": NamedSharding(mesh, P(None, None, axis)),
        "v": NamedSharding(mesh, P(None, axis, None)),
    }
    return fn, shardings


def lowered_text(mesh, axis, bh, s, hd, dtype=jnp.bfloat16,
                 causal: bool = False) -> str:
    """StableHLO of the ring program (tests assert collective-permute
    presence + payload shape — the backend-independent comm evidence)."""
    fn, sh = make_ring_attention(mesh, axis, bh, s, hd, dtype, causal)
    import numpy as np
    q = jnp.zeros((bh, s, hd), dtype)
    kT = jnp.zeros((bh, hd, s), dtype)
    v = jnp.zeros((bh, s, hd), dtype)
    args = (jax.device_put(q, sh["q"]), jax.device_put(kT, sh["kT"]),
            jax.device_put(v, sh["v"]))
    return fn.lower(*args).as_text()
