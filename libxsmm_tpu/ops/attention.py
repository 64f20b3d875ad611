"""Fused scaled-dot-product attention: dispatch front-end.

The attention composition is the library's flagship fused workload
(models/tpp_attention.py; the TPP paper's BERT case, arXiv:2104.05755
linked from the reference README.md:5). Like every other op family, it is
descriptor-keyed through the registry: dispatch once, invoke many.

Two lowerings:
  * Pallas fused kernel (kernels/attention_pallas.py) — the (s, s) score
    and prob panels never leave VMEM; K^T/V sequence-resident per
    (batch, head) grid row. Serves s % 128 == 0, hd % 8 == 0, s <= 4096,
    f32/bf16.
  * XLA fallback — the same math as three jnp ops for shapes outside the
    envelope (and the CPU oracle; the kernel's interpret mode covers
    no-hardware tests).

Differentiable: the forward is wrapped in jax.custom_vjp whose backward
is the analytic attention gradient evaluated by XLA (probs recomputed —
the standard flash-attention recompute trade: the forward never stored
them). Gradients match the naive composition to f32 tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import device
from ..dtypes import Datatype, to_jnp
from ..registry import Kernel, KernelInfo, get_registry
from .gemm import pass_precision


def _naive(q, kT, v, scale, causal):
    """XLA reference composition: q(bh,s,hd) @ kT(bh,hd,s), softmax, @ v."""
    s = q.shape[1]
    prec = pass_precision(q.dtype)
    scores = jnp.einsum("bqd,bdk->bqk", q, kT,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        scores = jnp.where((col <= row)[None], scores,
                           jnp.finfo(jnp.float32).min)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(q.dtype)


def _recompute_probs(q, kT, v, scale, causal):
    s = q.shape[1]
    prec = pass_precision(q.dtype)
    scores = jnp.einsum("bqd,bdk->bqk", q, kT,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        scores = jnp.where((col <= row)[None], scores,
                           jnp.finfo(jnp.float32).min)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _build_attention(desc) -> Kernel:
    _, bh, s, hd, a_dt, causal, scale = desc
    dtype = to_jnp(a_dt)
    sc = float(scale) if scale is not None else float(hd) ** -0.5

    from ..kernels import attention_pallas as ap

    if ap.supported(s, hd, dtype):
        fused = ap.build_flash_attention(bh, s, hd, dtype, causal=causal,
                                         scale=sc)
        is_ref = False
    else:
        fused = None
        is_ref = True

    @jax.custom_vjp
    def attn(q, kT, v):
        if fused is not None:
            return fused(q, kT, v)
        return _naive(q, kT, v, sc, causal)

    def attn_fwd(q, kT, v):
        return attn(q, kT, v), (q, kT, v)

    def attn_bwd(res, g):
        # analytic attention backward with probs recomputed (the flash
        # recompute trade); evaluated by XLA in f32
        q, kT, v = res
        prec = pass_precision(q.dtype)
        probs = _recompute_probs(q, kT, v, sc, causal)      # (bh, s, s) f32
        gf = g.astype(jnp.float32)
        dv = jnp.einsum("bqk,bqd->bkd", probs, gf, precision=prec)
        dp = jnp.einsum("bqd,bkd->bqk", gf, v.astype(jnp.float32),
                        precision=prec)
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dq = jnp.einsum("bqk,bdk->bqd", ds, kT.astype(jnp.float32),
                        precision=prec) * sc
        dkT = jnp.einsum("bqd,bqk->bdk", q.astype(jnp.float32), ds,
                         precision=prec) * sc
        return (dq.astype(q.dtype), dkT.astype(kT.dtype),
                dv.astype(v.dtype))

    attn.defvjp(attn_fwd, attn_bwd)

    fn = jax.jit(attn)
    nflops = 4 * bh * s * s * hd          # two (s,s,hd) matmuls
    info = KernelInfo(kind="flash_attention", nflops=nflops,
                      is_reference_kernel=is_ref)
    return Kernel(fn=fn, descriptor=desc, info=info,
                  name=f"flash_attn_{bh}x{s}x{hd}_{a_dt.name.lower()}"
                       f"{'_causal' if causal else ''}")


def dispatch_flash_attention(bh: int, s: int, hd: int,
                             dtype: Datatype = Datatype.F32,
                             causal: bool = False,
                             scale: Optional[float] = None) -> Kernel:
    """Fused attention kernel: kernel(q, kT, v) -> out.

    q, v: (bh, s, hd); kT: (bh, hd, s) — K pre-transposed so both MXU
    passes run in natural orientation (fold the transpose into the K
    projection's output layout). Returns (bh, s, hd) in the input dtype.
    Differentiable (custom VJP, probs recomputed in the backward).
    """
    if bh <= 0 or s <= 0 or hd <= 0:
        raise ValueError(f"bad attention shape bh={bh} s={s} hd={hd}")
    dtype = Datatype(dtype)
    if dtype not in (Datatype.F32, Datatype.BF16, Datatype.F16, Datatype.F64):
        raise ValueError(f"unsupported attention dtype {dtype}")
    desc = ("flash_attn", bh, s, hd, dtype,
            bool(causal), None if scale is None else float(scale))
    return get_registry().dispatch(desc, _build_attention)
