"""Fused scaled-dot-product attention: dispatch front-end.

The attention composition is the library's flagship fused workload
(models/tpp_attention.py; the TPP paper's BERT case, arXiv:2104.05755
linked from the reference README.md:5). Like every other op family, it is
descriptor-keyed through the registry: dispatch once, invoke many.

Two lowerings:
  * Pallas fused kernels (kernels/attention_pallas.py, v2 online-softmax)
    — the (s, s) score and prob panels never leave VMEM; any s % 128 == 0
    within HBM limits, hd % 8 == 0 <= 256, f32/bf16. Optional fused
    additive bias, probability dropout (position-hash mask, replayed
    bit-exactly in the backward), causal masking with whole-block skip.
  * XLA fallback — the same math as jnp ops for shapes outside the
    envelope (and the CPU oracle). The fallback evaluates the SAME
    position-hash dropout mask, so fused and fallback agree bit-for-bit
    on which probabilities drop.

Differentiable: jax.custom_vjp. On the fused path the backward is the
two-kernel Pallas flash backward (probs recomputed from the saved LSE —
the standard flash recompute trade: the forward never stored them); on
the fallback path the same analytic gradient evaluated by XLA.
Gradients match the naive composition to f32 tolerance.

Bias gradients: exact for bias.shape[0] == bh when the kernel is built
with bias_requires_grad=True (the dkv kernel emits ds blocks directly);
for a broadcast (1, s, s) bias the fused path cannot reduce across the
batch grid race-free, so bias_requires_grad=True routes to the XLA
composition for correctness. With bias_requires_grad=False (default) the
bias cotangent is zero — documented, not silent: dispatch refuses the
flag combination it cannot honor.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import Datatype, to_jnp
from ..registry import Kernel, KernelInfo, get_registry
from .gemm import pass_precision


def _apply_mask_bias(scores, s, causal, bias):
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        scores = jnp.where((col <= row)[None], scores,
                           jnp.finfo(jnp.float32).min)
    return scores


def _hash_keep(bh, s, seed, thr):
    """The kernel's position-hash dropout mask, evaluated by XLA: keep
    iff hash(seed, b, row, col) >= thr (kernels/attention_pallas._rand_bits
    — shared code, shared bits)."""
    from ..kernels.attention_pallas import _rand_bits
    row = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
    b = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
    seed = jnp.asarray(seed, jnp.int32)
    return _rand_bits(seed, b, row, col) >= thr


def _naive(q, kT, v, scale, causal, bias=None, dropout_p=0.0, seed=None):
    """XLA reference composition: q(bh,s,hd) @ kT(bh,hd,s), +bias, mask,
    softmax, dropout, @ v — semantically identical to the fused kernel
    (including the dropout mask bits)."""
    bh, s = q.shape[0], q.shape[1]
    prec = pass_precision(q.dtype)
    scores = jnp.einsum("bqd,bdk->bqk", q, kT,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = _apply_mask_bias(scores, s, causal, bias)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_p > 0.0:
        from ..kernels.attention_pallas import _dropout_threshold
        keep = _hash_keep(bh, s, seed, _dropout_threshold(dropout_p))
        probs = jnp.where(keep, probs * (1.0 / (1.0 - dropout_p)), 0.0)
    return jnp.einsum("bqk,bkd->bqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(q.dtype)


def _naive_probs(q, kT, v, scale, causal, bias=None):
    s = q.shape[1]
    prec = pass_precision(q.dtype)
    scores = jnp.einsum("bqd,bdk->bqk", q, kT,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = _apply_mask_bias(scores, s, causal, bias)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _build_attention(desc) -> Kernel:
    (_, bh, s, hd, a_dt, causal, scale, dropout_p, bias_bh,
     bias_requires_grad) = desc
    dtype = to_jnp(a_dt)
    sc = float(scale) if scale is not None else float(hd) ** -0.5
    has_bias = bias_bh > 0
    has_seed = dropout_p > 0.0

    from ..kernels import attention_pallas as ap

    use_fused = ap.supported(s, hd, dtype) and not (
        bias_requires_grad and bias_bh == 1)
    if use_fused:
        kw = dict(causal=causal, scale=sc, bias_bh=bias_bh,
                  dropout_p=dropout_p)
        fwd_plain = ap.build_flash_attention(bh, s, hd, dtype,
                                             return_lse=False, **kw)
        fwd_lse = ap.build_flash_attention(bh, s, hd, dtype,
                                           return_lse=True, **kw)
        bwd_fn = ap.build_flash_attention_bwd(
            bh, s, hd, dtype, bias_grad=bias_requires_grad and has_bias,
            **kw)
        is_ref = False
    else:
        fwd_plain = fwd_lse = bwd_fn = None
        is_ref = True

    nargs = 3 + int(has_bias) + int(has_seed)

    def split(args):
        q, kT, v = args[:3]
        idx = 3
        bias = None
        if has_bias:
            bias = args[idx]
            idx += 1
        seed = args[idx] if has_seed else 0
        return q, kT, v, bias, seed

    @jax.custom_vjp
    def core(*args):
        q, kT, v, bias, seed = split(args)
        if fwd_plain is not None:
            return fwd_plain(seed, q, kT, v, bias)
        return _naive(q, kT, v, sc, causal, bias, dropout_p, seed)

    def core_fwd(*args):
        q, kT, v, bias, seed = split(args)
        if fwd_lse is not None:
            out, lse = fwd_lse(seed, q, kT, v, bias)
            return out, (q, kT, v, bias, seed, out, lse)
        out = _naive(q, kT, v, sc, causal, bias, dropout_p, seed)
        return out, (q, kT, v, bias, seed, out, None)

    def _zero_tangents(bias, dbias):
        tail = ()
        if has_bias:
            tail += ((dbias if dbias is not None
                      else jnp.zeros_like(bias)),)
        if has_seed:
            tail += (np.zeros((), jax.dtypes.float0),)
        return tail

    def core_bwd(res, g):
        q, kT, v, bias, seed, out, lse = res
        if bwd_fn is not None:
            # delta = rowsum(dout * out): the standard flash identity
            # (survives dropout — see kernels/attention_pallas.py).
            # Lane-broadcast to the kernels' (bh, s, 128) stat layout.
            delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                            axis=-1)
            delta = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
            outs = bwd_fn(seed, q, kT, v, g.astype(dtype), lse, delta, bias)
            if bias_requires_grad and has_bias:
                dq, dkT, dv, dbias = outs
                dbias = dbias.astype(bias.dtype)
            else:
                (dq, dkT, dv), dbias = outs, None
            return (dq, dkT, dv) + _zero_tangents(bias, dbias)
        # XLA analytic backward, probs recomputed
        prec = pass_precision(q.dtype)
        probs = _naive_probs(q, kT, v, sc, causal, bias)   # (bh, s, s) f32
        gf = g.astype(jnp.float32)
        if dropout_p > 0.0:
            from ..kernels.attention_pallas import _dropout_threshold
            keep = _hash_keep(bh, s, seed, _dropout_threshold(dropout_p))
            r = 1.0 / (1.0 - dropout_p)
            probs_d = jnp.where(keep, probs * r, 0.0)
        else:
            keep, probs_d = None, probs
        dv = jnp.einsum("bqk,bqd->bkd", probs_d, gf, precision=prec)
        dp = jnp.einsum("bqd,bkd->bqk", gf, v.astype(jnp.float32),
                        precision=prec)
        if keep is not None:
            dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_p)), 0.0)
        delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1,
                        keepdims=True)
        ds = probs * (dp - delta)
        dq = jnp.einsum("bqk,bdk->bqd", ds, kT.astype(jnp.float32),
                        precision=prec) * sc
        dkT = jnp.einsum("bqd,bqk->bdk", q.astype(jnp.float32), ds,
                         precision=prec) * sc
        dbias = None
        if has_bias and bias_requires_grad:
            dbias = (ds if bias_bh == bh
                     else jnp.sum(ds, axis=0, keepdims=True))
            dbias = dbias.astype(bias.dtype)
        return (dq.astype(q.dtype), dkT.astype(kT.dtype),
                dv.astype(v.dtype)) + _zero_tangents(bias, dbias)

    core.defvjp(core_fwd, core_bwd)

    def attn(q, kT, v, bias=None, seed=None):
        args = [q, kT, v]
        if has_bias:
            if bias is None:
                raise ValueError("this attention kernel was dispatched "
                                 "with a bias operand; pass bias=")
            args.append(bias)
        elif bias is not None:
            raise ValueError("bias passed but kernel dispatched without "
                             "bias_bh; re-dispatch with bias_bh set")
        if has_seed:
            if seed is None:
                raise ValueError("dropout_p > 0 requires seed=")
            args.append(jnp.asarray(seed, jnp.int32))
        return core(*args)

    fn = jax.jit(attn, static_argnames=())
    # two (s,s,hd) matmuls; causal masking halves the useful work
    # (exactly s*(s+1)/2 live score pairs per triangle) — the reference
    # accounts masked GEMM work the same way (advisor r3)
    nflops = (2 * bh * s * (s + 1) * hd if causal
              else 4 * bh * s * s * hd)
    info = KernelInfo(kind="flash_attention", nflops=nflops,
                      is_reference_kernel=is_ref)
    name = (f"flash_attn_{bh}x{s}x{hd}_{a_dt.name.lower()}"
            f"{'_causal' if causal else ''}"
            f"{'_drop' if has_seed else ''}{'_bias' if has_bias else ''}")
    kern = Kernel(fn=fn, descriptor=desc, info=info, name=name)
    return kern


def dispatch_flash_attention(bh: int, s: int, hd: int,
                             dtype: Datatype = Datatype.F32,
                             causal: bool = False,
                             scale: Optional[float] = None,
                             dropout_p: float = 0.0,
                             bias_bh: int = 0,
                             bias_requires_grad: bool = False) -> Kernel:
    """Fused attention kernel: kernel(q, kT, v[, bias=][, seed=]) -> out.

    q, v: (bh, s, hd); kT: (bh, hd, s) — K pre-transposed so both MXU
    passes run in natural orientation (fold the transpose into the K
    projection's output layout). bias: (bias_bh, s, s) additive attention
    bias with bias_bh in {0 (none), 1 (broadcast), bh}. dropout_p drops
    attention probabilities (inverted scale); requires seed= at call time
    and replays the identical mask in the backward. Returns (bh, s, hd)
    in the input dtype. Differentiable (custom VJP; on the fused path the
    backward is the two-kernel Pallas flash backward).

    bias_requires_grad=True propagates exact bias gradients: direct for
    bias_bh == bh; for bias_bh == 1 the fused path cannot reduce the
    batch axis race-free, so the kernel transparently uses the XLA
    composition (correct, unfused). Default False returns a ZERO bias
    cotangent (bias treated as a constant — the alibi/padding-mask case).
    """
    if bh <= 0 or s <= 0 or hd <= 0:
        raise ValueError(f"bad attention shape bh={bh} s={s} hd={hd}")
    if bias_bh not in (0, 1, bh):
        raise ValueError(f"bias_bh must be 0, 1 or bh={bh}; got {bias_bh}")
    if not 0.0 <= dropout_p < 1.0:
        raise ValueError(f"dropout_p must be in [0, 1), got {dropout_p}")
    dtype = Datatype(dtype)
    if dtype not in (Datatype.F32, Datatype.BF16, Datatype.F16,
                     Datatype.F64):
        raise ValueError(f"unsupported attention dtype {dtype}")
    desc = ("flash_attn", bh, s, hd, dtype, bool(causal),
            None if scale is None else float(scale), float(dropout_p),
            int(bias_bh), bool(bias_requires_grad))
    return get_registry().dispatch(desc, _build_attention)
