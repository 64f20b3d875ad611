"""TPP-Attention: a transformer encoder block built from library primitives.

The TPP paper (arXiv:2104.05755, linked from the reference's README.md:5)
demonstrates BERT attention as the flagship composition of TPPs: every
building block — QKV projections, score/context batched GEMMs, softmax,
bias+GELU, layernorm, dropout — is one of the primitives this library
dispatches (fused brgemm_ext, the equation_softmax.c tree
`DIV(EXP(SUB(x, rowmax)), rowsum)`, the equation_layernorm.c tree
`ADD(MUL(MUL(SUB(x, mean), rstd), gamma), beta)`, the Pallas dropout
kernel of generator_mateltwise_*_avx512.c's dropout path). The reference
itself ships the kernels and leaves the model to LIBXSMM-DNN
(README.md:7); this module is that composition, TPU-native:

  * All matmuls run bf16/f32 on the MXU with f32 accumulation
    (preferred_element_type + the library's precision policy) — the score
    and context products are batch-reduce GEMMs over (batch*heads).
  * Softmax/layernorm are written exactly as their equation-tree shapes so
    XLA fuses them into the surrounding GEMM epilogues (what dispatch_meqn
    builds for the standalone 2-D case).
  * Sharding (pjit/GSPMD): dp = batch; tp = heads for attention weights
    (Megatron-style: QKV column-parallel over heads, output projection
    row-parallel) and column/row-parallel for the FFN pair. XLA inserts
    the psum collectives from the shardings; per-device compute never
    materializes a gathered weight.

Differentiable end-to-end: train_step = jax.value_and_grad + SGD, jit-able
over any Mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..descriptor import UnaryFlags, UnaryType
from ..ops.eltwise import apply_unary_op
from ..ops.gemm import pass_precision


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    dim: int = 256            # model width
    heads: int = 8            # attention heads (tp shards this axis)
    ffn_mult: int = 4         # FFN hidden = ffn_mult * dim
    dropout_p: float = 0.0    # attention+FFN dropout (0 disables)
    dtype: str = "float32"    # activation/weight storage dtype
    flash: bool = False       # fused Pallas attention (scores stay in VMEM;
                              # incompatible with attention-prob dropout)
    causal: bool = False      # autoregressive masking

    @property
    def head_dim(self) -> int:
        assert self.dim % self.heads == 0
        return self.dim // self.heads


def init_params(cfg: AttentionConfig, seed: int = 0) -> dict:
    """One encoder block: fused QKV, output proj, 2-layer FFN, 2 layernorms.

    wqkv columns are laid out (heads, 3, head_dim) — head-MAJOR (the
    Megatron convention), so the tp sharding P(None, 'tp') splits on head
    boundaries whenever tp divides heads and the QKV activation never
    needs a reshard (advisor r3: the previous (3, heads, head_dim) order
    made tp shards cross q/k/v boundaries unless tp divided 3)."""
    rng = np.random.default_rng(seed)
    d, h = cfg.dim, cfg.ffn_mult * cfg.dim

    def mat(fan_in, *shape):
        return jnp.asarray(rng.standard_normal(shape) / np.sqrt(fan_in),
                           cfg.dtype)

    return {
        "wqkv": mat(d, d, 3 * d), "bqkv": jnp.zeros((3 * d,), cfg.dtype),
        "wo": mat(d, d, d), "bo": jnp.zeros((d,), cfg.dtype),
        "w1": mat(d, d, h), "b1": jnp.zeros((h,), cfg.dtype),
        "w2": mat(h, h, d), "b2": jnp.zeros((d,), cfg.dtype),
        "ln1_g": jnp.ones((d,), cfg.dtype), "ln1_b": jnp.zeros((d,), cfg.dtype),
        "ln2_g": jnp.ones((d,), cfg.dtype), "ln2_b": jnp.zeros((d,), cfg.dtype),
    }


def _softmax_rows(s):
    """The equation_softmax.c tree: DIV(EXP(SUB(x, rowmax)), rowsum),
    reductions in f32 (the equation engine's default comp dtype)."""
    s = s.astype(jnp.float32)
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _layernorm(x, gamma, beta, eps: float = 1e-5):
    """The equation_layernorm.c tree: (x - mean) * rstd * gamma + beta with
    mean/rstd as REDUCE nodes; stats in f32 regardless of storage dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32)
    return y.astype(x.dtype)


def _dropout(x, p: float, seed):
    """Inverted-scale dropout through the library's Pallas PRNG kernel
    (kernels/eltwise_pallas.dropout). The kernel's own output IS the
    forward value (it already applies the 1/(1-p) rescale); the backward
    replays the saved keep-mask — the reference's DROPOUT / DROPOUT_INV
    pairing (ops/eltwise.py). Advisor r3: the previous version discarded
    the kernel output and recomputed flat*mask*scale, pure waste on the
    training hot path."""
    if p <= 0.0:
        return x
    from ..kernels.eltwise_pallas import dropout as _drop

    scale = 1.0 / (1.0 - p)

    @jax.custom_vjp
    def drop(flat):
        out, _ = _drop(flat, seed, p)
        return out.astype(flat.dtype)

    def drop_fwd(flat):
        out, mask = _drop(flat, seed, p)
        return out.astype(flat.dtype), mask

    def drop_bwd(mask, g):
        gi = jnp.where(mask != 0, g.astype(jnp.float32) * scale, 0.0)
        return (gi.astype(g.dtype),)

    drop.defvjp(drop_fwd, drop_bwd)
    return drop(x.reshape(-1, x.shape[-1])).reshape(x.shape).astype(x.dtype)


def _linear(x, w, b):
    """The fused brgemm_ext pattern: matmul + bias binary postop, f32 acc."""
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32,
                  precision=pass_precision(x.dtype))
    return acc + b.astype(jnp.float32)[None, :]


def attention(params: dict, x, cfg: AttentionConfig, seed=None):
    """Multi-head self-attention over x: (batch, seq, dim)."""
    b, s, d = x.shape
    hd, nh = cfg.head_dim, cfg.heads

    qkv = _linear(x.reshape(b * s, d), params["wqkv"], params["bqkv"])
    # head-major fused-QKV column layout (nh, 3, hd): see init_params
    qkv = qkv.astype(x.dtype).reshape(b, s, nh, 3, hd)
    q, k, v = (qkv[:, :, :, 0], qkv[:, :, :, 1],
               qkv[:, :, :, 2])                          # (b, s, nh, hd)

    if cfg.flash:
        # fused Pallas kernel: the (s, s) score/prob panels stay in VMEM;
        # attention-prob dropout fuses too (v2 position-hash mask, no
        # materialized probs needed — the r3 "no dropout under flash"
        # restriction is gone). seed=None (eval) dispatches the p=0 kernel.
        from ..ops.attention import dispatch_flash_attention
        from ..dtypes import from_jnp

        p_drop = cfg.dropout_p if seed is not None else 0.0
        kern = dispatch_flash_attention(b * nh, s, hd,
                                        from_jnp(jnp.dtype(x.dtype)),
                                        causal=cfg.causal,
                                        dropout_p=p_drop)
        qb = q.transpose(0, 2, 1, 3).reshape(b * nh, s, hd)
        kTb = k.transpose(0, 2, 3, 1).reshape(b * nh, hd, s)
        vb = v.transpose(0, 2, 1, 3).reshape(b * nh, s, hd)
        # seed + 2: decorrelated from the FFN/prob _dropout streams
        ctxb = (kern(qb, kTb, vb, seed=seed + 2) if p_drop > 0.0
                else kern(qb, kTb, vb))
        ctx = ctxb.reshape(b, nh, s, hd).transpose(0, 2, 1, 3)
    else:
        # score BRGEMM: batched (s, hd) x (hd, s) per (b, head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32,
                            precision=pass_precision(x.dtype))
        if cfg.causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            scores = jnp.where((col <= row)[None, None], scores,
                               jnp.finfo(jnp.float32).min)
        probs = _softmax_rows(scores * (1.0 / np.sqrt(hd))).astype(x.dtype)
        if cfg.dropout_p > 0.0 and seed is not None:
            probs = _dropout(probs, cfg.dropout_p, seed)

        # context BRGEMM: (s, s) x (s, hd) per (b, head)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32,
                         precision=pass_precision(x.dtype)).astype(x.dtype)
    out = _linear(ctx.reshape(b * s, d), params["wo"], params["bo"])
    return out.astype(x.dtype).reshape(b, s, d)


def forward(params: dict, x, cfg: AttentionConfig, seed=None):
    """Pre-LN encoder block: x + MHA(LN(x)); then x + FFN(LN(x))."""
    b, s, d = x.shape
    h = x + attention(params, _layernorm(x, params["ln1_g"], params["ln1_b"]),
                      cfg, seed=seed)
    y = _layernorm(h, params["ln2_g"], params["ln2_b"])
    y = _linear(y.reshape(b * s, d), params["w1"], params["b1"])
    y = apply_unary_op(UnaryType.GELU, UnaryFlags.NONE, y)
    if cfg.dropout_p > 0.0 and seed is not None:
        y = _dropout(y.astype(x.dtype), cfg.dropout_p, seed + 1)
    y = _linear(y.astype(x.dtype), params["w2"], params["b2"])
    return h + y.astype(x.dtype).reshape(b, s, d)


def loss_fn(params, x, y, cfg: AttentionConfig, seed=None):
    pred = forward(params, x, cfg, seed=seed)
    return jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)


def train_step(params, x, y, cfg: AttentionConfig, lr: float = 1e-3,
               seed=None):
    if cfg.dropout_p > 0.0 and seed is None:
        # training with dropout configured but no seed would silently run
        # WITHOUT dropout (seed=None short-circuits _dropout) — refuse
        # rather than mis-train (advisor r3; eval goes through forward/
        # loss_fn directly, where seed=None means inference-mode)
        raise ValueError("cfg.dropout_p > 0 requires a seed in train_step")
    loss, grads = jax.value_and_grad(loss_fn)(params, x, y, cfg, seed)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


# ---------------------------------------------------------------------------
# sharding: dp = batch, tp = heads (attention) / hidden features (FFN)
# ---------------------------------------------------------------------------

_PARAM_SPECS = {
    # QKV column-parallel: output features group by head -> shard over tp.
    "wqkv": P(None, "tp"), "bqkv": P("tp"),
    # output projection row-parallel: input features are head-sharded;
    # XLA psums the partial (b*s, d) products.
    "wo": P("tp", None), "bo": P(None),
    "w1": P(None, "tp"), "b1": P("tp"),
    "w2": P("tp", None), "b2": P(None),
    "ln1_g": P(None), "ln1_b": P(None),
    "ln2_g": P(None), "ln2_b": P(None),
}


def shard_params(params: dict, mesh: Mesh) -> dict:
    return {k: jax.device_put(v, NamedSharding(mesh, _PARAM_SPECS[k]))
            for k, v in params.items()}


def make_sharded_train_step(cfg: AttentionConfig, mesh: Mesh,
                            lr: float = 1e-3, seed=None):
    """jit the FULL train step over a (dp, tp) mesh. Activations are
    batch-sharded; the head axis of the fused-QKV output shards over tp via
    the weight shardings (GSPMD propagates them through the reshapes).

    `seed` feeds the dropout PRNG when cfg.dropout_p > 0 (required then:
    a dropout config without a seed raises instead of silently training
    without dropout — advisor r3)."""
    if cfg.dropout_p > 0.0 and seed is None:
        raise ValueError("cfg.dropout_p > 0 requires seed= in "
                         "make_sharded_train_step")
    xsharding = NamedSharding(mesh, P("dp", None, None))

    @jax.jit
    def step(params, x, y):
        return train_step(params, x, y, cfg, lr, seed=seed)

    return step, xsharding
