"""TPP-MLP: the flagship end-to-end model built from library primitives.

The reference ships DNN operators in the companion LIBXSMM-DNN repo
(README.md:7), whose fully-connected layers are exactly BRGEMM + fused
bias/activation TPPs. This model is that stack, TPU-native: each layer is
one fused matmul+bias+activation computation (what dispatch_brgemm_ext
builds), differentiable end-to-end, shardable over a (dp, tp) mesh.

Sharding story (pjit/GSPMD):
  * dp: batch dimension of activations.
  * tp: output-feature dimension of each weight matrix (Megatron-style
    column-parallel first layer, row-parallel second; XLA inserts the
    psum/reduce-scatter collectives from the shardings).
The train step is a plain jax.grad + SGD update, jit-able over any Mesh.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..descriptor import UnaryFlags, UnaryType
from ..ops.eltwise import apply_unary_op
from ..ops.gemm import pass_precision


@dataclasses.dataclass(frozen=True)
class MlpConfig:
    in_dim: int = 256
    hidden: Tuple[int, ...] = (512, 512)
    out_dim: int = 128
    activation: UnaryType = UnaryType.GELU
    dtype: str = "float32"


def init_params(cfg: MlpConfig, seed: int = 0) -> List[dict]:
    rng = np.random.default_rng(seed)
    dims = (cfg.in_dim, *cfg.hidden, cfg.out_dim)
    params = []
    for i in range(len(dims) - 1):
        fan_in = dims[i]
        w = rng.standard_normal((dims[i], dims[i + 1])) / np.sqrt(fan_in)
        params.append({
            "w": jnp.asarray(w, cfg.dtype),
            "b": jnp.zeros((dims[i + 1],), cfg.dtype),
        })
    return params


def forward(params: List[dict], x, cfg: MlpConfig):
    """y = MLP(x); each layer is the fused brgemm_ext pattern
    (matmul + bias-add binary postop + activation cp-unary)."""
    h = x
    for i, layer in enumerate(params):
        acc = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32,
                      precision=pass_precision(h.dtype))
        acc = acc + layer["b"][None, :]
        if i < len(params) - 1:
            acc = apply_unary_op(cfg.activation, UnaryFlags.NONE, acc)
        h = acc.astype(x.dtype)
    return h


def loss_fn(params, x, y, cfg: MlpConfig):
    pred = forward(params, x, cfg)
    return jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)


def train_step(params, x, y, cfg: MlpConfig, lr: float = 1e-3):
    loss, grads = jax.value_and_grad(loss_fn)(params, x, y, cfg)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def shard_params(params, mesh: Mesh):
    """Megatron-style alternating column/row parallel weight shardings."""
    out = []
    for i, layer in enumerate(params):
        if i % 2 == 0:   # column-parallel: shard output features
            wspec, bspec = P(None, "tp"), P("tp")
        else:            # row-parallel: shard input features
            wspec, bspec = P("tp", None), P(None)
        out.append({
            "w": jax.device_put(layer["w"], NamedSharding(mesh, wspec)),
            "b": jax.device_put(layer["b"], NamedSharding(mesh, bspec)),
        })
    return out


# ---------------------------------------------------------------------------
# splitSGD: bf16 master-weight training without f32 storage
# (the reference's equation_splitSGD.c use case: the f32 weight is held as
# two bf16 halves — the RNE high part and the residual low part — updated
# in f32 and re-split; combine/split use integer bit ops because XLA on
# TPU elides x - bf16(x) arithmetic, see ops/eltwise.py)
# ---------------------------------------------------------------------------


def split_f32(w):
    """f32 -> (hi, lo) bf16 pair with hi + lo == w up to 2^-16 rel."""
    from ..ops.eltwise import _trunc_f32_to_bf16_f32

    hf = _trunc_f32_to_bf16_f32(w.astype(jnp.float32))
    return hf.astype(jnp.bfloat16), (w - hf).astype(jnp.bfloat16)


def combine_f32(hi, lo):
    return hi.astype(jnp.float32) + lo.astype(jnp.float32)


def split_sgd_update(hi, lo, grad, lr: float):
    """One splitSGD step: recombine, update in f32, re-split."""
    w = combine_f32(hi, lo) - lr * grad.astype(jnp.float32)
    return split_f32(w)


def split_params(params):
    return [
        {"w": split_f32(l["w"].astype(jnp.float32)),
         "b": split_f32(l["b"].astype(jnp.float32))}
        for l in params
    ]


def split_sgd_train_step(split_ps, x, y, cfg: MlpConfig, lr: float = 1e-3):
    """Train step over split-precision parameters: forward/backward run in
    bf16 (the hi halves), the update maintains f32 effective precision."""
    hi_params = [{"w": l["w"][0], "b": l["b"][0]} for l in split_ps]
    loss, grads = jax.value_and_grad(loss_fn)(hi_params, x, y, cfg)
    new_ps = []
    for l, g in zip(split_ps, grads):
        new_ps.append({
            "w": split_sgd_update(*l["w"], g["w"], lr),
            "b": split_sgd_update(*l["b"], g["b"], lr),
        })
    return new_ps, loss


def make_sharded_train_step(cfg: MlpConfig, mesh: Mesh, lr: float = 1e-3):
    """jit the FULL train step over a (dp, tp) mesh; activations are
    batch-sharded over dp, weights feature-sharded over tp."""
    xsharding = NamedSharding(mesh, P("dp", None))

    @jax.jit
    def step(params, x, y):
        return train_step(params, x, y, cfg, lr)

    return step, xsharding
