"""TPP-CNN: convolution as the library's own batch-reduce GEMM.

Third model family. The companion LIBXSMM-DNN repo (reference README.md:7)
lowers convolution to BRGEMM over the R*S filter taps — the TPP paper's
(arXiv:2104.05755, linked reference README.md:5) flagship formulation:

    conv(x, w)[n,p,q,k] = sum_{r,s} Apatch_{r,s} @ w[r,s]
    Apatch_{r,s} = x[n, p*stride+r, q*stride+s, :]          (N*P*Q, C)

i.e. a stride-mode batch-reduce GEMM with br = R*S, m = N*P*Q, k = C,
n = K — exactly the contract of ``dispatch_brgemm`` / the reference's
``libxsmm_dispatch_brgemm`` with stride addressing, and the fused
bias+activation epilogue is ``dispatch_brgemm_ext`` (the reference's fused
AMX conv microkernels, generator_gemm_amx_microkernel.c fused paths).

Two paths, value-identical:
  * :func:`conv2d_tpp` — the differentiable formulation (same contraction
    written in jnp so jax.grad works through the train step);
  * :func:`conv2d_kernel` — the dispatched library kernel (BRGEMM-ext with
    fused bias/relu), the inference/serving hot path.

TPU mapping: the tap stack keeps every MXU pass (N*P*Q, C)x(C, K) — large
m, contiguous lanes over K; XLA folds the strided tap slices into the
operand windows (no im2col materialization in HBM).

Sharding: dp over the batch axis; the train step jits over any Mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gemm import pass_precision


@dataclasses.dataclass(frozen=True)
class CnnConfig:
    height: int = 16
    width: int = 16
    channels: int = 8
    filters: Tuple[Tuple[int, int], ...] = ((3, 16), (3, 32))  # (R==S, K)
    strides: Tuple[int, ...] = (1, 2)
    classes: int = 10
    dtype: str = "float32"


def _tap_stack(x, R: int, S: int, stride: int):
    """(br=R*S, N*P*Q, C) stack of strided tap views (VALID padding).

    Each tap is a strided slice — XLA keeps these as windowed reads of x,
    the no-materialization property the reference gets from strided BRGEMM
    operand addressing (libxsmm_gemm_batch_reduce_config.br_stride)."""
    n, h, w, c = x.shape
    p = (h - R) // stride + 1
    q = (w - S) // stride + 1
    taps = []
    for r in range(R):
        for s in range(S):
            v = jax.lax.slice(x, (0, r, s, 0),
                              (n, r + (p - 1) * stride + 1,
                               s + (q - 1) * stride + 1, c),
                              (1, stride, stride, 1))
            taps.append(v.reshape(n * p * q, c))
    return jnp.stack(taps), (n, p, q)


def conv2d_tpp(x, w, b=None, stride: int = 1,
               activation: Optional[str] = None):
    """NHWC x RSCK VALID conv as the BRGEMM contraction (differentiable).

    Same math as kernel(a_stack, w_stack) for the STRIDE-mode BRGEMM
    descriptor; bias-add and relu mirror the brgemm_ext epilogue order
    (postops then cp-unary on the f32 accumulator)."""
    R, S, C, K = w.shape
    a_stack, (n, p, q) = _tap_stack(x, R, S, stride)
    acc = jnp.einsum("tmc,tck->mk", a_stack.astype(x.dtype),
                     w.reshape(R * S, C, K).astype(x.dtype),
                     preferred_element_type=jnp.float32,
                     precision=pass_precision(x.dtype))
    if b is not None:
        acc = acc + b[None, :].astype(jnp.float32)
    if activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    return acc.reshape(n, p, q, K).astype(x.dtype)


def conv2d_kernel(x_shape: Tuple[int, int, int, int], w_shape, stride=1,
                  fused_bias: bool = False, relu: bool = False,
                  dtype=np.float32):
    """Dispatch the library BRGEMM(-ext) kernel for this conv geometry.

    Returns fn(x, w[, bias]) -> NHWC output. The heavy lifting is ONE
    registry-cached kernel call: kernel(a_stack, w_stack[, bias2d]) with
    the fused bias-ADD postop + relu cp-unary epilogue when requested
    (reference: libxsmm_dispatch_brgemm_ext fused conv epilogues)."""
    from ..descriptor import (BatchReduceConfig, BatchReduceType,
                              BinaryPostops, BinaryType, GemmFlags,
                              GemmShape, UnaryArgops, UnaryType)
    from ..dtypes import from_jnp
    from ..ops.gemm import dispatch_brgemm, dispatch_brgemm_ext

    n, h, wid, c = x_shape
    R, S, C, K = w_shape
    assert c == C
    p = (h - R) // stride + 1
    q = (wid - S) // stride + 1
    m = n * p * q
    dt = from_jnp(jnp.dtype(dtype))
    shape = GemmShape(m, K, C, a_in_type=dt, b_in_type=dt, out_type=dt)
    br = BatchReduceConfig(BatchReduceType.STRIDE, br_count_hint=R * S)
    if fused_bias or relu:
        kern = dispatch_brgemm_ext(
            shape, GemmFlags.BETA_0, br,
            argops=UnaryArgops(cp_type=UnaryType.RELU) if relu
            else UnaryArgops(),
            postops=BinaryPostops(d_type=BinaryType.ADD) if fused_bias
            else BinaryPostops())
    else:
        kern = dispatch_brgemm(shape, GemmFlags.BETA_0, br)

    if fused_bias:
        @jax.jit
        def fn(x, w, bias):
            # jit end-to-end so the R*S tap slices fold into the BRGEMM
            # operand windows instead of materializing the im2col stack
            # in HBM between two launches
            a_stack, (nn, pp, qq) = _tap_stack(x, R, S, stride)
            # (1, K) bias rides the postop's jnp broadcast (the reference's
            # bcast-row colbias add) — a full (m, K) operand would stream
            # m*K*4 redundant bytes from HBM per call
            out = kern(a_stack, w.reshape(R * S, C, K),
                       bias[None, :].astype(dtype))
            return out.reshape(nn, pp, qq, K)
    else:
        @jax.jit
        def fn(x, w, bias=None):
            if bias is not None:
                raise ValueError("bias needs fused_bias=True at dispatch")
            a_stack, (nn, pp, qq) = _tap_stack(x, R, S, stride)
            out = kern(a_stack, w.reshape(R * S, C, K))
            return out.reshape(nn, pp, qq, K)

    fn.kernel = kern
    return fn


# ---------------------------------------------------------------------------
# the model: conv stack -> global average pool -> linear classifier
# ---------------------------------------------------------------------------

def init_params(cfg: CnnConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    params = []
    c = cfg.channels
    h = cfg.height
    for (r, k), stride in zip(cfg.filters, cfg.strides):
        w = rng.standard_normal((r, r, c, k)) / np.sqrt(r * r * c)
        params.append({"w": jnp.asarray(w, cfg.dtype),
                       "b": jnp.zeros((k,), cfg.dtype)})
        c = k
        h = (h - r) // stride + 1
    wd = rng.standard_normal((c, cfg.classes)) / np.sqrt(c)
    params.append({"w": jnp.asarray(wd, cfg.dtype),
                   "b": jnp.zeros((cfg.classes,), cfg.dtype)})
    return params


def forward(params, x, cfg: CnnConfig):
    h = x
    for layer, stride in zip(params[:-1], cfg.strides):
        h = conv2d_tpp(h, layer["w"], layer["b"], stride=stride,
                       activation="relu")
    h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))     # global avg pool
    head = params[-1]
    logits = jnp.dot(h, head["w"].astype(jnp.float32),
                     precision=pass_precision(jnp.float32)) \
        + head["b"][None, :].astype(jnp.float32)
    return logits


def loss_fn(params, x, labels, cfg: CnnConfig):
    logits = forward(params, x, cfg)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - ll)                           # softmax CE


def train_step(params, x, labels, cfg: CnnConfig, lr: float = 1e-2):
    loss, grads = jax.value_and_grad(loss_fn)(params, x, labels, cfg)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def make_sharded_train_step(cfg: CnnConfig, mesh: Mesh, lr: float = 1e-2):
    """jit the full train step over the mesh; batch sharded over dp,
    parameters replicated (XLA psums the dp gradients)."""
    xsharding = NamedSharding(mesh, P("dp", None, None, None))

    @jax.jit
    def step(params, x, labels):
        return train_step(params, x, labels, cfg, lr)

    return step, xsharding
