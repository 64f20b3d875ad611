"""TPP-GCN: graph convolutional network over a fixed sparse operator.

Second model family (after tpp_mlp): where the MLP exercises the dense
BRGEMM+epilogue stack, the GCN exercises the library's *sparse* story in a
real train step — the propagate step H' = act(Â·H·W + b) is a
fixed-sparsity SpMM (the fsspmdm workload shape: a sparse operator applied
to a streaming dense right-hand side, the PyFR/EDGE pattern at
/root/reference/samples/xgemm_sparse_Ainregs) fused with a dense MXU
matmul. Â = D^-1/2 (A+I) D^-1/2 is fixed at model build, exactly like the
reference bakes the operator pattern at kernel-create time.

Two propagate paths share the BSR block plan:
  * training: a differentiable jnp BSR SpMM (gather blocks -> batched
    block matmul -> segment-sum), jit/grad/shard-able; under a node-sharded
    mesh XLA inserts the halo gathers from the shardings.
  * serving at scale: `parallel.spmm_dist.DistributedBsrSpmm` (ppermute
    halo ring over ICI) on the same BsrMatrix.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..descriptor import UnaryFlags, UnaryType
from ..ops.eltwise import apply_unary_op
from ..ops.sparse import BsrMatrix


@dataclasses.dataclass(frozen=True)
class GcnConfig:
    in_dim: int = 64
    hidden: Tuple[int, ...] = (128,)
    out_dim: int = 16
    activation: UnaryType = UnaryType.RELU
    dtype: str = "float32"


def normalize_adjacency(adj: np.ndarray, block: int = 8) -> BsrMatrix:
    """Â = D^-1/2 (A + I) D^-1/2 (Kipf-Welling propagation operator),
    stored BSR with the given block size (pattern fixed at build time)."""
    a = np.asarray(adj, np.float64)
    if a.shape[0] != a.shape[1]:
        raise ValueError("adjacency must be square")
    n = a.shape[0]
    if n % block:
        raise ValueError(f"nodes ({n}) must be divisible by block ({block})")
    a = a + np.eye(n)
    d = a.sum(axis=1)
    dm = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    ahat = (a * dm[:, None]) * dm[None, :]
    return BsrMatrix.from_dense(ahat.astype(np.float32), block, block)


def _bsr_plan(bsr: BsrMatrix):
    """(rows, cols, blocks) COO-of-blocks arrays for the jnp propagate."""
    rows = np.repeat(np.arange(len(bsr.indptr) - 1, dtype=np.int32),
                     np.diff(bsr.indptr))
    return (jnp.asarray(rows), jnp.asarray(bsr.indices),
            jnp.asarray(bsr.data))


def bsr_spmm(plan, h, num_block_rows: int):
    """Differentiable BSR SpMM: out = Â @ h.

    Gather the h block-rows per nonzero block, one batched block matmul
    (MXU), segment-sum into output block-rows — the single-device form of
    the distributed ring's local step (parallel/spmm_dist.py local_fn);
    JAX AD provides the transpose SpMM for the backward pass."""
    rows, cols, blocks = plan
    br = blocks.shape[1]
    n = h.shape[1]
    hb = h.reshape(-1, br, n)
    gathered = jnp.take(hb, cols, axis=0)               # (E, br, n)
    contrib = jnp.einsum("eij,ejn->ein", blocks.astype(h.dtype), gathered,
                         preferred_element_type=jnp.float32,
                         precision=_pass_precision(h.dtype))
    acc = jax.ops.segment_sum(contrib, rows, num_segments=num_block_rows)
    return acc.reshape(num_block_rows * br, n).astype(h.dtype)


def _pass_precision(dtype) -> jax.lax.Precision:
    """MXU pass precision per the library policy — the shared
    ops/gemm.pass_precision (kept as a local name for existing callers)."""
    from ..ops.gemm import pass_precision
    return pass_precision(dtype)


def init_params(cfg: GcnConfig, seed: int = 0) -> List[dict]:
    rng = np.random.default_rng(seed)
    dims = (cfg.in_dim, *cfg.hidden, cfg.out_dim)
    return [{"w": jnp.asarray(
                rng.standard_normal((dims[i], dims[i + 1]))
                / np.sqrt(dims[i]), cfg.dtype),
             "b": jnp.zeros((dims[i + 1],), cfg.dtype)}
            for i in range(len(dims) - 1)]


def forward(params: List[dict], plan, num_block_rows: int, h, cfg: GcnConfig):
    for i, layer in enumerate(params):
        hw = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32,
                     precision=_pass_precision(h.dtype))
        hw = bsr_spmm(plan, hw.astype(h.dtype), num_block_rows)
        acc = hw.astype(jnp.float32) + layer["b"][None, :]
        if i < len(params) - 1:
            acc = apply_unary_op(cfg.activation, UnaryFlags.NONE, acc)
        h = acc.astype(h.dtype)
    return h


def loss_fn(params, plan, num_block_rows, h, labels, cfg: GcnConfig):
    """Mean softmax cross-entropy over all nodes (labels: int (n,))."""
    logits = forward(params, plan, num_block_rows, h, cfg)
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return jnp.mean(logz - picked)


def train_step(params, plan, num_block_rows, h, labels, cfg: GcnConfig,
               lr: float = 1e-2):
    loss, grads = jax.value_and_grad(loss_fn)(params, plan, num_block_rows,
                                              h, labels, cfg)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


def make_sharded_train_step(cfg: GcnConfig, mesh: Mesh, plan,
                            num_block_rows: int, lr: float = 1e-2):
    """jit the train step over a 1-D node mesh: features H and labels are
    node-sharded over 'sp' (the library's sparse scaling axis, SURVEY.md
    §5.7), weights replicated — XLA inserts the halo gathers the propagate
    needs from the shardings (the explicit ppermute ring is the serving
    path, DistributedBsrSpmm)."""
    hsharding = NamedSharding(mesh, P("sp", None))
    lsharding = NamedSharding(mesh, P("sp"))

    # the BSR plan arrays are jit ARGUMENTS, not closure constants:
    # closure constants are re-uploaded every call (~430us/launch on the
    # tunneled backend, CLAUDE.md) and the plan grows with the graph.
    # Bind them device-resident once here; `step` stays a 3-arg callable.
    plan_dev = jax.tree.map(
        lambda a: jax.device_put(a) if hasattr(a, "shape") else a, plan)

    @jax.jit
    def _step(params, plan_args, h, labels):
        return train_step(params, plan_args, num_block_rows, h, labels,
                          cfg, lr)

    def step(params, h, labels):
        return _step(params, plan_dev, h, labels)

    return step, hsharding, lsharding
