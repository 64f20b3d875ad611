"""Pipeline parallelism (pp) over a mesh axis: GPipe-style microbatching.

The reference is a kernel library and has no pipeline runtime
(SURVEY.md §2.6 — verified absent); this is new-axis work like the BSR
ring and ring attention, built the TPU way: `shard_map` over a `pp`
mesh axis, stage weights resident per device, activations hopping
stage-to-stage on a `ppermute` ring. No sends/recvs, no host
scheduling — the whole M-microbatch fill/steady/drain schedule is ONE
`lax.fori_loop` of T = M + P - 1 ticks inside one jit, so XLA overlaps
each tick's `collective-permute` with the next tick's stage GEMM (the
spmm_dist ring discipline).

Schedule (classic GPipe, bubble fraction (P-1)/T):

    tick t: stage p computes microbatch (t - p) when 0 <= t - p < M,
            then rotates its activation to stage p + 1.

Each stage is the library's fused layer pattern — matmul + bias +
cp-unary activation, exactly what dispatch_brgemm_ext builds (reference
analogue: LIBXSMM-DNN fullyconnected, README.md:7) — so the pipeline is
"TPPs behind a pp axis", not a new compute path.

Differentiable end-to-end: the fori_loop has a static trip count (it
lowers to scan), ppermute's transpose is the reverse rotation, and the
masked writes select gradients only through live (non-bubble) paths.
The train step therefore backpropagates THROUGH the pipeline schedule —
the backward program is the mirrored drain/fill ladder XLA derives.

Comm model (per device, per call): T activation rotations of one
(mb, d) microbatch — ring rotations ONLY. Results are NOT broadcast:
the stage-local outputs are returned stacked over the pp axis and the
last stage's block is sliced outside the shard_map, so finished
microbatches stay resident on the last stage and downstream consumers
(a loss, a host fetch) pull only what they need — GSPMD inserts the
minimal reshard at the use site instead of an eager full-tensor psum.
Asserted against the lowered HLO in tests/test_pipeline_moe.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..descriptor import UnaryFlags, UnaryType
from ..ops.eltwise import apply_unary_op
from ..ops.gemm import pass_precision


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """n_stages chained (d -> d) fused layers, one per pp-mesh device."""
    dim: int = 64
    n_stages: int = 4
    n_micro: int = 8          # microbatches per global batch (>= n_stages)
    micro_batch: int = 8      # rows per microbatch
    activation: UnaryType = UnaryType.GELU
    dtype: str = "float32"


def pipeline_comm_bytes_per_device(cfg: PipelineConfig, dp: int = 1) -> int:
    """Analytic per-device comm volume of one forward: one (mb, d)
    activation rotation per tick, T = M + P - 1 ticks; under a pp x dp
    mesh each device rotates only its mb/dp row slice. This is the FULL
    collective payload of the forward — outputs are not broadcast (they
    stay resident on the last stage; see module docstring)."""
    if cfg.micro_batch % dp:
        raise ValueError(f"micro_batch={cfg.micro_batch} must divide over "
                         f"dp={dp}")
    isz = jnp.dtype(cfg.dtype).itemsize
    ticks = cfg.n_micro + cfg.n_stages - 1
    return ticks * (cfg.micro_batch // dp) * cfg.dim * isz


def init_params(cfg: PipelineConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((cfg.n_stages, cfg.dim, cfg.dim)) / np.sqrt(
        cfg.dim)
    return {"w": jnp.asarray(w, cfg.dtype),
            "b": jnp.zeros((cfg.n_stages, cfg.dim), cfg.dtype)}


def _stage_layer(w, b, x, cfg: PipelineConfig):
    """One stage = the fused brgemm_ext pattern (matmul+bias+activation)."""
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32,
                  precision=pass_precision(x.dtype))
    acc = acc + b[None, :]
    acc = apply_unary_op(cfg.activation, UnaryFlags.NONE, acc)
    return acc.astype(x.dtype)


def reference_forward(params: dict, xs, cfg: PipelineConfig):
    """Sequential (unpipelined) oracle: xs (M, mb, d) -> (M, mb, d)."""
    def one(x):
        for p in range(cfg.n_stages):
            x = _stage_layer(params["w"][p], params["b"][p], x, cfg)
        return x
    return jax.vmap(one)(xs)


def make_pipeline_forward(cfg: PipelineConfig, mesh: Mesh, axis: str = "pp",
                          dp_axis: str = None):
    """Build fn(params, xs) -> ys running the GPipe schedule over
    mesh[axis]; params sharded one stage per device, xs (M, mb, d)
    in, ys (M, mb, d) out. With dp_axis, the microbatch ROW dimension is
    additionally dp-sharded (pp x dp composition: each dp slice runs its
    own pipeline over its rows; stage weights are replicated across dp,
    so the grad psum over dp is derived by shard_map's transpose)."""
    Pn = mesh.shape[axis]
    if Pn != cfg.n_stages:
        raise ValueError(f"n_stages={cfg.n_stages} must equal the pp mesh "
                         f"extent {Pn} (one resident stage per device)")
    M, mb, d = cfg.n_micro, cfg.micro_batch, cfg.dim
    if M < Pn:
        raise ValueError(f"n_micro={M} < n_stages={Pn}: the pipeline would "
                         f"be all bubble")
    if dp_axis is not None:
        dpn = mesh.shape[dp_axis]
        if mb % dpn:
            raise ValueError(f"micro_batch={mb} must divide over "
                             f"dp={dpn}")
        mb = mb // dpn
    T = M + Pn - 1
    perm = [(i, (i + 1) % Pn) for i in range(Pn)]

    def local_fn(w, b, xs):
        # per-device: w (1, d, d), b (1, d) — this device's stage; xs full
        p = jax.lax.axis_index(axis)
        is_first = p == jnp.int32(0)
        is_last = p == jnp.int32(Pn - 1)

        def tick(t, state):
            carry, outs = state
            # stage 0 injects microbatch t (clamped in the drain phase
            # where it has nothing left to feed); others consume the
            # activation rotated in at the end of the previous tick
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, jnp.int32(M - 1)), 0, keepdims=False)
            xin = jnp.where(is_first, feed, carry)
            y = _stage_layer(w[0], b[0], xin, cfg)
            # the last stage completes microbatch t - (P-1) once t >= P-1
            oidx = jnp.clip(t - jnp.int32(Pn - 1), 0, M - 1)
            live = jnp.logical_and(is_last, t >= jnp.int32(Pn - 1))
            cur = jax.lax.dynamic_slice_in_dim(outs, oidx, 1, 0)
            outs = jax.lax.dynamic_update_slice_in_dim(
                outs, jnp.where(live, y[None], cur), oidx, 0)
            # rotate this tick's activation to the next stage; the rotate
            # has no dependency on the NEXT tick's GEMM, so XLA may
            # overlap collective-permute with compute across ticks
            carry = jax.lax.ppermute(y, axis, perm=perm)
            return carry, outs

        carry0 = jnp.zeros((mb, d), xs.dtype)
        outs0 = jnp.zeros((M, mb, d), xs.dtype)
        # static Python-int bounds: reverse-mode AD through fori_loop
        # requires a static trip count (it lowers to scan)
        _, outs = jax.lax.fori_loop(0, T, tick, (carry0, outs0))
        # only the last stage holds real outputs (other stages' blocks are
        # the zeros they were initialised with); return them stacked over
        # the pp axis instead of psum-replicating the full tensor — the
        # caller slices the last block, and any cross-device movement is
        # deferred to the actual consumer (r4 advisor: the eager psum
        # moved P x the minimal volume)
        return outs

    xspec = P(None, dp_axis, None) if dp_axis is not None else P()
    shmapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), xspec),
        out_specs=P(axis, dp_axis, None) if dp_axis is not None
        else P(axis, None, None),
        check_vma=False)

    def fn(params, xs):
        stacked = shmapped(params["w"], params["b"], xs)   # (P*M, mb, d)
        return stacked[(Pn - 1) * M:]

    return fn


def shard_params(params: dict, mesh: Mesh, axis: str = "pp") -> dict:
    return {
        "w": jax.device_put(params["w"],
                            NamedSharding(mesh, P(axis, None, None))),
        "b": jax.device_put(params["b"], NamedSharding(mesh, P(axis, None))),
    }


def make_pipeline_train_step(cfg: PipelineConfig, mesh: Mesh,
                             axis: str = "pp", dp_axis: str = None,
                             lr: float = 1e-3):
    """jit the FULL train step (fwd pipeline + backprop through the
    schedule + SGD) over mesh[axis] (optionally x dp_axis).
    Returns (step, x_sharding)."""
    fwd = make_pipeline_forward(cfg, mesh, axis, dp_axis)

    def loss_fn(params, xs, ys):
        pred = fwd(params, xs)
        return jnp.mean((pred.astype(jnp.float32)
                         - ys.astype(jnp.float32)) ** 2)

    @jax.jit
    def step(params, xs, ys):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, ys)
        new = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new, loss

    xspec = P(None, dp_axis, None) if dp_axis is not None else P()
    return step, NamedSharding(mesh, xspec)


def lowered_text(cfg: PipelineConfig, mesh: Mesh, axis: str = "pp") -> str:
    """StableHLO of the pipelined forward (tests assert collective-permute
    presence — the backend-independent comm evidence)."""
    fn = jax.jit(make_pipeline_forward(cfg, mesh, axis))
    params = shard_params(init_params(cfg), mesh, axis)
    xs = jnp.zeros((cfg.n_micro, cfg.micro_batch, cfg.dim), cfg.dtype)
    return fn.lower(params, xs).as_text()
